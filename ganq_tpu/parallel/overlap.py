"""Manual collective-overlap tensor-parallel matmuls (shard_map + ppermute).

The BASELINE north star asks for "all-gather of activations overlapped with
LUT-matmul compute". GSPMD places a *blocking* all-gather in front of a
column-parallel matmul whose activations are sharded (sequence-sharded
prefill -> TP projection), and a blocking reduce-scatter/all-reduce after a
row-parallel one. On a real slice both hops can hide behind the MXU when the
collective is decomposed into a ring of ``ppermute`` hops, each overlapped
with the matmul of the chunk already on-device (the classic "collective
matmul"; cf. the overlap discussion in the public scaling-book material).

Two primitives, both usable with EVERY QLinear kind (per-chunk compute goes
through :func:`ganq_tpu.ops.qlinear.apply`, so dense/lut/uniform/w8 all
ride, and the quantized kinds keep their fused Pallas kernels per chunk):

- :func:`allgather_matmul` — column-parallel ``y = x_full @ W_localᵀ`` with
  activation rows sharded over the axis: rows circulate the ring; each hop
  overlaps with the local matmul of the rows that already arrived.
- :func:`matmul_reducescatter` — row-parallel ``y_c = Σ_d x_d @ W_d[c]ᵀ``:
  per-destination partial accumulators circulate the ring; each hop overlaps
  with the matmul producing the NEXT chunk's local partial. Ends with output
  chunk ``d`` fully reduced on device ``d`` (reduce-scatter semantics).

On the virtual CPU mesh these schedules execute serially — correctness is
what the tests check there; the overlap itself only pays on real hardware.

Reference context: the reference framework is single-accelerator
(SURVEY.md §2.4) — this module is net-new TPU design surface.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import qlinear
from ..ops.qlinear import QLinear


def _row_chunk(p: QLinear, c, mc: int, k_local: int) -> QLinear:
    """Output-row chunk ``[c*mc, (c+1)*mc)`` of a (possibly packed) linear.

    Every QLinear kind stores its arrays row-wise in dim 0 (planar packing
    keeps codes per output row), so a dynamic row slice is legal for all of
    them. ``c`` may be traced (ring schedules index chunks dynamically).
    ``bias`` is intentionally dropped: row-parallel partials must add the
    bias once, after the reduction — callers re-add it.
    """
    arrays = {}
    for key, v in p.arrays.items():
        if key == "bias":
            continue
        start = (c * mc,) + (0,) * (v.ndim - 1)
        sizes = (mc,) + v.shape[1:]
        arrays[key] = jax.lax.dynamic_slice(v, start, sizes)
    return QLinear(p.kind, arrays, p.bits, k_local)


def repack_for_row_sharding(p: QLinear, n: int) -> QLinear:
    """Repack a planar-packed linear for MANUAL row-parallel sharding.

    Planar packing (ops/packing.py) stores bit-plane ``b`` of each word as a
    contiguous span of the FULL row — so slicing the packed minor dim (what
    ``shard_map`` does to distribute input columns) selects an interleaved
    set of original columns, not contiguous shard ``d``. This load-time
    transform unpacks and repacks each ``K/n`` column shard independently and
    concatenates them: a packed-minor slice then IS original-column shard
    ``d``, planar within the shard. No-op for kinds whose arrays slice
    directly (dense/w8). The GSPMD TP path (parallel/sharding.py) keeps
    global-array semantics and needs none of this.
    """
    if p.kind not in ("lut", "uniform"):
        return p
    from ..ops.packing import pack_int_rows, unpack_int_rows
    K = p.in_features
    if K % n:
        raise ValueError(f"in_features {K} not divisible by {n} shards")
    kl = K // n
    key = "idx_packed" if p.kind == "lut" else "qweight"
    idx = unpack_int_rows(p[key], p.bits, K)
    pieces = [pack_int_rows(idx[:, d * kl:(d + 1) * kl], p.bits)
              for d in range(n)]
    arrays = dict(p.arrays)
    arrays[key] = jnp.concatenate(pieces, axis=1)
    return QLinear(p.kind, arrays, p.bits, K)


def allgather_matmul(p_local: QLinear, x_local: jax.Array,
                     axis_name: str = "model",
                     backend: str = "reference") -> jax.Array:
    """Column-parallel matmul with ring-overlapped activation all-gather.

    Call inside ``shard_map``. ``x_local`` [rows_shard, K] holds this
    device's slice of the activation rows (sequence- or batch-sharded);
    ``p_local`` holds the local output-feature slice (full K). Returns
    ``y`` [rows_total, M_local] — the product of ALL rows against the local
    features, rows in global order.

    Schedule: N-1 ``ppermute`` hops; hop ``s`` travels while the matmul of
    the chunk received at hop ``s-1`` runs.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    chunk = x_local
    outs = []
    for s in range(n):
        if s < n - 1:
            nxt = jax.lax.ppermute(chunk, axis_name, perm)
        outs.append(qlinear.apply(p_local, chunk, backend=backend))
        if s < n - 1:
            chunk = nxt
    stacked = jnp.stack(outs)          # [n, rows_shard, M_local]
    # outs[s] came from source device (idx - s) mod n; reorder to source
    # order 0..n-1 (ordered[i] = stacked[(idx - i) mod n])
    order = jnp.mod(idx - jnp.arange(n), n)
    ordered = jnp.take(stacked, order, axis=0)
    return ordered.reshape(n * x_local.shape[0], -1)


def matmul_reducescatter(p_local: QLinear, x_local: jax.Array,
                         axis_name: str = "model",
                         bias: Optional[jax.Array] = None,
                         backend: str = "reference") -> jax.Array:
    """Row-parallel matmul with ring-overlapped reduce-scatter.

    Call inside ``shard_map``. ``x_local`` [..., K_local] is the local slice
    of the contraction dim; ``p_local`` the matching input-column slice of
    the weight (all M output features). Returns output chunk ``d`` of size
    ``M/N`` fully reduced on device ``d`` — follow with an all-gather (or
    keep the sharded layout) as the consumer requires.

    Schedule: device ``d`` seeds the accumulator destined for chunk
    ``(d-1) mod n``, then N-1 hops; at hop ``k`` it adds its partial for
    chunk ``(d-1-k) mod n`` — that matmul overlaps the hop in flight.
    ``lora_a/lora_b`` adapters are not supported here (their contraction
    spans the full K); apply them outside.
    """
    if "lora_a" in p_local.arrays:
        raise NotImplementedError("EoRA adapters: apply outside the "
                                  "reduce-scatter ring")
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    m = p_local.out_features
    if m % n:
        raise ValueError(f"out_features {m} not divisible by ring size {n}")
    mc = m // n
    k_local = x_local.shape[-1]

    def partial(c):
        return qlinear.apply(_row_chunk(p_local, c, mc, k_local), x_local,
                             backend=backend)

    acc = partial(jnp.mod(idx - 1, n))
    for k in range(1, n):
        acc = jax.lax.ppermute(acc, axis_name, perm) + partial(
            jnp.mod(idx - 1 - k, n))
    if bias is not None:
        b = jax.lax.dynamic_slice(bias, (idx * mc,), (mc,))
        acc = acc + b.astype(acc.dtype)
    return acc


__all__ = ["allgather_matmul", "matmul_reducescatter",
           "repack_for_row_sharding"]
