"""Collective-overlap TP matmuls (parallel/overlap.py) vs the unsharded
oracle on the virtual 8-device CPU mesh — every QLinear kind, both ring
schedules, and their composition (column-parallel up -> row-parallel down)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.6 public export
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ganq_tpu.ops import qlinear
from ganq_tpu.ops.qlinear import QLinear
from ganq_tpu.parallel import sharding
from ganq_tpu.parallel.overlap import (allgather_matmul,
                                       matmul_reducescatter,
                                       repack_for_row_sharding)


def _mk_linear(rng, kind, M, K, bias=False):
    b = jnp.asarray(rng.normal(size=(M,)).astype(np.float32) * 0.1) if bias else None
    if kind == "dense":
        w = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32) * 0.1)
        return qlinear.dense_linear(w, b)
    if kind == "lut":
        lut = jnp.asarray(np.sort(rng.normal(size=(M, 16)).astype(np.float32), axis=1))
        idx = jnp.asarray(rng.integers(0, 16, size=(M, K)), jnp.int32)
        return qlinear.lut_linear(lut, idx, 4, b)
    if kind == "uniform":
        gs = 32
        qidx = jnp.asarray(rng.integers(0, 16, size=(M, K)), jnp.int32)
        scale = jnp.asarray(rng.uniform(0.01, 0.1, size=(M, K // gs)).astype(np.float32))
        zero = jnp.asarray(rng.integers(0, 16, size=(M, K // gs)).astype(np.float32))
        g_idx = jnp.arange(K, dtype=jnp.int32) // gs
        return qlinear.uniform_linear(qidx, scale, zero, g_idx, 4, b)
    if kind == "w8":
        w8 = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
        scale = jnp.asarray(rng.uniform(1e-3, 5e-3, size=(M, 1)).astype(np.float32))
        arrays = {"w8": w8, "scale": scale}
        if b is not None:
            arrays["bias"] = b
        return QLinear("w8", arrays, bits=8, in_features=K)
    raise ValueError(kind)


def _col_specs(p):
    """shard_map in_spec: output rows sharded over "model" (column TP)."""
    return QLinear(p.kind, {k: P("model", None) if p.arrays[k].ndim == 2
                            else P("model") for k in p.arrays},
                   p.bits, p.in_features)


def _row_specs(p):
    """shard_map in_spec: input columns sharded (row TP); per-row arrays
    (lut rows span all K codes? no — lut is per OUTPUT row) replicated."""
    spec = {}
    for k, v in p.arrays.items():
        if k in ("weight", "idx_packed", "qweight"):
            spec[k] = P(None, "model")
        elif k in ("scales", "zeros"):     # groups follow input columns
            spec[k] = P(None, "model")
        elif k == "w8":
            spec[k] = P(None, "model")
        else:                              # lut, per-row scale, bias
            spec[k] = P(None, None) if v.ndim == 2 else P(None)
    return QLinear(p.kind, spec, p.bits, p.in_features)


@pytest.mark.parametrize("kind", ["dense", "lut", "uniform", "w8"])
def test_allgather_matmul_matches_oracle(rng, kind):
    M, K, B = 64, 256, 16
    p = _mk_linear(rng, kind, M, K, bias=True)
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    ref = np.asarray(qlinear.apply(p, x))

    mesh = sharding.make_mesh(data=1, model=8)
    fn = shard_map(allgather_matmul, mesh=mesh,
                   in_specs=(_col_specs(p), P("model", None)),
                   out_specs=P(None, "model"))
    out = np.asarray(jax.jit(fn)(p, x))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind", ["dense", "lut", "uniform", "w8"])
def test_matmul_reducescatter_matches_oracle(rng, kind):
    M, K, B = 64, 256, 4
    p = _mk_linear(rng, kind, M, K, bias=True)
    x = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32))
    ref = np.asarray(qlinear.apply(p, x))

    bias = p.arrays.get("bias")
    p = repack_for_row_sharding(p, 8)   # planar codes -> per-shard planar
    mesh = sharding.make_mesh(data=1, model=8)

    def rs(pl, xl, b):
        return matmul_reducescatter(pl, xl, bias=b)

    fn = shard_map(rs, mesh=mesh,
                   in_specs=(_row_specs(p), P(None, "model"), P(None)),
                   out_specs=P(None, "model"))
    out = np.asarray(jax.jit(fn)(p, x, bias))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_overlap_mlp_composition(rng):
    """Sequence-sharded activations -> column-parallel up (ring all-gather
    overlap) -> row-parallel down (ring reduce-scatter overlap) == the
    unsharded two-matmul oracle, with activations ending sequence-sharded
    again (the TP-block dataflow the north star describes)."""
    H, I, S = 64, 256, 16
    up = _mk_linear(rng, "w8", I, H)
    down = _mk_linear(rng, "lut", H, I)
    x = jnp.asarray(rng.normal(size=(S, H)).astype(np.float32))
    ref = np.asarray(qlinear.apply(down, jax.nn.silu(qlinear.apply(up, x))))
    down = repack_for_row_sharding(down, 8)

    mesh = sharding.make_mesh(data=1, model=8)

    def block(upl, downl, xl):
        h = allgather_matmul(upl, xl)          # [S_total, I/8] local features
        h = jax.nn.silu(h)
        # row-parallel down over I; ends with output-feature chunk d of H
        # reduced on device d (reduce-scatter layout)
        return matmul_reducescatter(downl, h)  # [S_total, H/8]

    fn = shard_map(block, mesh=mesh,
                   in_specs=(_col_specs(up), _row_specs(down),
                             P("model", None)),
                   out_specs=P(None, "model"))
    out = np.asarray(jax.jit(fn)(up, down, x))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
