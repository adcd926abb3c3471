"""Static lane permutations as a Beneš butterfly network — the TPU-native
analog of exllama's act-order activation remap (reference
``gptqmodel_ext/exllama/cuda_func/column_remap.cu``: the CUDA kernels gather
``x[x_map]`` per GEMV; Mosaic has no lane gather, and a permutation MATRIX
on the MXU would stream H*H extra bytes per layer — fatal in a DMA-bound
decode).

A Beneš network realizes ANY permutation of n = 2^k lanes in 2k-1 butterfly
stages. A stage at stride ``s`` conditionally exchanges lane pairs
``(i, i ^ s)``; on TPU that is two static :func:`pltpu.roll` ops plus two
lane-masked selects — pure VPU work, no HBM traffic beyond the per-stage
0/1 routing masks ((2k-1) * n floats per permutation, ~170 KB at n = 2048
vs the 4 MB permutation matrix). Routing masks are computed once at pack
time by the classic looping (cycle 2-coloring) algorithm.

Used by the megastep kernels to serve desc_act / act-order artifacts: at
megapack time the packed weight columns are sorted group-contiguous
(``argsort(g_idx)``), and the matching activation permutation is applied
in-kernel to the f32 activations just before their int8 quantization.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def benes_strides(n: int) -> list[int]:
    """Stage strides [n/2, n/4, ..., 1, ..., n/4, n/2] (2*log2(n)-1)."""
    assert n >= 2 and (n & (n - 1)) == 0, "Benes needs a power-of-two size"
    down = [n >> k for k in range(1, n.bit_length())]
    return down + down[-2::-1]


def _route(perm: np.ndarray):
    """One Beneš level for ``y[i] = x[perm[i]]`` on n = len(perm) lanes.

    Returns (in_swap[n/2], out_swap[n/2], perm_top[n/2], perm_bot[n/2]):
    the entry/exit butterfly settings and the two half-size sub-problems.
    2-colors the constraint graph whose edges pair values sharing an input
    switch (v <-> v^h) and values sharing an output switch
    (perm[i] <-> perm[i^h]) — every vertex has degree 2, cycles alternate
    edge types and are even, so the greedy walk always closes.
    """
    n = len(perm)
    h = n // 2
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    side = np.full(n, -1, np.int64)        # 0 = top subnet, 1 = bottom
    for v0 in range(n):
        if side[v0] != -1:
            continue
        v, s = v0, 0
        while side[v] == -1:
            side[v] = s
            u = v ^ h                      # input-switch partner
            side[u] = 1 - s
            v = perm[inv[u] ^ h]           # output-switch partner of u
            s = 1 - side[u]                # opposite side to u
    j = np.arange(h)
    in_swap = side[j] == 1
    out_swap = side[perm[j]] == 1
    val_top = np.where(out_swap, perm[j + h], perm[j])
    val_bot = np.where(out_swap, perm[j], perm[j + h])
    return in_swap, out_swap, val_top & (h - 1), val_bot & (h - 1)


def benes_masks(perm) -> np.ndarray:
    """Routing masks [S, n] float32 (S = 2*log2(n)-1) such that applying
    the butterfly stages of :func:`benes_strides` with these masks maps
    ``x -> x[..., perm]``. Identity perm yields all-zero masks."""
    perm = np.asarray(perm, np.int64)
    n = len(perm)
    assert sorted(perm.tolist()) == list(range(n)), "not a permutation"
    strides = benes_strides(n)
    S = len(strides)
    masks = np.zeros((S, n), np.float32)

    def fill(perm, lane0, lo, hi):
        nn = len(perm)
        if nn == 1:
            return
        if nn == 2:
            masks[lo, lane0:lane0 + 2] = float(perm[0] == 1)
            return
        in_sw, out_sw, pt, pb = _route(perm)
        hh = nn // 2
        masks[lo, lane0:lane0 + hh] = in_sw
        masks[lo, lane0 + hh:lane0 + nn] = in_sw
        masks[hi, lane0:lane0 + hh] = out_sw
        masks[hi, lane0 + hh:lane0 + nn] = out_sw
        fill(pt, lane0, lo + 1, hi - 1)
        fill(pb, lane0 + hh, lo + 1, hi - 1)

    fill(perm, 0, 0, S - 1)
    return masks


def apply_benes_np(x: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """Numpy reference: butterfly stages over the last axis."""
    n = x.shape[-1]
    idx = np.arange(n)
    for s, m in zip(benes_strides(n), masks):
        sw = x[..., idx ^ s]
        x = np.where(m != 0, sw, x)
    return x


def lane_permute(x: jax.Array, masks: jax.Array,
                 chunk_rows: int = 8) -> jax.Array:
    """In-kernel (or plain-jnp) application of a pre-routed Beneš network
    to the LANE axis of ``x [rows, n]``. ``masks [S, n]`` from
    :func:`benes_masks` (pass as a kernel operand — Pallas rejects large
    captured constants). f32/i32 lanes only (pltpu.roll constraint).

    Rows are processed in ``chunk_rows`` slices so the live value through
    the 2*log2(n)-1 stages stays a few vregs (a whole [32, 4096] f32 value
    would spill the vector register file — the round-3 solver lesson)."""
    if x.shape[0] > chunk_rows:
        return jnp.concatenate(
            [lane_permute(x[i:i + chunk_rows], masks, chunk_rows)
             for i in range(0, x.shape[0], chunk_rows)], axis=0)
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for k, s in enumerate(benes_strides(n)):
        up = pltpu.roll(x, n - s, axis=x.ndim - 1)  # x[i + s] (cyclic)
        dn = pltpu.roll(x, s, axis=x.ndim - 1)      # x[i - s]
        swapped = jnp.where((iota & s) == 0, up, dn)
        # rank-2 [1, n] slice: Mosaic's layout inference rejects a rank-1
        # sub-32-bit value as a broadcast operand (layout_rank check)
        m = masks[k:k + 1] if masks.ndim == 2 else masks[k]
        x = jnp.where(m != 0, swapped, x)
    return x
