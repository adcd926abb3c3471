"""Fused uniform (scale/zero) dequant matmul Pallas kernel.

The TPU counterpart of the reference's uniform GPTQ kernels
(Marlin/Exllama/Triton ``quant_matmul_248`` family,
``gptqmodel/nn_modules/triton_utils/kernels.py:103-259``): packed codes are
streamed from HBM (planar layout, ops/packing.py), dequantized on the VPU
with 2 FMAs/element (``(q - zero) * scale``) per group *segment* — every
MXU contraction stays inside one quantization group, so scale/zero are
rank-1 broadcasts and no interleave reshape is needed.

Pallas-path capability (mirroring the reference's per-kernel ``SUPPORTS_*``
validation, ``qlinear/__init__.py:33-372``): bits 2/3/4/8 (the reference's
exllama/triton kernel bit range), sequential group boundaries
(``g_idx[k] == k // group_size``), and group size either -1 or aligned to
the planar plane width. 8-bit codes feed the int8 MXU centered by 128 with
the offset folded into the zero-point side (exact). desc_act checkpoints (permuted g_idx)
fall back to the XLA reference path — the same trade the exllama kernel makes
with its column remap (``gptqmodel_ext/exllama/cuda_func/column_remap.cu``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import unpack_int_rows, unpack_plane


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _pick_b_tile(B: int, block_b: int) -> int:
    """Batch tile: Mosaic needs sublane dims divisible by 8 or spanning the
    full array — pick an 8-multiple divisor, else take all of B."""
    for c in (block_b, 256, 128, 64, 32, 16, 8):
        if B % c == 0:
            return c
    return B


def _uniform_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, *, width: int, gs: int,
                    bits: int, pf: int):
    """Full-K step for one (B tile, M tile). Group scale/zero expand to
    per-column via segment concat (group-aligned, so each segment's params
    are a rank-1 [TM, 1] broadcast); one MXU dot per plane."""
    packed = qw_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    segs_per_plane = max(width // gs, 1)
    seg = min(gs, width)
    for p in range(pf):
        codes = unpack_plane(packed, bits, p).astype(jnp.float32)  # [TM, width]
        ws = []
        for si in range(segs_per_plane):
            g = (p * width + si * seg) // gs
            s_col = s_ref[:, g][:, None]
            z_col = z_ref[:, g][:, None]
            c = codes[:, si * seg:(si + 1) * seg]
            ws.append(((c - z_col) * s_col).astype(x_ref.dtype))
        w = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=1)  # [TM, width]
        xs = x_ref[:, p * width:(p + 1) * width]
        prec = (jax.lax.Precision.HIGHEST if xs.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        acc += jax.lax.dot_general(
            xs, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
    o_ref[:] = acc.astype(o_ref.dtype)


def _sequential_groups(g_idx, gs: int, K: int) -> bool:
    """None = sequential by construction (qlinear.uniform_linear omits the
    trivial map so this stays decidable under jit). A traced g_idx cannot be
    inspected at trace time — treat as permuted (reference fallback)."""
    if g_idx is None:
        return True
    if isinstance(g_idx, jax.core.Tracer):
        return False
    expect = np.arange(K) // gs
    return bool(np.array_equal(np.asarray(g_idx), expect))


@functools.partial(jax.jit, static_argnames=("bits", "tb", "tm"))
def _uniform_matmul_pallas(x2, qweight, scales, zeros, bits, tb, tm):
    from .packing import pack_factor
    K = x2.shape[-1]
    M = qweight.shape[0]
    B = x2.shape[0]
    n_groups = scales.shape[1]
    gs = K // n_groups
    pf = pack_factor(bits)
    width = K // pf
    return pl.pallas_call(
        functools.partial(_uniform_kernel, width=width, gs=min(gs, K),
                          bits=bits, pf=pf),
        grid=(B // tb, M // tm),
        in_specs=[
            pl.BlockSpec((tb, K), lambda b, m: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, width), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n_groups), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n_groups), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tm), lambda b, m: (b, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * K,
            bytes_accessed=B * K * x2.dtype.itemsize + M * width * 4,
            transcendentals=0,
        ),
    )(x2, qweight, scales, zeros)


def uniform_matmul(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                   zeros: jax.Array, g_idx: jax.Array, bits: int = 4,
                   block_b: int = 256, block_m: int = 512) -> jax.Array:
    """x [..., K] @ dequant(W)[M, K]^T for the uniform format (planar packing)."""
    from .packing import pack_factor
    K = x.shape[-1]
    n_groups = scales.shape[1]
    gs = K // n_groups if n_groups else K
    M = qweight.shape[0]
    pf = pack_factor(bits)
    width = K // pf
    if K >= 8192:
        block_m = min(block_m, 256)   # bound the codes scratch [tm, K]
    tm = _pick_tile(M, (block_m, 512, 256, 128, 64, 32, 16, 8))
    seg = min(gs, width)
    ok = (bits in (2, 3, 4, 8) and K % pf == 0 and K % max(n_groups, 1) == 0
          and _sequential_groups(g_idx, gs, K)
          and M % tm == 0
          and (width % 128 == 0 or M <= 8)
          and (width % gs == 0 or gs % width == 0)
          and (seg % 128 == 0 or seg == width))
    if not ok:
        return uniform_matmul_reference(x, qweight, scales, zeros, g_idx, bits)
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    tb = _pick_b_tile(B, block_b)
    out = _uniform_matmul_pallas(x2, qweight, scales, zeros, bits, tb, tm)
    return out.reshape(*x.shape[:-1], M)


# ------------------------------------------------------------------- W4A8
def _uniform_a8_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, codes_s, x8_s,
                       *, width: int, gs: int, bits: int, pf: int):
    """True W4A8 GEMM (the QQQ-kernel equivalent, ``gptqmodel_ext/qqq/``):
    int4 codes stream PACKED from HBM (half the bytes of the w8 path),
    unpack to int8 with one shift+mask, and feed the int8xint8 MXU per
    group segment; the affine correction moves to the output side exactly:

        y = sx * Σ_g s_g * ( x8 · q_g  -  z_g * Σ(x8)_g )

    so the only approximation is the per-token activation quantization
    (same as w8a8). Segments are group-aligned (the uniform_matmul planar
    segment logic), so s_g/z_g are rank-1 [TM] broadcasts."""
    x = x_ref[:].astype(jnp.float32)                        # [TB, K]
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0,
                     1e-12)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    packed = qw_ref[:]
    tb = x.shape[0]
    tm = packed.shape[0]
    K = pf * width
    # one shift+mask per plane; planar planes are contiguous column spans,
    # so writing them side by side rebuilds original column order. The
    # unpacked codes and quantized activations land in VMEM SCRATCH so the
    # group loop can slice them dynamically (Mosaic supports pl.ds on refs,
    # not lax.dynamic_slice on values).
    # 8-bit codes (0..255) are centered by 128 so they fit the int8 MXU;
    # the wrapper folds the 128 offset into the zero-point side exactly
    center = 128 if bits == 8 else 0
    for p in range(pf):
        codes_s[:, p * width:(p + 1) * width] = (
            unpack_plane(packed, bits, p) - center).astype(jnp.int8)
    x8_s[:] = x8
    G = max(K // gs, 1)

    # Per-group int8 MXU dots via fori_loop: a statically-unrolled segment
    # loop kept G live [TB, TM] f32 intermediates (~50 MB at 3B shapes —
    # over Mosaic's 16 MB scoped-vmem stack), and Mosaic rejects batched
    # (3-D) int8 matmuls outright; the loop carries ONE accumulator and
    # reuses buffers. gs is a 128-multiple (capability gate), so the
    # minor-dim slices stay lane-aligned. Scale and scale*zero arrive
    # pre-transposed [G, TM] so group rows slice without a transpose.
    # The zero-point correction Σ_g sz_g * sumx_g is hoisted out of the
    # loop into two small MXU dots — the in-loop epilogue was the VPU
    # bottleneck (it ran O(TB*TM) work per group against the dot's
    # O(TB*TM*gs) MXU MACs). Group sums come from one masked dot
    # ([TB,K] x block-diagonal [K,G] of ones); Mosaic has no lane-unaligned
    # dynamic vector store, so a per-group scratch-column write is out.
    x8f = x8.astype(jnp.float32)
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, G), 0)
    gg = jax.lax.broadcasted_iota(jnp.int32, (K, G), 1)
    seg_mask = (kk // gs == gg).astype(jnp.float32)
    sumx = jax.lax.dot_general(
        x8f, seg_mask, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [TB, G]
    zcorr = jax.lax.dot_general(
        sumx, z_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [TB, TM]

    def body(g, acc):
        qg = codes_s[:, pl.ds(g * gs, gs)]
        xs = x8_s[:, pl.ds(g * gs, gs)]
        d = jax.lax.dot_general(
            xs, qg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)            # [TB, TM]
        s_g = s_ref[pl.ds(g, 1), :]
        return acc + s_g * d.astype(jnp.float32)

    acc = jax.lax.fori_loop(0, G, body, -zcorr)
    o_ref[:] = (acc * sx).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "tb", "tm"))
def _uniform_a8_pallas(x2, qweight, scales, zeros, bits, tb, tm):
    from .packing import pack_factor
    K = x2.shape[-1]
    M = qweight.shape[0]
    B = x2.shape[0]
    n_groups = scales.shape[1]
    gs = K // n_groups
    pf = pack_factor(bits)
    width = K // pf
    # kernel expects scale and scale*zero pre-transposed [G, M] (no Mosaic
    # in-kernel transpose); XLA does this once per call — negligible.
    # For 8-bit the in-kernel codes are centered (q-128): fold the offset
    # into the zero side, z' = z - 128, keeping the affine math exact.
    zoff = 128.0 if bits == 8 else 0.0
    s_t = scales.T.astype(jnp.float32)
    sz_t = (scales * (zeros - zoff)).T.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_uniform_a8_kernel, width=width, gs=min(gs, K),
                          bits=bits, pf=pf),
        grid=(B // tb, M // tm),
        in_specs=[
            pl.BlockSpec((tb, K), lambda b, m: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, width), lambda b, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, tm), lambda b, m: (0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, tm), lambda b, m: (0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tm), lambda b, m: (b, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, K), jnp.int8),   # unpacked codes
            pltpu.VMEM((tb, K), jnp.int8),   # quantized activations
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the unpacked-codes scratch + live tiles exceed the default
            # 16M scoped-vmem stack at K >= 14336 (8B-shape down proj)
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * K,
            bytes_accessed=B * K * x2.dtype.itemsize + M * width * 4,
            transcendentals=0,
        ),
    )(x2, qweight, s_t, sz_t)


def uniform_a8_matmul(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                      zeros: jax.Array, g_idx, bits: int = 4,
                      block_b: int = 256, block_m: int = 512) -> jax.Array:
    """W{2,3,4,8}A8-dynamic matmul for the uniform format. Falls back to
    the full-precision XLA reference at unsupported configs (permuted
    g_idx, misaligned groups) — same capability gate as uniform_matmul."""
    from .packing import pack_factor
    K = x.shape[-1]
    n_groups = scales.shape[1]
    gs = K // n_groups if n_groups else K
    M = qweight.shape[0]
    pf = pack_factor(bits)
    width = K // pf
    if K >= 8192:
        block_m = min(block_m, 256)   # bound the codes scratch [tm, K]
    tm = _pick_tile(M, (block_m, 512, 256, 128, 64, 32, 16, 8))
    # the batched-dot kernel splits the minor dim [K] -> [G, gs]: gs must be
    # a 128-lane multiple (or one group spanning all of K)
    ok = (bits in (2, 3, 4, 8) and K % pf == 0 and K % max(n_groups, 1) == 0
          and _sequential_groups(g_idx, gs, K)
          and M % tm == 0
          and (width % 128 == 0 or M <= 8)
          and (gs % 128 == 0 or n_groups <= 1)
          and (width % gs == 0 or gs % width == 0))
    if not ok:
        return uniform_matmul_reference(x, qweight, scales, zeros, g_idx, bits)
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    tb = _pick_b_tile(B, block_b)
    out = _uniform_a8_pallas(x2, qweight, scales, zeros, bits, tb, tm)
    return out.reshape(*x.shape[:-1], M)


def uniform_a8_reference(x, qweight, scales, zeros, g_idx, bits):
    """Pure-jnp oracle of the W4A8 math (incl. activation quantization)."""
    K = x.shape[-1]
    if g_idx is None:
        gs = -(-K // max(scales.shape[1], 1))
        g_idx = jnp.arange(K, dtype=jnp.int32) // gs
    xf = x.reshape(-1, K).astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0,
                     1e-12)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127)
    qidx = unpack_int_rows(qweight, bits, K).astype(jnp.float32)
    w = scales[:, g_idx] * (qidx - zeros[:, g_idx])
    y = (x8 @ w.T) * sx
    return y.reshape(*x.shape[:-1], -1).astype(x.dtype)


def uniform_matmul_reference(x, qweight, scales, zeros, g_idx, bits):
    K = x.shape[-1]
    if g_idx is None:
        gs = -(-K // max(scales.shape[1], 1))
        g_idx = jnp.arange(K, dtype=jnp.int32) // gs
    qidx = unpack_int_rows(qweight, bits, K)
    w = scales[:, g_idx] * (qidx.astype(jnp.float32) - zeros[:, g_idx])
    return jnp.dot(x, w.T.astype(x.dtype))


__all__ = ["uniform_matmul", "uniform_matmul_reference",
           "uniform_a8_matmul", "uniform_a8_reference"]
