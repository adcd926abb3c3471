"""Fused uniform (scale/zero) dequant matmul Pallas kernel.

The TPU counterpart of the reference's uniform GPTQ kernels
(Marlin/Exllama/Triton ``quant_matmul_248`` family,
``gptqmodel/nn_modules/triton_utils/kernels.py:103-259``): packed codes are
streamed from HBM (planar layout, ops/packing.py), dequantized on the VPU
with 2 FMAs/element (``(q - zero) * scale``) per group *segment* — every
MXU contraction stays inside one quantization group, so scale/zero are
rank-1 broadcasts and no interleave reshape is needed.

Pallas-path capability (mirroring the reference's per-kernel ``SUPPORTS_*``
validation, ``qlinear/__init__.py:33-372``): bits=4, sequential group
boundaries (``g_idx[k] == k // group_size``), and group size either -1 or
aligned to the planar plane width. desc_act checkpoints (permuted g_idx)
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


def _uniform_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, *, width: int, gs: int):
    """Full-K step for one (B tile, M tile). Group scale/zero expand to
    per-column via segment concat (group-aligned, so each segment's params
    are a rank-1 [TM, 1] broadcast); one MXU dot per plane."""
    packed = qw_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    segs_per_plane = max(width // gs, 1)
    seg = min(gs, width)
    for p in range(8):
        codes = unpack_plane(packed, 4, p).astype(jnp.float32)   # [TM, width]
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
    K = x2.shape[-1]
    M = qweight.shape[0]
    B = x2.shape[0]
    n_groups = scales.shape[1]
    gs = K // n_groups
    width = K // 8

    return pl.pallas_call(
        functools.partial(_uniform_kernel, width=width, gs=min(gs, K)),
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
            bytes_accessed=B * K * x2.dtype.itemsize + M * K // 2,
            transcendentals=0,
        ),
    )(x2, qweight, scales, zeros)


def uniform_matmul(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                   zeros: jax.Array, g_idx: jax.Array, bits: int = 4,
                   block_b: int = 256, block_m: int = 512) -> jax.Array:
    """x [..., K] @ dequant(W)[M, K]^T for the uniform format (planar packing)."""
    K = x.shape[-1]
    n_groups = scales.shape[1]
    gs = K // n_groups if n_groups else K
    M = qweight.shape[0]
    width = K // 8
    tm = _pick_tile(M, (block_m, 512, 256, 128, 64, 32, 16, 8))
    seg = min(gs, width)
    ok = (bits == 4 and K % 8 == 0 and K % max(n_groups, 1) == 0
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


def uniform_matmul_reference(x, qweight, scales, zeros, g_idx, bits):
    K = x.shape[-1]
    if g_idx is None:
        gs = -(-K // max(scales.shape[1], 1))
        g_idx = jnp.arange(K, dtype=jnp.int32) // gs
    qidx = unpack_int_rows(qweight, bits, K)
    w = scales[:, g_idx] * (qidx.astype(jnp.float32) - zeros[:, g_idx])
    return jnp.dot(x, w.T.astype(x.dtype))


__all__ = ["uniform_matmul", "uniform_matmul_reference"]
