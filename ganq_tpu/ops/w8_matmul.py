"""int8-recoded weight matmul: the fast serving path for LUT checkpoints.

Per-row LUT dequant needs ~28 VPU ops/element (lut_matmul.py) — above the
~10-op VPU/HBM breakeven at decode, so exact-LUT decode cannot beat bf16 on
a TPU. This path trades 2x weight memory (int8 vs int4) for a 2-op dequant:
at **load time** each LUT linear is recoded onto a per-row affine int8 grid
(``w8[m,k] = round(lut[m, idx[m,k]] / s[m])``), and the kernel streams int8,
converts + scales (2 VPU ops/element), and hits the MXU. Recode error is
bounded by s/2 = rowrange/508 — comparable to the bf16 storage granularity
of the codebook itself (accuracy validated in tests/test_engine.py).

Memory story vs bf16 stays 2x smaller; decode becomes HBM-bound again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import unpack_int_rows


def recode_lut_to_int8(lut: jax.Array, idx_packed: jax.Array, bits: int,
                       in_features: int):
    """(lut [m,16], packed codes) -> (w8 int8 [m, K'], scale f32 [m, 1]).
    K' keeps the pack-time padding (padded codes map to lut[0]*0-ish; the
    matmul zero-pads x so the extra columns are inert)."""
    from .packing import pack_factor
    Kp = idx_packed.shape[1] * pack_factor(bits)
    idx = unpack_int_rows(idx_packed, bits, Kp)
    w = jnp.take_along_axis(lut.astype(jnp.float32), idx, axis=1)  # [m, K']
    amax = jnp.max(jnp.abs(lut.astype(jnp.float32)), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


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


def _w8_kernel(x_ref, w8_ref, s_ref, o_ref):
    w = w8_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)
    prec = (jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = jax.lax.dot_general(
        x_ref[:], w.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_m"))
def w8_matmul(x: jax.Array, w8: jax.Array, scale: jax.Array,
              block_b: int = 256, block_m: int = 512) -> jax.Array:
    """x [..., K] @ (w8*scale)[M, K']^T -> [..., M] (K' >= K, zero-padded x)."""
    orig_shape = x.shape
    K = x.shape[-1]
    M, Kp = w8.shape
    tm = _pick_tile(M, (block_m, 512, 256, 128, 64, 32))
    if M % tm or Kp < K or (Kp % 128 and M > 8):
        w = w8.astype(jnp.float32) * scale
        return jnp.dot(x, w[:, :K].T.astype(x.dtype)).reshape(*orig_shape[:-1], M)

    x2 = x.reshape(-1, K)
    if Kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
    B = x2.shape[0]
    tb = _pick_b_tile(B, block_b)

    out = pl.pallas_call(
        _w8_kernel,
        grid=(B // tb, M // tm),
        in_specs=[
            pl.BlockSpec((tb, Kp), lambda b, m: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Kp), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tm), lambda b, m: (b, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * Kp,
            bytes_accessed=B * Kp * x.dtype.itemsize + M * Kp,
            transcendentals=0,
        ),
    )(x2, w8, scale)
    return out.reshape(*orig_shape[:-1], M)


def _w8a8_kernel(x_ref, w8_ref, s_ref, o_ref):
    """Dynamic per-token int8 activation quantization + int8xint8 MXU matmul.

    Dequant cost collapses from O(M*K) to O(B*K + B*M): the weight matrix
    feeds the MXU as stored int8; per-token activation scales and per-row
    weight scales apply to the [B, M] output."""
    x = x_ref[:].astype(jnp.float32)                       # [TB, K]
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    # precision must be DEFAULT: a global HIGHEST override makes Mosaic
    # reject integer operands ("Bad lhs type")
    acc = jax.lax.dot_general(
        x8, w8_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)               # [TB, TM]
    out = acc.astype(jnp.float32) * sx * s_ref[:][:, 0][None, :]
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "block_m"))
def w8a8_matmul(x: jax.Array, w8: jax.Array, scale: jax.Array,
                block_b: int = 256, block_m: int = 512) -> jax.Array:
    """W8A8-dynamic matmul: x [..., K] -> [..., M]. Activation int8 error is
    bounded by rowmax/254 per element (validated in tests)."""
    orig_shape = x.shape
    K = x.shape[-1]
    M, Kp = w8.shape
    tm = _pick_tile(M, (block_m, 512, 256, 128, 64, 32))
    if M % tm or Kp < K or (Kp % 128 and M > 8):
        w = w8.astype(jnp.float32) * scale
        return jnp.dot(x, w[:, :K].T.astype(x.dtype)).reshape(*orig_shape[:-1], M)

    x2 = x.reshape(-1, K)
    if Kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
    B = x2.shape[0]
    tb = _pick_b_tile(B, block_b)

    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(B // tb, M // tm),
        in_specs=[
            pl.BlockSpec((tb, Kp), lambda b, m: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, Kp), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tm), lambda b, m: (b, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * Kp,
            bytes_accessed=B * Kp * x.dtype.itemsize + M * Kp,
            transcendentals=0,
        ),
    )(x2, w8, scale)
    return out.reshape(*orig_shape[:-1], M)


__all__ = ["w8_matmul", "w8a8_matmul", "recode_lut_to_int8"]
