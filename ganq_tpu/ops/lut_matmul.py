"""Fused LUT-dequant matmul Pallas kernels.

The TPU replacement for the reference's CUDA dequant-GEMM family
(Marlin ``gptqmodel_ext/marlin/marlin_cuda_kernel.cu``, Exllama
``q4_matmul.cu`` — wrapped at ``qlinear/marlin.py``/``exllama.py``), for the
**non-uniform per-row-codebook** format the reference never had a real kernel
for (its GANQ runtime is fp16 fake-quant, ``qlinear/fake.py:88-89``).

Computes ``y[B, M] = x[B, K] @ dequant(W)[M, K]^T`` where
``W[m, k] = lut[m, codes[m, k]]`` and codes are 4-bit packed into int32 in
*planar* layout (ops/packing.py): plane ``p`` of the packed block is a single
shift+mask and covers the contiguous column range ``[p*K/8, (p+1)*K/8)``.

Strategy: weights stream from HBM packed (4 bits/weight — 4x less HBM traffic
than bf16, which is the decode-speed story), each plane is dequantized in
VMEM via a 4-level binary select tree over the per-row codebook (15 vector
selects/element — no gather hardware needed) and immediately contracted on
the MXU with fp32 accumulation. Grid = (B tiles, M tiles); the full K extent
is processed per step (planar planes index global column ranges, so K cannot
be grid-tiled — fine: even 11008x4096 packed tiles fit VMEM comfortably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import pack_factor, unpack_int_rows, unpack_plane


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


def _select_tree_dequant(codes: jax.Array, lut: jax.Array,
                         bits: int = 4) -> jax.Array:
    """codes [TM, W] in [0, 2^bits), lut [TM, 2^bits] -> dequantized [TM, W].

    Binary select tree on the code bits — arithmetic blends instead of
    jnp.where (Mosaic's layout inference rejects broadcast i1 masks). The
    first two levels collapse into one bilinear interpolation per 4-entry
    group; per-row combination coefficients are rank-1 columns. ~28 VPU
    ops/element at 4 bits, ~16 at 3 bits, ~13 at 2 bits.
    """
    f = jnp.float32
    b0 = (codes & 1).astype(f)
    b1 = ((codes >> 1) & 1).astype(f)
    p01 = b0 * b1

    def col(s):  # [TM, 1] broadcastable column of the codebook
        return lut[:, s][:, None].astype(f)

    l2 = []
    for g in range(2 ** bits // 4):
        a, b, c, d = (col(4 * g), col(4 * g + 1), col(4 * g + 2), col(4 * g + 3))
        # lut[4g + (2*b1 + b0)] == a + b0(b-a) + b1(c-a) + b0b1(a-b-c+d)
        l2.append(a + b0 * (b - a) + b1 * (c - a) + p01 * (a - b - c + d))
    if bits == 2:
        return l2[0].astype(lut.dtype)
    b2 = ((codes >> 2) & 1).astype(f)
    if bits == 3:
        return (l2[0] + b2 * (l2[1] - l2[0])).astype(lut.dtype)
    b3 = ((codes >> 3) & 1).astype(f)
    l3 = [l2[0] + b2 * (l2[1] - l2[0]), l2[2] + b2 * (l2[3] - l2[2])]
    return (l3[0] + b3 * (l3[1] - l3[0])).astype(lut.dtype)


def _lut_matmul_kernel(x_ref, lut_ref, idx_ref, o_ref, *, width: int,
                       bits: int):
    """One (B tile, M tile) step over the full K extent: one planar plane per
    pack slot, each dequantized and contracted on the MXU."""
    lut = lut_ref[:]
    packed = idx_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for p in range(pack_factor(bits)):
        codes = unpack_plane(packed, bits, p)            # [TM, width]
        w = _select_tree_dequant(codes, lut, bits)       # [TM, width]
        xs = x_ref[:, p * width:(p + 1) * width]         # [TB, width]
        # explicit precision (a global HIGHEST override is rejected by
        # Mosaic for bf16/int operands): full passes for f32 inputs, the
        # native single pass for bf16
        prec = (jax.lax.Precision.HIGHEST if xs.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        acc += jax.lax.dot_general(
            xs, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                              # [TB, TM]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "block_b", "block_m"))
def lut_matmul(x: jax.Array, lut: jax.Array, idx_packed: jax.Array,
               bits: int = 4, block_b: int = 256, block_m: int = 512) -> jax.Array:
    """x [..., K] @ lut-dequant(W)[M, K]^T -> [..., M]. Pallas path for bits=4;
    other configs fall back to the XLA reference."""
    orig_shape = x.shape
    K = x.shape[-1]
    M = lut.shape[0]
    pf = pack_factor(bits)
    Kp = idx_packed.shape[1] * pf  # may be padded past K (lut_linear pads)
    width = Kp // pf

    tm = _pick_tile(M, (block_m, 512, 256, 128, 64, 32, 16, 8))
    if bits not in (2, 3, 4) or M % tm or Kp % pf or Kp < K             or (width % 128 and M > 8):
        return lut_matmul_reference(x, lut, idx_packed, bits)

    x2 = x.reshape(-1, K)
    if Kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
    B = x2.shape[0]
    tb = _pick_b_tile(B, block_b)

    out = pl.pallas_call(
        functools.partial(_lut_matmul_kernel, width=width, bits=bits),
        grid=(B // tb, M // tm),
        in_specs=[
            pl.BlockSpec((tb, Kp), lambda b, m: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 2 ** bits), lambda b, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, width), lambda b, m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tm), lambda b, m: (b, m), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * K,
            bytes_accessed=(B * K * x.dtype.itemsize + M * K * bits // 8
                            + B * M * x.dtype.itemsize),
            transcendentals=0,
        ),
    )(x2, lut.astype(x.dtype), idx_packed)
    return out.reshape(*orig_shape[:-1], M)


def lut_matmul_reference(x: jax.Array, lut: jax.Array, idx_packed: jax.Array,
                         bits: int) -> jax.Array:
    """Pure-XLA oracle: unpack + gather + matmul (the parity baseline)."""
    K = x.shape[-1]
    idx = unpack_int_rows(idx_packed, bits, K)
    w = jnp.take_along_axis(lut.astype(jnp.float32), idx, axis=1)
    return jnp.dot(x, w.T.astype(x.dtype))


__all__ = ["lut_matmul", "lut_matmul_reference"]
