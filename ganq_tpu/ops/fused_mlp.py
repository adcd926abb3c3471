"""Fused MLP block kernel (W8A8): gate/up matmuls + SiLU-gating + down
projection in ONE ``pallas_call``.

Motivation (PERF.md): at decode, per-op fixed overheads dominate the layer
time; the MLP holds ~75% of a llama layer's weights but was 6+ XLA ops.
Fused, it is one kernel: the grid walks tiles of the intermediate dimension,
each step streams that tile's gate/up rows and down columns (int8), computes
the gated activation for the tile, and accumulates its contribution to the
output — the [B, inter] intermediate never exists in HBM, and activations
are dynamically int8-quantized in-kernel (the w8a8 scheme: all scaling on
rank-1 outputs).

    y[B,H] = sum_t silu(x q8@ gate_t) * (x q8@ up_t) q8@ down_t

Weights use the w8 recode format (per-row scale int8), pre-split into
gate/up halves by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_rows(x):
    """Per-row dynamic int8: returns (x8 int8, scale f32 [rows, 1])."""
    sx = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return x8, sx


def _fused_mlp_kernel(x_ref, nw_ref, gw_ref, gs_ref, uw_ref, us_ref,
                      dw_ref, ds_ref, o_ref, acc_ref, *, n_t: int, act: str,
                      fold_norm: bool, eps: float, rms_offset: float):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)                      # [B, H]
    if fold_norm:
        # pre-norm folded in: h = rmsnorm(x) * (w + offset)
        var = jnp.mean(x * x, axis=1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps) * (
            nw_ref[:].astype(jnp.float32) + rms_offset)
    else:
        h = x
    x8, sx = _quant_rows(h)

    # DEFAULT precision: integer MXU dots reject a global HIGHEST override
    g = jax.lax.dot_general(x8, gw_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=jax.lax.Precision.DEFAULT)
    u = jax.lax.dot_general(x8, uw_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=jax.lax.Precision.DEFAULT)
    g = g.astype(jnp.float32) * sx * gs_ref[:][:, 0][None, :]   # [B, TI]
    u = u.astype(jnp.float32) * sx * us_ref[:][:, 0][None, :]
    if act == "silu":
        a = jax.nn.silu(g) * u
    elif act == "gelu_tanh":
        a = jax.nn.gelu(g, approximate=True) * u
    else:
        a = jax.nn.gelu(g, approximate=False) * u

    a8, sa = _quant_rows(a)                                # [B, TI]
    part = jax.lax.dot_general(a8, dw_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32,
                               precision=jax.lax.Precision.DEFAULT)
    acc_ref[:] += part.astype(jnp.float32) * sa            # [B, H]

    @pl.when(t == n_t - 1)
    def _():
        out = acc_ref[:] * ds_ref[:][:, 0][None, :]
        if fold_norm:  # residual folded in too
            out = out + x_ref[:].astype(jnp.float32)
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "block_i", "eps",
                                             "rms_offset"))
def fused_mlp_w8a8(x: jax.Array,
                   gateup_w8: jax.Array, gateup_scale: jax.Array,
                   down_w8: jax.Array, down_scale: jax.Array,
                   act: str = "silu", block_i: int = 1024,
                   norm_w: jax.Array = None, eps: float = 1e-5,
                   rms_offset: float = 0.0) -> jax.Array:
    """x [..., H] -> [..., H]. gateup: int8 [2I, Hp] (gate rows then up rows)
    + scale [2I, 1]; down: int8 [H, Ip] + scale [H, 1] (padded cols unused).
    The gateup array is fed twice with offset index maps — one block stream
    for the gate half, one for the up half."""
    orig_shape = x.shape
    H = x.shape[-1]
    I2, Hp = gateup_w8.shape
    I = I2 // 2
    Hd, Ip = down_w8.shape

    x2 = x.reshape(-1, H)
    B = x2.shape[0]
    ti = block_i
    while I % ti:
        ti //= 2
    # scoped-VMEM budget: the three streamed weight tiles (gate, up, down)
    # are double-buffered by Mosaic — 2 * 3 * ti * Hp bytes. At H=3072,
    # ti=1024 that is 18 MB, over the 16 MB scoped-vmem stack (observed OOM
    # on v5e at llama-3B shapes when the kernel is the whole program). Keep
    # tiles under a conservative 13 MB so resident x/out/acc + padding fit.
    while ti > 256 and 6 * ti * Hp > 13 * 2**20:
        ti //= 2
    fold_norm = norm_w is not None
    # decode-shaped only: at prefill token counts the x/acc buffers plus the
    # weight tiles exceed VMEM; the unfused w8a8 path serves prefill
    ok = (Hd == H and Hp >= H and Ip >= I and ti >= 256 and ti % 128 == 0
          and Hp % 128 == 0 and (not fold_norm or Hp == H) and B <= 64)
    if not ok:
        if fold_norm:  # apply norm + residual outside, then the fallback
            var = jnp.mean(x2.astype(jnp.float32) ** 2, axis=1, keepdims=True)
            h = x2 * jax.lax.rsqrt(var + eps) * (
                norm_w.astype(x2.dtype) + rms_offset)
            y = fused_mlp_w8a8(h, gateup_w8, gateup_scale, down_w8,
                               down_scale, act=act, block_i=block_i)
            return (x + y.reshape(orig_shape)).astype(x.dtype)
        gw = gateup_w8.astype(jnp.float32) * gateup_scale
        g = jnp.dot(x2, gw[:I, :H].T)
        u = jnp.dot(x2, gw[I:, :H].T)
        from ..models.transformer import _activation
        a = _activation(g, "silu" if act == "silu" else "gelu") * u
        y = jnp.dot(a, (down_w8[:, :I].astype(jnp.float32) * down_scale).T)
        return y.astype(x.dtype).reshape(*orig_shape[:-1], H)

    if Hp != H:
        x2 = jnp.pad(x2, ((0, 0), (0, Hp - H)))
    n_t = I // ti
    nw = (norm_w.reshape(1, H) if fold_norm
          else jnp.ones((1, Hp), jnp.float32))

    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, n_t=n_t, act=act,
                          fold_norm=fold_norm, eps=eps,
                          rms_offset=rms_offset),
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((B, Hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nw.shape[1]), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, Hp), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            # up half: block index offset by n_t rows-of-tiles
            pl.BlockSpec((ti, Hp), lambda t: (t + n_t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda t: (t + n_t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, ti), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * I * (2 * H + H),
            bytes_accessed=3 * I * H + B * H * x.dtype.itemsize,
            transcendentals=B * I,
        ),
    )(x2, nw, gateup_w8, gateup_scale, gateup_w8, gateup_scale,
      down_w8, down_scale)
    return out.reshape(*orig_shape[:-1], H)


__all__ = ["fused_mlp_w8a8"]
