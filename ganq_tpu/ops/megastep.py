"""Whole-decode-step megakernel: ALL layers of a homogeneous llama-family
decoder in ONE ``pallas_call`` (W8A8 serving path).

Round-1 measurement (PERF.md): a ``lax.scan`` iteration costs ~116 us on
this runtime regardless of body — 28 layers = 3.2 ms/step of pure dispatch,
the single largest decode cost — and per-kernel dispatch adds more. This
kernel removes the per-layer program structure entirely: the grid is
``(layers, phases)`` and Mosaic's pipeline streams each layer's int8 weights
HBM->VMEM while the previous phase computes (measured marginal stream
bandwidth ~870 GB/s, scripts/mb_stream.py — at the HBM spec). The decode
step becomes ONE kernel launch bounded by the weight read, which is the
whole point of weight-only quantization.

Per layer the phase walk is:

  [0, NQ)            qkv row tiles: rmsnorm+int8 quant (step 0) -> int8 MXU
                     dot -> rope (block-diagonal sign-permutation trick,
                     ops/fused_attention.py) -> head-major VMEM rows;
                     last tile also emits the current token's k/v.
  [NQ, NQ+NT)        flash GQA attention, one cache T-block per step (all
                     batch rows, static (b, g) loops), online softmax in
                     VMEM scratch; blocks beyond ``pos`` are neither
                     streamed (index map clamps on the prefetched scalar)
                     nor computed. The current token's k/v fold in online.
  NQ+NT              o projection (single full-K int8 dot) + residual, then
                     the MLP rmsnorm + int8 quant of the updated residual.
  [NQ+NT+1, +NG)     fused MLP tiles (gate/up int8 dots -> activation ->
                     per-tile int8 quant -> down partial dot), accumulating
                     the down projection in f32 scratch; the last tile adds
                     the residual and (for the last layer) writes y.

The sequential dependence between layers is what the reference's per-layer
CUDA kernel launches serialize on the host (gptqmodel/nn_modules/qlinear/*,
gptqmodel_ext/marlin + exllama*); on TPU the same dependence lives inside
one program, with the DMA pipeline as the only "launch" machinery.

Weight layout (see :func:`megapack`): everything is stacked with a leading
layer axis; ``down`` is stored K-major ``[L, I, H]`` so tiles are contiguous
DMA reads and the partial dot needs no transpose.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import (expand_rope_tables, qkv_fusable_tile,
                              rope_tile_operands)

_DEF = jax.lax.Precision.DEFAULT


def _quant_rows(x):
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0,
                     1e-12)
    return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx


def _megastep_kernel(pos_ref, x_ref, anw_ref, mnw_ref,
                     qw_ref, qsc_ref, qb_ref, cos_ref, sin_ref, r_ref,
                     kc_ref, vc_ref, ow_ref, osc_ref,
                     gw_ref, gsc_ref, uw_ref, usc_ref, dw_ref, dsc_ref,
                     y_ref, kn_ref, vn_ref,
                     x_s, x8_s, sx_s, qkv_s, acc_s, m_s, l_s, a8_s, ma_s,
                     *, B: int, d: int, Hq: int, Hkv: int, qpk: int,
                     NQ: int, NT: int, NG: int, Tb: int, nh: int,
                     n_rope: int, L: int, eps: float, rms_offset: float,
                     scale: float, act: str, debug_skip: tuple = ()):
    lix = pl.program_id(0)
    p = pl.program_id(1)
    pos = pos_ref[0]
    f32 = jnp.float32
    O_STEP = NQ + NT

    # ---- layer entry: residual init (layer 0), attn norm + quant, flash init
    @pl.when(p == 0)
    def _():
        @pl.when(lix == 0)
        def _():
            x_s[:] = x_ref[:].astype(f32)
        xf = x_s[:]
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * (
            anw_ref[0].astype(f32) + rms_offset)
        x8, sx = _quant_rows(xf)
        x8_s[:] = x8
        sx_s[:B, :1] = sx
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    # ---- phase A: qkv row tile -> rope -> head-major scratch rows
    # (stride-8 rows: Mosaic needs dynamic sublane offsets divisible by 8)
    @pl.when((p < NQ) & ("qkv" not in debug_skip))
    def _():
        y = jax.lax.dot_general(x8_s[:], qw_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32,
                                precision=_DEF)
        y = y.astype(f32) * sx_s[:B, :1] * qsc_ref[0][:, 0][None, :]
        y = y + qb_ref[0]
        rot = jax.lax.dot_general(y.astype(jnp.bfloat16), r_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32, precision=_DEF)
        roped = y * cos_ref[:] + rot * sin_ref[:]
        y = jnp.where(p < n_rope, roped, y).astype(jnp.bfloat16)
        for i in range(nh):
            qkv_s[pl.ds((p * nh + i) * 8, 8), :] = jnp.pad(
                y[:, i * d:(i + 1) * d], ((0, 8 - B), (0, 0)))

    @pl.when(p == NQ - 1)
    def _():
        for g in range(Hkv):
            kn_ref[0, :, g * d:(g + 1) * d] = qkv_s[
                (Hq + g) * 8:(Hq + g) * 8 + B, :]
            vn_ref[0, :, g * d:(g + 1) * d] = qkv_s[
                (Hq + Hkv + g) * 8:(Hq + Hkv + g) * 8 + B, :]

    # ---- phase B: flash attention over one cache block (all batch rows)
    tb = p - NQ
    in_flash = (p >= NQ) & (p < NQ + NT)

    def _rows(base_s, b, g, n):
        """Rows (g*qpk+i)*8+b, i<n of a [Hq*8, cols] scratch -> [n, cols]."""
        return jnp.concatenate(
            [base_s[(g * qpk + i) * 8 + b:(g * qpk + i) * 8 + b + 1, :]
             for i in range(n)], axis=0)

    def _online(b, g, s_blk, v_blk):
        """Fold scores s_blk [qpk, Tk] + values v_blk [Tk, d] into the
        (b, g) flash state. m/l rows stay lane-duplicated (no [1,1] dual-dim
        broadcasts, which Mosaic rejects)."""
        m_prev = _rows(m_s, b, g, qpk)                       # [qpk, 128]
        l_prev = _rows(l_s, b, g, qpk)
        a_prev = _rows(acc_s, b, g, qpk)
        smax = jnp.max(s_blk, axis=1, keepdims=True)         # [qpk, 1]
        m_new = jnp.maximum(m_prev, smax)                    # lane-bcast
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s_blk - m_new[:, :1])                 # [qpk, Tk]
        l_new = l_prev * alpha + jnp.sum(pexp, axis=1, keepdims=True)
        pv = jax.lax.dot_general(pexp.astype(jnp.bfloat16), v_blk,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32, precision=_DEF)
        a_new = a_prev * alpha + pv                          # d == 128 lanes
        for i in range(qpk):
            r = (g * qpk + i) * 8 + b
            m_s[r:r + 1, :] = m_new[i:i + 1, :]
            l_s[r:r + 1, :] = l_new[i:i + 1, :]
            acc_s[r:r + 1, :] = a_new[i:i + 1, :]

    @pl.when(in_flash & (tb * Tb < pos) & ("flash" not in debug_skip))
    def _():
        t_abs = tb * Tb + jax.lax.broadcasted_iota(jnp.int32, (1, Tb), 1)
        valid = t_abs < pos
        for b in range(B):
            for g in range(Hkv):
                q3 = _rows(qkv_s, b, g, qpk).astype(jnp.bfloat16)
                kg = kc_ref[0, b * Hkv + g, :, :].astype(jnp.bfloat16)
                vg = vc_ref[0, b * Hkv + g, :, :].astype(jnp.bfloat16)
                sc = jax.lax.dot_general(q3, kg, (((1,), (1,)), ((), ())),
                                         preferred_element_type=f32,
                                         precision=_DEF)
                sc = jnp.where(valid, sc * scale, -1e30)     # [qpk, Tb]
                _online(b, g, sc, vg)

    # current token's k/v fold (write-then-attend semantics without the write)
    @pl.when(in_flash & (tb == NT - 1) & ("flash" not in debug_skip))
    def _():
        for b in range(B):
            for g in range(Hkv):
                q3 = _rows(qkv_s, b, g, qpk).astype(f32)
                kcur = qkv_s[(Hq + g) * 8 + b:(Hq + g) * 8 + b + 1, :]
                vcur = qkv_s[(Hq + Hkv + g) * 8 + b:(Hq + Hkv + g) * 8 + b + 1, :]
                # single-key score: multiply-reduce (a [qpk,d]x[1,d] dot
                # trips a Mosaic bf16->f32 broadcast verification bug)
                s_c = jnp.sum(q3 * kcur.astype(f32), axis=1,
                              keepdims=True) * scale
                _online(b, g, s_c, vcur.astype(jnp.bfloat16))

    # ---- phase C: flash finalize -> [B, Dq] int8 -> o dot -> residual,
    # then the MLP norm + quant of the updated residual
    @pl.when((p == O_STEP) & ("o" not in debug_skip))
    def _():
        # a = acc / l, per-batch-row max across all heads
        sa = jnp.zeros((8, 1), f32) + 1e-12
        for h in range(Hq):
            a_h = acc_s[h * 8:(h + 1) * 8, :] / jnp.maximum(
                l_s[h * 8:(h + 1) * 8, :1], 1e-30)           # [8, d]
            acc_s[h * 8:(h + 1) * 8, :] = a_h
            sa = jnp.maximum(sa, jnp.max(jnp.abs(a_h), axis=1, keepdims=True))
        sa = sa / 127.0
        for h in range(Hq):
            a8_s[:, h * d:(h + 1) * d] = jnp.clip(
                jnp.round(acc_s[h * 8:(h + 1) * 8, :] / sa),
                -127, 127).astype(jnp.int8)
        o32 = jax.lax.dot_general(a8_s[:], ow_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32,
                                  precision=_DEF)            # [8, H]
        x_s[:] += (o32[:B].astype(f32) * sa[:B] * osc_ref[0])
        # MLP norm + quant (reuses x8_s/sx_s — the attn activations are done)
        xf = x_s[:]
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * (
            mnw_ref[0].astype(f32) + rms_offset)
        x8, sx = _quant_rows(xf)
        x8_s[:] = x8
        sx_s[:B, :1] = sx
        ma_s[:] = jnp.zeros_like(ma_s)

    # ---- phase D: fused MLP tile
    in_mlp = p > O_STEP

    @pl.when(in_mlp & ("mlp" not in debug_skip))
    def _():
        g32 = jax.lax.dot_general(x8_s[:], gw_ref[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32,
                                  precision=_DEF)
        u32 = jax.lax.dot_general(x8_s[:], uw_ref[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32,
                                  precision=_DEF)
        g = g32.astype(f32) * sx_s[:B, :1] * gsc_ref[0][:, 0][None, :]
        u = u32.astype(f32) * sx_s[:B, :1] * usc_ref[0][:, 0][None, :]
        if act == "silu":
            a = jax.nn.silu(g) * u
        elif act == "gelu_tanh":
            a = jax.nn.gelu(g, approximate=True) * u
        else:
            a = jax.nn.gelu(g, approximate=False) * u
        a8, sa = _quant_rows(a)
        part = jax.lax.dot_general(a8, dw_ref[0], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32,
                                   precision=_DEF)           # [B, H]
        ma_s[:] += part.astype(f32) * sa

    @pl.when(p == O_STEP + NG)
    def _():
        x_s[:] += ma_s[:] * dsc_ref[0]

        @pl.when(lix == L - 1)
        def _():
            y_ref[:] = x_s[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "q_dim", "kv_dim", "head_dim", "rotary_dim", "interleaved", "eps",
    "rms_offset", "scale", "act", "block_t", "block_i", "interpret",
    "debug_skip"))
def megastep_decode_w8a8(x: jax.Array, mp: Dict[str, jax.Array],
                         k_cache: jax.Array, v_cache: jax.Array,
                         pos: jax.Array, cos_half, sin_half, *,
                         q_dim: int, kv_dim: int, head_dim: int,
                         rotary_dim: int = 0, interleaved: bool = False,
                         eps: float = 1e-5, rms_offset: float = 0.0,
                         scale: float = 1.0, act: str = "silu",
                         block_t: int = 256, block_i: int = 1024,
                         interpret: bool = False, debug_skip: tuple = ()):
    """One full decode step over all layers.

    x [B, H] (embedded current token); ``mp`` from :func:`megapack`;
    k/v_cache [L, B*Hkv, T, d] (mega layout, history < pos); cos/sin_half
    [rd/2] rope tables at ``pos``. Returns (y [B, H] — pre-final-norm
    hidden, k_new [L, B, kv_dim], v_new [L, B, kv_dim]).
    """
    B, H = x.shape
    if B > 8:
        raise ValueError("megastep_decode_w8a8: B <= 8 (stride-8 rows)")
    L, Dqkv, _ = mp["qkv_w8"].shape
    d = head_dim
    Hq, Hkv = q_dim // d, kv_dim // d
    qpk = Hq // Hkv
    T = k_cache.shape[2]
    I = mp["down_t"].shape[1]

    tile_q = qkv_fusable_tile(q_dim, kv_dim, d)
    NQ = Dqkv // tile_q
    nh = tile_q // d
    n_rope = (q_dim + kv_dim) // tile_q
    Tb = min(block_t, T)
    while T % Tb:
        Tb //= 2
    NT = T // Tb
    ti = block_i
    while I % ti:
        ti //= 2
    NG = I // ti
    P = NQ + NT + 1 + NG

    rd = rotary_dim or 0
    R, cmap, smap = rope_tile_operands(tile_q, d, rd, interleaved)
    if rd:
        cos_l, sin_l = expand_rope_tables(cos_half, sin_half, cmap, smap)
    else:
        cos_l = jnp.ones((1, tile_q), jnp.float32)
        sin_l = jnp.zeros((1, tile_q), jnp.float32)

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def qi(l, p, s):
        return jnp.clip(p, 0, NQ - 1)

    def fb(l, p, s):
        t = jnp.clip(p - NQ, 0, NT - 1)
        return jnp.minimum(t, jnp.maximum(s[0] - 1, 0) // Tb)

    def gi(l, p, s):
        return jnp.clip(p - NQ - NT - 1, 0, NG - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, P),
        in_specs=[
            pl.BlockSpec((B, H), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, H), lambda l, p, s: (l, qi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, 1), lambda l, p, s: (l, qi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_q),
                         lambda l, p, s: (l, 0, qi(l, p, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, tile_q), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B * Hkv, Tb, d),
                         lambda l, p, s: (l, 0, fb(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B * Hkv, Tb, d),
                         lambda l, p, s: (l, 0, fb(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_dim, H), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, H), lambda l, p, s: (l, gi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, 1), lambda l, p, s: (l, gi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, H), lambda l, p, s: (l, gi(l, p, s) + NG, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, 1), lambda l, p, s: (l, gi(l, p, s) + NG, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, H), lambda l, p, s: (l, gi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, H), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, kv_dim), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, kv_dim), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),                 # x_s residual
            pltpu.VMEM((B, H), jnp.int8),                    # x8
            pltpu.VMEM((8, 128), jnp.float32),               # sx
            pltpu.VMEM(((Hq + 2 * Hkv) * 8, d), jnp.bfloat16),  # qkv rows
            pltpu.VMEM((Hq * 8, d), jnp.float32),            # flash acc
            pltpu.VMEM((Hq * 8, 128), jnp.float32),          # m
            pltpu.VMEM((Hq * 8, 128), jnp.float32),          # l
            pltpu.VMEM((8, q_dim), jnp.int8),                # a8 (attn out)
            pltpu.VMEM((B, H), jnp.float32),                 # mlp acc
        ],
    )
    weight_bytes = L * (Dqkv * H + q_dim * H + 3 * I * H)
    y, kn, vn = pl.pallas_call(
        functools.partial(
            _megastep_kernel, B=B, d=d, Hq=Hq, Hkv=Hkv, qpk=qpk, NQ=NQ,
            NT=NT, NG=NG, Tb=Tb, nh=nh, n_rope=n_rope, L=L, eps=eps,
            rms_offset=rms_offset, scale=scale, act=act,
            debug_skip=debug_skip),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((L, B, kv_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, kv_dim), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * weight_bytes + 4 * B * L * Hq * T * d,
            bytes_accessed=weight_bytes + 2 * L * B * T * Hkv * d * 2,
            transcendentals=B * L * (Hq * T + I),
        ),
        interpret=interpret,
    )(pos_arr, x, mp["attn_norm"], mp["mlp_norm"],
      mp["qkv_w8"], mp["qkv_scale"], mp["qkv_bias"], cos_l, sin_l,
      jnp.asarray(R, jnp.bfloat16), k_cache, v_cache,
      mp["o_t_w8"], mp["o_t_scale"],
      mp["gateup_w8"], mp["gateup_scale"], mp["gateup_w8"],
      mp["gateup_scale"], mp["down_t"], mp["down_scale"])
    return y, kn, vn


# --------------------------------------------------------------- pack + gate
def megapack(cfg, sp: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Stacked megakernel operands from a stacked-serving params pytree
    (``stacked.stack_layers`` output with w8 recode + qkv/gateup fusion)."""
    ls = sp["layers_stacked"]
    qkv = ls["attn"]["qkv"]
    gu = ls["mlp"]["gateup"]
    dn = ls["mlp"]["down"]
    L, Dqkv, H = qkv["w8"].shape
    I = gu["w8"].shape[1] // 2
    bias = qkv.arrays.get("bias")
    if bias is None:
        bias = jnp.zeros((L, Dqkv), jnp.float32)
    return {
        "attn_norm": ls["input_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H),
        "mlp_norm": ls["post_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H),
        "qkv_w8": qkv["w8"],
        "qkv_scale": qkv["scale"].reshape(L, Dqkv, 1).astype(jnp.float32),
        "qkv_bias": bias.reshape(L, 1, Dqkv).astype(jnp.float32),
        "o_t_w8": ls["attn"]["o_t_w8"],
        "o_t_scale": ls["attn"]["o_t_scale"].reshape(L, 1, H).astype(
            jnp.float32),
        "gateup_w8": gu["w8"][:, :, :H],
        "gateup_scale": gu["scale"].reshape(L, 2 * I, 1).astype(jnp.float32),
        # down K-major: [L, H, Ip] -> [L, I, H] (contiguous k-tiles)
        "down_t": jnp.swapaxes(dn["w8"][:, :, :I], 1, 2),
        "down_scale": dn["scale"].reshape(L, 1, H).astype(jnp.float32),
    }


def megastep_fusable(cfg, sp: Dict[str, Any]) -> bool:
    """Static capability gate (the SUPPORTS_* analog): homogeneous stacked
    llama-family w8 models with rope, rmsnorm-before, gated MLP, d=128."""
    ls = sp.get("layers_stacked")
    if ls is None:
        return False
    attn, mlp = ls.get("attn", {}), ls.get("mlp", {})
    qkv, gu, dn = attn.get("qkv"), mlp.get("gateup"), mlp.get("down")
    if qkv is None or gu is None or dn is None or "o_t_w8" not in attn:
        return False
    if any(getattr(m, "kind", None) != "w8" for m in (qkv, gu, dn)):
        return False
    if any("lora_a" in m.arrays for m in (qkv, gu, dn)):
        return False
    if "bias" in dn.arrays or "bias" in gu.arrays:
        return False
    if cfg.head_dim != 128 or cfg.v_head_dim not in (None, cfg.head_dim):
        return False
    if cfg.hidden_size % 128 or cfg.qk_norm or cfg.clip_qkv is not None:
        return False
    if cfg.norm != "rmsnorm" or not cfg.do_layer_norm_before:
        return False
    if (cfg.norm_after_sublayer or cfg.sandwich_norm or cfg.parallel_residual
            or cfg.residual_multiplier is not None):
        return False
    if cfg.pos != "rope" or cfg.attn_softcap is not None or cfg.mla:
        return False
    if cfg.sliding_window is not None or cfg.rope_local_theta is not None:
        return False
    if not cfg.gated_mlp or "moe" in ls:
        return False
    if gu["w8"].shape[2] != cfg.hidden_size:
        return False
    kvd = (qkv["w8"].shape[1] - cfg.q_dim) // 2
    return qkv_fusable_tile(cfg.q_dim, kvd, cfg.head_dim) is not None


# ------------------------------------------------------------------- oracle
def megastep_reference(x, mp, k_cache, v_cache, pos, cos_half, sin_half, *,
                       q_dim, kv_dim, head_dim, rotary_dim=0,
                       interleaved=False, eps=1e-5, rms_offset=0.0,
                       scale=1.0, act="silu"):
    """Pure-jnp oracle mirroring the kernel math exactly (both activation
    quantizations, per-tile MLP quant, flash == softmax). Cache in mega
    layout [L, B*Hkv, T, d]."""
    from .fused_layer import attn_half_decode_reference

    B, H = x.shape
    L = mp["qkv_w8"].shape[0]
    Hkv = kv_dim // head_dim
    T = k_cache.shape[2]
    I = mp["down_t"].shape[1]
    ti = 1024
    while I % ti:
        ti //= 2

    xs = x
    kns, vns = [], []
    for li in range(L):
        kc = k_cache[li].reshape(B, Hkv, T, head_dim).transpose(0, 2, 1, 3)
        vc = v_cache[li].reshape(B, Hkv, T, head_dim).transpose(0, 2, 1, 3)
        bias = mp["qkv_bias"][li]
        y, kn, vn = attn_half_decode_reference(
            xs, mp["attn_norm"][li], mp["qkv_w8"][li],
            mp["qkv_scale"][li], bias,
            mp["o_t_w8"][li], mp["o_t_scale"][li], cos_half, sin_half,
            kc, vc, pos, q_dim=q_dim, kv_dim=kv_dim, head_dim=head_dim,
            rotary_dim=rotary_dim, interleaved=interleaved, eps=eps,
            rms_offset=rms_offset, scale=scale)
        kns.append(kn.reshape(B, kv_dim))
        vns.append(vn.reshape(B, kv_dim))
        # MLP with per-tile activation quantization (kernel semantics)
        xf = y.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        h = xf * jax.lax.rsqrt(var + eps) * (
            mp["mlp_norm"][li].astype(jnp.float32) + rms_offset)
        x8, sx = _quant_rows(h)
        out = jnp.zeros((B, H), jnp.float32)
        for t0 in range(0, I, ti):
            gw = mp["gateup_w8"][li][t0:t0 + ti].astype(jnp.float32)
            uw = mp["gateup_w8"][li][I + t0:I + t0 + ti].astype(jnp.float32)
            g = (x8.astype(jnp.float32) @ gw.T) * sx \
                * mp["gateup_scale"][li][t0:t0 + ti, 0][None, :]
            u = (x8.astype(jnp.float32) @ uw.T) * sx \
                * mp["gateup_scale"][li][I + t0:I + t0 + ti, 0][None, :]
            if act == "silu":
                a = jax.nn.silu(g) * u
            elif act == "gelu_tanh":
                a = jax.nn.gelu(g, approximate=True) * u
            else:
                a = jax.nn.gelu(g, approximate=False) * u
            a8, sa = _quant_rows(a)
            dw = mp["down_t"][li][t0:t0 + ti].astype(jnp.float32)
            out = out + (a8.astype(jnp.float32) @ dw) * sa
        xs = (y.astype(jnp.float32)
              + out * mp["down_scale"][li][0]).astype(x.dtype)
    return xs, jnp.stack(kns), jnp.stack(vns)


__all__ = ["megastep_decode_w8a8", "megastep_reference", "megapack",
           "megastep_fusable"]
