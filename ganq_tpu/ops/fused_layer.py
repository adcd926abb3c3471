"""Whole-attention-half decode megakernel (W8A8 serving path).

One ``pallas_call`` per decoder layer covering everything between the
residual stream and the MLP: rmsnorm -> dynamic-int8 activation quant ->
fused qkv matmul (int8 MXU) -> rope -> flash GQA attention over the KV cache
(with the current token folded in online) -> dynamic-int8 o projection ->
residual add. Together with the fused-MLP kernel (``ops/fused_mlp.py``) a
decode layer becomes TWO kernels total.

Motivation (PERF.md round-1): this environment charges a large fixed cost
per op executed inside a jitted program; the attention half was 3 pallas
calls (qkv matmul, flash attention, o matmul) plus XLA glue. On
directly-attached hardware the fusion also removes the HBM round trips of
the qkv/attention intermediates, like the MLP megakernel did.

TPU-native design notes (no counterpart in the reference, whose kernels are
per-linear CUDA GEMMs — ``gptqmodel_ext/exllama*/marlin``):

- the grid is ONE "arbitrary" (sequential) dimension walking three phases:
  ``[0, NQ)`` qkv weight row tiles, ``[NQ, NQ+B*NT)`` flash (batch x cache
  blocks), ``[NQ+B*NT, +NO)`` o-projection column tiles. Every input's index
  map clamps outside its phase so its block stays resident (no re-DMA).
- Mosaic cannot reshape the minor (lane) dimension, so qkv rows land in a
  head-major VMEM scratch ``qkv_s[(head row h*B+b), d]`` via lane-aligned
  per-head column slices; flash reads per-(b,h) single rows; the o input is
  rebuilt as a TRANSPOSED int8 ``a8t[Dq, B]`` (one [B,d] f32 transpose per
  head at finalize) so each o tile is ONE full-K int8 MXU dot.
- rope rides the same block-diagonal sign-permutation trick as
  ``fused_attention.fused_qkv_rope_w8a8`` (exact in bf16, no reshapes).
- cache blocks wholly beyond ``pos`` are neither streamed (index map clamps
  via the prefetched scalar) nor computed.

The kernel returns the current token's k/v so the caller writes the cache
with one ``dynamic_update_slice`` — attention already includes the current
token via the online fold, exactly matching write-then-attend semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import (expand_rope_tables, qkv_fusable_tile,
                              rope_tile_operands)


def _attn_half_kernel(pos_ref, x_ref, nw_ref, qw_ref, qsc_ref, qb_ref,
                      cos_ref, sin_ref, r_ref, kc_ref, vc_ref,
                      ow_ref, osc_ref, xo_ref,
                      y_ref, kn_ref, vn_ref,
                      x8_s, sx_s, qkv_s, acc_s, m_s, l_s, a8t_s, sa_s,
                      *, B: int, d: int, Hq: int, Hkv: int, qpk: int,
                      NQ: int, NT: int, NO: int, Tb: int, nh: int,
                      n_rope: int, eps: float, rms_offset: float,
                      scale: float, fold_norm: bool):
    t = pl.program_id(0)
    pos = pos_ref[0]
    f32 = jnp.float32

    # ---- step 0: norm + per-token int8 quant of x, flash state init
    @pl.when(t == 0)
    def _():
        xf = x_ref[:].astype(f32)
        if fold_norm:
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + eps) * (
                nw_ref[:].astype(f32) + rms_offset)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0,
                         1e-12)
        x8_s[:] = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        sx_s[:B, :1] = sx
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    # ---- phase 1: qkv row tile -> rope -> head-major scratch
    # Scratch rows use a fixed stride of 8 per head (Mosaic requires dynamic
    # sublane offsets provably divisible by 8); row (h, b) = h*8 + b, B <= 8.
    @pl.when(t < NQ)
    def _():
        y = jax.lax.dot_general(x8_s[:], qw_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32,
                                precision=jax.lax.Precision.DEFAULT)
        y = y.astype(f32) * sx_s[:B, :1] * qsc_ref[:][:, 0][None, :]
        y = y + qb_ref[:]
        rot = jax.lax.dot_general(y.astype(jnp.bfloat16), r_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32,
                                  precision=jax.lax.Precision.DEFAULT)
        roped = y * cos_ref[:] + rot * sin_ref[:]
        y = jnp.where(t < n_rope, roped, y).astype(jnp.bfloat16)
        for i in range(nh):
            qkv_s[pl.ds((t * nh + i) * 8, B), :] = y[:, i * d:(i + 1) * d]

    # current token k/v out (all qkv tiles done at t == NQ-1)
    @pl.when(t == NQ - 1)
    def _():
        for g in range(Hkv):
            kn_ref[:, g * d:(g + 1) * d] = qkv_s[(Hq + g) * 8:(Hq + g) * 8 + B, :]
            vn_ref[:, g * d:(g + 1) * d] = qkv_s[
                (Hq + Hkv + g) * 8:(Hq + Hkv + g) * 8 + B, :]

    # ---- phase 2: flash attention, one (batch row, cache block) per step.
    # The batch row b is dynamic, so every per-(h, b) row access goes through
    # a one-hot select/merge over the static 8-row block of head h — no
    # dynamic sublane indices at all.
    fi = jnp.clip(t - NQ, 0, B * NT - 1)
    b = fi // NT
    tb = fi - b * NT
    in_flash = (t >= NQ) & (t < NQ + B * NT)
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == b   # [8, 1]

    def _pick(blk):
        """Select row b of a [8, n] block -> [1, n] (f32)."""
        return jnp.sum(jnp.where(sel, blk.astype(f32), 0.0), axis=0,
                       keepdims=True)

    def _online_update(h, s_row, v_rows):
        """Fold scores s_row [1, Tk] with values v_rows [Tk, d] into the
        (h, b) flash state via masked block merges. m/l rows are kept
        DUPLICATED across all 128 lanes so no [1,1]->[8,128] dual-dim
        broadcast (unsupported by Mosaic) ever appears; d == 128 makes the
        lane-wide alpha directly multiply the accumulator row."""
        h8 = slice(h * 8, (h + 1) * 8)
        m_blk = m_s[h8, :]
        l_blk = l_s[h8, :]
        a_blk = acc_s[h8, :]
        m_prev = _pick(m_blk)                               # [1, 128]
        smax = jnp.max(s_row, axis=1, keepdims=True)        # [1, 1]
        m_new = jnp.maximum(m_prev, smax)                   # lane-bcast only
        alpha = jnp.exp(m_prev - m_new)                     # [1, 128]
        p = jnp.exp(s_row - m_new[:, :1])                   # [1, Tk]
        l_new = (_pick(l_blk) * alpha
                 + jnp.sum(p, axis=1, keepdims=True))       # lane-bcast only
        pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v_rows,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32,
                                 precision=jax.lax.Precision.DEFAULT)
        a_new = _pick(a_blk) * alpha + pv                   # [1, d], d==128
        m_s[h8, :] = jnp.where(sel, m_new, m_blk)           # sublane-bcast
        l_s[h8, :] = jnp.where(sel, l_new, l_blk)
        acc_s[h8, :] = jnp.where(sel, a_new, a_blk)

    @pl.when(in_flash & (tb * Tb < pos))
    def _():
        t_abs = tb * Tb + jax.lax.broadcasted_iota(jnp.int32, (1, Tb), 1)
        valid = t_abs < pos                        # current token folded below
        for h in range(Hq):
            g = h // qpk
            qh = _pick(qkv_s[h * 8:(h + 1) * 8, :]).astype(jnp.bfloat16)
            kg = kc_ref[0, :, g, :].astype(jnp.bfloat16)     # [Tb, d]
            vg = vc_ref[0, :, g, :].astype(jnp.bfloat16)
            sc = jax.lax.dot_general(qh, kg, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32,
                                     precision=jax.lax.Precision.DEFAULT)
            sc = jnp.where(valid, sc * scale, -1e30)         # [1, Tb]
            _online_update(h, sc, vg)

    # fold the current token's k/v once per batch row (its own kv lives in
    # qkv_s — the cache is written by the caller after the kernel)
    @pl.when(in_flash & (tb == NT - 1))
    def _():
        for h in range(Hq):
            g = h // qpk
            qh = _pick(qkv_s[h * 8:(h + 1) * 8, :]).astype(jnp.bfloat16)
            kcur = _pick(qkv_s[(Hq + g) * 8:(Hq + g) * 8 + 8, :]
                         ).astype(jnp.bfloat16)
            vcur = _pick(qkv_s[(Hq + Hkv + g) * 8:(Hq + Hkv + g) * 8 + 8, :]
                         ).astype(jnp.bfloat16)
            s_c = jax.lax.dot_general(qh, kcur, (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32,
                                      precision=jax.lax.Precision.DEFAULT
                                      )[:, :1] * scale       # [1, 1]
            _online_update(h, s_c, vcur)

    # ---- phase 3: o projection tiles
    in_o = t >= NQ + B * NT

    @pl.when(in_o & (t == NQ + B * NT))
    def _():
        # finalize: a = acc / l, per-batch-row int8 quant, TRANSPOSED store
        sa_s[:] = jnp.full_like(sa_s, 1e-12)
        for h in range(Hq):
            a_h = acc_s[h * 8:(h + 1) * 8, :] / jnp.maximum(
                l_s[h * 8:(h + 1) * 8, :1], 1e-30)           # [8, d]
            acc_s[h * 8:(h + 1) * 8, :] = a_h
            sa_s[:, :1] = jnp.maximum(
                sa_s[:, :1], jnp.max(jnp.abs(a_h), axis=1, keepdims=True))
        sa_s[:, :1] = sa_s[:, :1] / 127.0
        sa_row = sa_s[:, :1].T                                # [1, 8]
        for h in range(Hq):
            at = acc_s[h * 8:(h + 1) * 8, :].T                # [d, 8] f32
            a8t_s[h * d:(h + 1) * d, :8] = jnp.clip(
                jnp.round(at / sa_row), -127, 127).astype(jnp.int8)

    @pl.when(in_o)
    def _():
        o32 = jax.lax.dot_general(
            a8t_s[:, :8], ow_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)             # [8, tile_o]
        y = xo_ref[:].astype(f32) + (o32[:B, :].astype(f32) * sa_s[:B, :1]
                                     * osc_ref[:])
        y_ref[:] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "q_dim", "kv_dim", "head_dim", "rotary_dim", "interleaved", "eps",
    "rms_offset", "scale", "fold_norm", "block_t", "block_o", "interpret"))
def attn_half_decode_w8a8(x: jax.Array, norm_w, qkv_w8: jax.Array,
                          qkv_scale: jax.Array, qkv_bias,
                          o_w8t: jax.Array, o_scale_row: jax.Array,
                          cos_half, sin_half,
                          k_cache: jax.Array, v_cache: jax.Array,
                          pos: jax.Array, *,
                          q_dim: int, kv_dim: int, head_dim: int,
                          rotary_dim: int = 0, interleaved: bool = False,
                          eps: float = 1e-5, rms_offset: float = 0.0,
                          scale: float = 1.0, fold_norm: bool = True,
                          block_t: int = 256, block_o: int = 512,
                          interpret: bool = False):
    """One decode step's attention half for one layer.

    x [B, H]; qkv_w8 [Dqkv, H] int8 + scale [Dqkv, 1]; o_w8t [Dq, H] int8
    (o weight TRANSPOSED at fuse time) + o_scale_row [1, H]; k/v_cache
    [B, T, Hkv, d] holding history < pos (the current token is folded from
    the kernel's own k/v). Returns (y [B, H] incl. residual,
    k_new [B, Hkv, d], v_new [B, Hkv, d]).
    """
    B, H = x.shape
    if B > 8:
        raise ValueError("attn_half_decode_w8a8: B <= 8 (stride-8 row "
                         "layout); larger batches use the composable path")
    Dqkv = q_dim + 2 * kv_dim
    d = head_dim
    Hq, Hkv = q_dim // d, kv_dim // d
    qpk = Hq // Hkv
    T = k_cache.shape[1]

    tile_q = qkv_fusable_tile(q_dim, kv_dim, d)
    NQ = Dqkv // tile_q
    nh = tile_q // d
    n_rope = (q_dim + kv_dim) // tile_q
    Tb = min(block_t, T)
    while T % Tb:
        Tb //= 2
    NT = T // Tb
    to = block_o
    while H % to:
        to //= 2
    NO = H // to
    rows = Hq * 8

    rd = rotary_dim or 0
    R, cmap, smap = rope_tile_operands(tile_q, d, rd, interleaved)
    if rd:
        cos_l, sin_l = expand_rope_tables(cos_half, sin_half, cmap, smap)
    else:
        cos_l = jnp.ones((1, tile_q), jnp.float32)
        sin_l = jnp.zeros((1, tile_q), jnp.float32)

    if norm_w is None:
        norm_w = jnp.ones((H,), jnp.float32)
    b_row = (qkv_bias if qkv_bias is not None
             else jnp.zeros((Dqkv,), jnp.float32)).astype(jnp.float32)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    def qi(t, p):
        return jnp.clip(t, 0, NQ - 1)

    def fb(t, p):
        return jnp.clip(t - NQ, 0, B * NT - 1) // NT

    def ftb(t, p):
        f = jnp.clip(t - NQ, 0, B * NT - 1)
        # clamp to the last live block so dead cache blocks never stream
        return jnp.minimum(f - (f // NT) * NT,
                           jnp.maximum(p[0] - 1, 0) // Tb)

    def oi(t, p):
        return jnp.clip(t - NQ - B * NT, 0, NO - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NQ + B * NT + NO,),
        in_specs=[
            pl.BlockSpec((B, H), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, H), lambda t, p: (qi(t, p), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda t, p: (qi(t, p), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda t, p: (0, qi(t, p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, tile_q), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, Hkv, d), lambda t, p: (fb(t, p), ftb(t, p),
                                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, Hkv, d), lambda t, p: (fb(t, p), ftb(t, p),
                                                        0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_dim, to), lambda t, p: (0, oi(t, p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to), lambda t, p: (0, oi(t, p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, to), lambda t, p: (0, oi(t, p)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, to), lambda t, p: (0, oi(t, p)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, kv_dim), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, kv_dim), lambda t, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.int8),            # x8
            pltpu.VMEM((max(B, 8), 128), jnp.float32),   # sx
            pltpu.VMEM(((Hq + 2 * Hkv) * 8, d), jnp.bfloat16),  # qkv rows
            pltpu.VMEM((rows, d), jnp.float32),      # flash acc
            pltpu.VMEM((rows, 128), jnp.float32),    # m
            pltpu.VMEM((rows, 128), jnp.float32),    # l
            pltpu.VMEM((q_dim, 128), jnp.int8),  # a8 transposed
            pltpu.VMEM((max(B, 8), 128), jnp.float32),   # sa
        ],
    )
    y, kn, vn = pl.pallas_call(
        functools.partial(
            _attn_half_kernel, B=B, d=d, Hq=Hq, Hkv=Hkv, qpk=qpk, NQ=NQ,
            NT=NT, NO=NO, Tb=Tb, nh=nh, n_rope=n_rope, eps=eps,
            rms_offset=rms_offset, scale=scale, fold_norm=fold_norm),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H), x.dtype),
            jax.ShapeDtypeStruct((B, kv_dim), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, kv_dim), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Dqkv * H + 4 * B * Hq * T * d + 2 * B * H * q_dim,
            bytes_accessed=Dqkv * H + q_dim * H + 2 * B * T * Hkv * d * 2,
            transcendentals=B * Hq * T,
        ),
        interpret=interpret,
    )(pos_arr, x, norm_w.reshape(1, H), qkv_w8, qkv_scale,
      b_row.reshape(1, Dqkv), cos_l, sin_l, jnp.asarray(R, jnp.bfloat16),
      k_cache, v_cache, o_w8t, o_scale_row, x)
    return (y, kn.reshape(B, Hkv, d), vn.reshape(B, Hkv, d))


def attn_half_fusable(cfg, lp) -> bool:
    """Static capability gate (the SUPPORTS_* analog for this kernel)."""
    attn = lp.get("attn", {})
    qkv = attn.get("qkv")
    o_t = attn.get("o_t_w8")
    if qkv is None or o_t is None or getattr(qkv, "kind", None) != "w8":
        return False
    if "lora_a" in qkv.arrays or "bias" in getattr(
            lp["attn"]["o"], "arrays", {}):
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
    kvd = (qkv["w8"].shape[0] - cfg.q_dim) // 2
    return qkv_fusable_tile(cfg.q_dim, kvd, cfg.head_dim) is not None


def attn_half_decode_reference(x, norm_w, qkv_w8, qkv_scale, qkv_bias,
                               o_w8t, o_scale_row, cos_half, sin_half,
                               k_cache, v_cache, pos, *, q_dim, kv_dim,
                               head_dim, rotary_dim=0, interleaved=False,
                               eps=1e-5, rms_offset=0.0, scale=1.0,
                               fold_norm=True):
    """Pure-jnp oracle mirroring the kernel's math exactly (both activation
    quantizations, flash == softmax, current-token fold)."""
    from .fused_attention import fused_qkv_rope_reference

    B, H = x.shape
    d = head_dim
    Hq, Hkv = q_dim // d, kv_dim // d
    qkv = fused_qkv_rope_reference(
        x, norm_w if norm_w is not None else jnp.ones((H,), jnp.float32),
        qkv_w8, qkv_scale, qkv_bias, cos_half, sin_half, q_dim, kv_dim,
        head_dim, rotary_dim=rotary_dim, interleaved=interleaved, eps=eps,
        rms_offset=rms_offset, fold_norm=fold_norm).astype(jnp.float32)
    q = qkv[:, :q_dim].reshape(B, Hq, d)
    k_new = qkv[:, q_dim:q_dim + kv_dim].reshape(B, Hkv, d)
    v_new = qkv[:, q_dim + kv_dim:].reshape(B, Hkv, d)

    T = k_cache.shape[1]
    qpk = Hq // Hkv
    kk = jnp.repeat(k_cache.astype(jnp.float32), qpk, axis=2)
    vv = jnp.repeat(v_cache.astype(jnp.float32), qpk, axis=2)
    s = jnp.einsum("bhd,bthd->bht", q, kk) * scale
    s = jnp.where(jnp.arange(T)[None, None, :] < pos, s, -jnp.inf)
    s_cur = jnp.einsum("bhd,bhd->bh", q,
                       jnp.repeat(k_new, qpk, axis=1))[..., None] * scale
    s_all = jnp.concatenate([s, s_cur], axis=2)
    p = jax.nn.softmax(s_all, axis=-1)
    attn = (jnp.einsum("bht,bthd->bhd", p[..., :T], vv)
            + p[..., T:] * jnp.repeat(v_new, qpk, axis=1))

    a = attn.astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(a), axis=(1, 2), keepdims=True) / 127.0,
                     1e-12)
    a8 = jnp.clip(jnp.round(a / sa), -127, 127).reshape(B, q_dim)
    o = (a8 @ o_w8t.astype(jnp.float32)) * sa[:, :, 0] * o_scale_row
    return ((x.astype(jnp.float32) + o).astype(x.dtype),
            k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16))


__all__ = ["attn_half_decode_w8a8", "attn_half_decode_reference",
           "attn_half_fusable"]
