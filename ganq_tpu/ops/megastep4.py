"""Whole-decode-step W4A8 megakernel: uniform 4-bit weights streamed PACKED
(half the HBM bytes of the w8 path) with a pair-nibble trick that needs no
per-element gather or unpack.

Why: the w8 megastep (ops/megastep.py) is DMA-bound — with every phase body
disabled it still takes 5.9 ms at the 3B shape (~520 GB/s effective on
2.82 GB of int8 weights + cache). The only remaining lever is bytes. A
per-element int4->int8 expansion through the VPU is off the table on TPU
(~2-3 ops/element over 2.8G elements is milliseconds of VPU time, the same
wall the round-1 LUT select tree hit), so the 4-bit codes must flow through
the MXU *as stored*. The trick:

  byte[r, k] = ((q_hi ^ 8) << 4) | q_lo            (two output rows r, r+R/2)

  d1 = x8 . byte      (int8 MXU dot; the byte read as SIGNED int8 equals
                       16*(q_hi - 8) + q_lo because XORing the high nibble
                       with 8 makes its signed 4-bit field exactly q_hi - 8)
  d2 = x8 . (byte & 15)                            (one VPU op per element)

  y_hi = sum_g s_hi * (d1 - d2) >> 4               (exactly sum x*(q_hi - 8))
  y_lo = sum_g s_lo * (d2 - 8 * sum_g(x8))         (zero point 8, sym)

so dequantization costs ONE vector AND per weight element plus a second MXU
dot (the MXU is otherwise idle in a bandwidth-bound decode). Per-group
scales ride a static group loop of int8 dots — both nibble matrices are
concatenated into a single [.., 2R] dot per group. This is the TPU-native
analog of the reference's fused W4 dequant GEMMs (gptqmodel_ext/marlin/
marlin_cuda_kernel.cu, exllamav2 q_gemm.cu, qqq_gemm.cu) — but where those
dequantize via CUDA shared-memory LUT/shift networks, here the dequant is
algebra on two MXU partial products.

Same phase walk as ops/megastep.py, with bigger tiles (fewer, fatter grid
steps): qkv row tiles -> rope -> flash GQA -> o -> fused MLP. Applies to
any uniform sym W4 artifact (GPTQ sym, QQQ, AutoRound-sym) with sequential
128-multiple groups.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import rope_tile_operands

_DEF = jax.lax.Precision.DEFAULT


def _quant_rows(x):
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0,
                     1e-12)
    return jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8), sx


def _qkv_tile4(Dqkv: int, d: int) -> int | None:
    """Largest row tile t | Dqkv with t % d == 0 and (t/2) % 128 == 0."""
    for cand in (2560, 2048, 1280, 1024, 512, 256):
        if Dqkv % cand == 0 and cand % d == 0 and (cand // 2) % 128 == 0:
            return cand
    return None


def _rope_rows(Dqkv: int, tile: int, d: int, rotary_dim: int,
               interleaved: bool, n_roped_rows: int,
               cos_half, sin_half):
    """Per-tile per-ROW cos/sin lanes [NT, B, tile] with identity (cos 1,
    sin 0) on rows >= n_roped_rows (the v section), plus the shared
    sign-perm R. cos/sin_half are per-batch-row [B, half] so every slot can
    sit at its own decode position (continuous batching)."""
    R, cmap, smap = rope_tile_operands(tile, d, rotary_dim, interleaved)
    NT = Dqkv // tile
    cos_np = np.where(cmap < 0, 0, cmap)
    sin_np = np.where(smap < 0, 0, smap)
    ch = cos_half.astype(jnp.float32)[:, np.asarray(cos_np)]   # [B, tile]
    sh = sin_half.astype(jnp.float32)[:, np.asarray(sin_np)]
    coss, sins = [], []
    for t in range(NT):
        rows_roped = (np.arange(tile) + t * tile) < n_roped_rows
        cmask = jnp.asarray((cmap >= 0) & rows_roped)[None, :]
        smask = jnp.asarray((smap >= 0) & rows_roped)[None, :]
        coss.append(jnp.where(cmask, ch, 1.0))
        sins.append(jnp.where(smask, sh, 0.0))
    return jnp.asarray(R, jnp.bfloat16), jnp.stack(coss), jnp.stack(sins)


def _pair_group_dot(x8_slice, byte_slice, contract_rhs_rows: bool):
    """One per-group dot producing (d1, d2) int32: rhs = [bytes; bytes&15].

    contract_rhs_rows=False: byte_slice [R2, gs], contract over gs (rows are
    paired outputs). True: byte_slice [gs, N2], contract over gs (columns
    are paired outputs; concat along N)."""
    lo = byte_slice & jnp.int8(15)
    if contract_rhs_rows:
        rhs = jnp.concatenate([byte_slice, lo], axis=1)       # [gs, 2*N2]
        d = jax.lax.dot_general(x8_slice, rhs, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32,
                                precision=_DEF)
        n2 = byte_slice.shape[1]
        return d[:, :n2], d[:, n2:]
    rhs = jnp.concatenate([byte_slice, lo], axis=0)           # [2*R2, gs]
    d = jax.lax.dot_general(x8_slice, rhs, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=_DEF)
    r2 = byte_slice.shape[0]
    return d[:, :r2], d[:, r2:]


def _pair_accum(d1, d2, s_lo, s_hi, S):
    """(y_lo_inc, y_hi_inc) f32 from the two partial dots of one group."""
    f32 = jnp.float32
    dh = jax.lax.shift_right_arithmetic(d1 - d2, 4).astype(f32)
    return s_lo * (d2.astype(f32) - 8.0 * S), s_hi * dh


def _megastep4_kernel(pos_ref, x_ref, anw_ref, mnw_ref,
                      qw_ref, qs_ref, qb_ref, cos_ref, sin_ref, r_ref,
                      kc_ref, vc_ref, ow_ref, os_ref,
                      gw_ref, uw_ref, gus_ref, dw_ref, ds_ref,
                      y_ref, kn_ref, vn_ref,
                      x_s, x8_s, sx_s, qkv_s, acc_s, m_s, l_s, a8_s, ma_s,
                      *, B: int, d: int, Hq: int, Hkv: int, qpk: int,
                      NQ: int, NT: int, NG: int, Tb: int, tq: int, ti: int,
                      gs: int, L: int, eps: float, rms_offset: float,
                      scale: float, act: str):
    lix = pl.program_id(0)
    p = pl.program_id(1)
    pos = pos_ref[B]                 # max over slots (phase/stream gating)
    f32 = jnp.float32
    O_STEP = NQ + NT
    H = x_ref.shape[1]
    Gh = H // gs
    gti = ti // gs

    # ---- layer entry: residual init, attn norm + int8 quant, flash init
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

    # ---- phase A: one qkv row tile (pair-nibble dots) -> rope -> scatter
    @pl.when(p < NQ)
    def _():
        t2 = tq // 2
        y_lo = jnp.zeros((B, t2), f32)
        y_hi = jnp.zeros((B, t2), f32)
        for g in range(Gh):
            xs = x8_s[:, g * gs:(g + 1) * gs]
            S = jnp.sum(xs.astype(f32), axis=1, keepdims=True)
            bg = qw_ref[0, :, g * gs:(g + 1) * gs]            # [t2, gs]
            d1, d2 = _pair_group_dot(xs, bg, False)
            sl = qs_ref[0, g, :t2][None, :].astype(f32)
            sh = qs_ref[0, g, t2:][None, :].astype(f32)
            il, ih = _pair_accum(d1, d2, sl, sh, S)
            y_lo += il
            y_hi += ih
        y = jnp.concatenate([y_lo, y_hi], axis=1) * sx_s[:B, :1]
        y = y + qb_ref[0]
        rot = jax.lax.dot_general(y.astype(jnp.bfloat16), r_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32, precision=_DEF)
        y = (y * cos_ref[0] + rot * sin_ref[0]).astype(jnp.bfloat16)
        for i in range(tq // d):
            qkv_s[pl.ds((p * (tq // d) + i) * 8, 8), :] = jnp.pad(
                y[:, i * d:(i + 1) * d], ((0, 8 - B), (0, 0)))

    @pl.when(p == NQ - 1)
    def _():
        for g in range(Hkv):
            kn_ref[0, :, g * d:(g + 1) * d] = qkv_s[
                (Hq + g) * 8:(Hq + g) * 8 + B, :]
            vn_ref[0, :, g * d:(g + 1) * d] = qkv_s[
                (Hq + Hkv + g) * 8:(Hq + Hkv + g) * 8 + B, :]

    # ---- phase B: flash attention over one cache block
    tb = p - NQ
    in_flash = (p >= NQ) & (p < NQ + NT)

    def _rows(base_s, b, g, n):
        return jnp.concatenate(
            [base_s[(g * qpk + i) * 8 + b:(g * qpk + i) * 8 + b + 1, :]
             for i in range(n)], axis=0)

    def _online(b, g, s_blk, v_blk):
        m_prev = _rows(m_s, b, g, qpk)
        l_prev = _rows(l_s, b, g, qpk)
        a_prev = _rows(acc_s, b, g, qpk)
        smax = jnp.max(s_blk, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, smax)
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s_blk - m_new[:, :1])
        l_new = l_prev * alpha + jnp.sum(pexp, axis=1, keepdims=True)
        pv = jax.lax.dot_general(pexp.astype(jnp.bfloat16), v_blk,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_DEF)
        a_new = a_prev * alpha + pv
        for i in range(qpk):
            r = (g * qpk + i) * 8 + b
            m_s[r:r + 1, :] = m_new[i:i + 1, :]
            l_s[r:r + 1, :] = l_new[i:i + 1, :]
            acc_s[r:r + 1, :] = a_new[i:i + 1, :]

    @pl.when(in_flash & (tb * Tb < pos))
    def _():
        t_abs = tb * Tb + jax.lax.broadcasted_iota(jnp.int32, (1, Tb), 1)
        for b in range(B):
            valid = t_abs < pos_ref[b]        # per-slot history length
            for g in range(Hkv):
                q3 = _rows(qkv_s, b, g, qpk).astype(jnp.bfloat16)
                kg = kc_ref[0, b * Hkv + g, :, :].astype(jnp.bfloat16)
                vg = vc_ref[0, b * Hkv + g, :, :].astype(jnp.bfloat16)
                sc = jax.lax.dot_general(q3, kg, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32,
                                         precision=_DEF)
                sc = jnp.where(valid, sc * scale, -1e30)
                _online(b, g, sc, vg)

    @pl.when(in_flash & (tb == NT - 1))
    def _():
        for b in range(B):
            for g in range(Hkv):
                q3 = _rows(qkv_s, b, g, qpk).astype(jnp.float32)
                kcur = qkv_s[(Hq + g) * 8 + b:(Hq + g) * 8 + b + 1, :]
                vcur = qkv_s[(Hq + Hkv + g) * 8 + b:(Hq + Hkv + g) * 8 + b + 1, :]
                s_c = jnp.sum(q3 * kcur.astype(jnp.float32), axis=1,
                              keepdims=True) * scale
                _online(b, g, s_c, vcur.astype(jnp.bfloat16))

    # ---- phase C: flash finalize -> o (pair dots over q_dim groups) ->
    # residual, then MLP norm + quant
    @pl.when(p == O_STEP)
    def _():
        sa = jnp.zeros((8, 1), f32) + 1e-12
        for h in range(Hq):
            a_h = acc_s[h * 8:(h + 1) * 8, :] / jnp.maximum(
                l_s[h * 8:(h + 1) * 8, :1], 1e-30)
            acc_s[h * 8:(h + 1) * 8, :] = a_h
            sa = jnp.maximum(sa, jnp.max(jnp.abs(a_h), axis=1, keepdims=True))
        sa = sa / 127.0
        for h in range(Hq):
            a8_s[:, h * d:(h + 1) * d] = jnp.clip(
                jnp.round(acc_s[h * 8:(h + 1) * 8, :] / sa),
                -127, 127).astype(jnp.int8)
        Dq = Hq * d
        h2 = H // 2
        y_lo = jnp.zeros((8, h2), f32)
        y_hi = jnp.zeros((8, h2), f32)
        for g in range(Dq // gs):
            xs = a8_s[:, g * gs:(g + 1) * gs]
            S = jnp.sum(xs.astype(f32), axis=1, keepdims=True)
            bg = ow_ref[0, g * gs:(g + 1) * gs, :]            # [gs, H/2]
            d1, d2 = _pair_group_dot(xs, bg, True)
            sl = os_ref[0, g, :h2][None, :].astype(f32)
            sh = os_ref[0, g, h2:][None, :].astype(f32)
            il, ih = _pair_accum(d1, d2, sl, sh, S)
            y_lo += il
            y_hi += ih
        o = jnp.concatenate([y_lo, y_hi], axis=1) * sa
        x_s[:] += o[:B]
        xf = x_s[:]
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * (
            mnw_ref[0].astype(f32) + rms_offset)
        x8, sx = _quant_rows(xf)
        x8_s[:] = x8
        sx_s[:B, :1] = sx
        ma_s[:] = jnp.zeros_like(ma_s)

    # ---- phase D: fused MLP tile (gate/up pair dots -> act -> a8 -> down)
    @pl.when(p > O_STEP)
    def _():
        t2 = ti // 2
        g_lo = jnp.zeros((B, t2), f32)
        g_hi = jnp.zeros((B, t2), f32)
        u_lo = jnp.zeros((B, t2), f32)
        u_hi = jnp.zeros((B, t2), f32)
        for g in range(Gh):
            xs = x8_s[:, g * gs:(g + 1) * gs]
            S = jnp.sum(xs.astype(f32), axis=1, keepdims=True)
            gbg = gw_ref[0, :, g * gs:(g + 1) * gs]           # [t2, gs]
            ubg = uw_ref[0, :, g * gs:(g + 1) * gs]
            glo = gbg & jnp.int8(15)
            ulo = ubg & jnp.int8(15)
            rhs = jnp.concatenate([gbg, glo, ubg, ulo], axis=0)
            dd = jax.lax.dot_general(xs, rhs, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32,
                                     precision=_DEF)          # [B, 4*t2]
            sgl = gus_ref[0, g, :t2][None, :].astype(f32)
            sgh = gus_ref[0, g, t2:ti][None, :].astype(f32)
            sul = gus_ref[0, g, ti:ti + t2][None, :].astype(f32)
            suh = gus_ref[0, g, ti + t2:][None, :].astype(f32)
            il, ih = _pair_accum(dd[:, :t2], dd[:, t2:ti], sgl, sgh, S)
            g_lo += il
            g_hi += ih
            il, ih = _pair_accum(dd[:, ti:ti + t2], dd[:, ti + t2:],
                                 sul, suh, S)
            u_lo += il
            u_hi += ih
        gv = jnp.concatenate([g_lo, g_hi], axis=1) * sx_s[:B, :1]
        uv = jnp.concatenate([u_lo, u_hi], axis=1) * sx_s[:B, :1]
        if act == "silu":
            a = jax.nn.silu(gv) * uv
        elif act == "gelu_tanh":
            a = jax.nn.gelu(gv, approximate=True) * uv
        else:
            a = jax.nn.gelu(gv, approximate=False) * uv
        a8, sa = _quant_rows(a)
        a8_s[:B, :ti] = a8
        h2 = H // 2
        y_lo = jnp.zeros((B, h2), f32)
        y_hi = jnp.zeros((B, h2), f32)
        for g2 in range(gti):
            xs = a8_s[:B, g2 * gs:(g2 + 1) * gs]
            S = jnp.sum(xs.astype(f32), axis=1, keepdims=True)
            bg = dw_ref[0, g2 * gs:(g2 + 1) * gs, :]          # [gs, H/2]
            d1, d2 = _pair_group_dot(xs, bg, True)
            sl = ds_ref[0, g2, :h2][None, :].astype(f32)
            sh = ds_ref[0, g2, h2:][None, :].astype(f32)
            il, ih = _pair_accum(d1, d2, sl, sh, S)
            y_lo += il
            y_hi += ih
        ma_s[:] += jnp.concatenate([y_lo, y_hi], axis=1) * sa

    @pl.when(p == O_STEP + NG)
    def _():
        x_s[:] += ma_s[:]

        @pl.when(lix == L - 1)
        def _():
            y_ref[:] = x_s[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "q_dim", "kv_dim", "head_dim", "rotary_dim", "interleaved", "eps",
    "rms_offset", "scale", "act", "block_t", "block_i", "interpret"))
def megastep4_decode(x: jax.Array, mp: Dict[str, jax.Array],
                     k_cache: jax.Array, v_cache: jax.Array,
                     pos: jax.Array, cos_half, sin_half, *,
                     q_dim: int, kv_dim: int, head_dim: int,
                     rotary_dim: int = 0, interleaved: bool = False,
                     eps: float = 1e-5, rms_offset: float = 0.0,
                     scale: float = 1.0, act: str = "silu",
                     block_t: int = 128, block_i: int = 2048,
                     interpret: bool = False):
    """One full W4A8 decode step over all layers. Same contract as
    ``megastep_decode_w8a8``; ``mp`` from :func:`megapack4`.

    ``pos`` may be a scalar (all rows share one position — the greedy /
    sampled generate paths) or a [B] vector of per-slot positions with
    matching per-row rope tables ``cos/sin_half [B, half]`` (the
    continuous-batching engine)."""
    B, H = x.shape
    if B > 8:
        raise ValueError("megastep4_decode: B <= 8 (stride-8 rows)")
    L = mp["qkv_p4"].shape[0]
    Dqkv = mp["qkv_p4"].shape[1] * 2
    d = head_dim
    Hq, Hkv = q_dim // d, kv_dim // d
    qpk = Hq // Hkv
    T = k_cache.shape[2]
    I = mp["gu_p4"].shape[1]
    gs = H // mp["qkv_s"].shape[1]               # static (from shapes)

    tq = _qkv_tile4(Dqkv, d)
    NQ = Dqkv // tq
    Tb = min(block_t, T)
    while T % Tb:
        Tb //= 2
    NT = T // Tb
    ti = _mlp_tile4(I)                           # must match megapack4
    NG = I // ti
    gtp8 = mp["dn_s"].shape[1] // NG             # padded rows per tile
    P = NQ + NT + 1 + NG

    pos_vec = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    pos_arr = jnp.concatenate([pos_vec, jnp.max(pos_vec)[None]])  # [B+1]

    rd = rotary_dim or 0
    if rd:
        ch = jnp.asarray(cos_half, jnp.float32)
        sh = jnp.asarray(sin_half, jnp.float32)
        if ch.ndim == 1:
            ch = jnp.broadcast_to(ch[None, :], (B, ch.shape[0]))
            sh = jnp.broadcast_to(sh[None, :], (B, sh.shape[0]))
        R, cos_t, sin_t = _rope_rows(Dqkv, tq, d, rd, interleaved,
                                     q_dim + kv_dim, ch, sh)
    else:
        R = jnp.zeros((tq, tq), jnp.bfloat16)
        cos_t = jnp.ones((NQ, B, tq), jnp.float32)
        sin_t = jnp.zeros((NQ, B, tq), jnp.float32)
    Gp = mp["qkv_s"].shape[1]
    Gq = mp["o_s"].shape[1]
    gti = ti // gs

    def qi(l, p, s):
        return jnp.clip(p, 0, NQ - 1)

    def fb(l, p, s):
        t = jnp.clip(p - NQ, 0, NT - 1)
        return jnp.minimum(t, jnp.maximum(s[B] - 1, 0) // Tb)

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
            # qkv packed [L, Dqkv/2, H]: tile t rows [t*tq/2, (t+1)*tq/2)
            pl.BlockSpec((1, tq // 2, H), lambda l, p, s: (l, qi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp, tq), lambda l, p, s: (l, 0, qi(l, p, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq), lambda l, p, s: (l, 0, qi(l, p, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, tq), lambda l, p, s: (qi(l, p, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, tq), lambda l, p, s: (qi(l, p, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, tq), lambda l, p, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B * Hkv, Tb, d),
                         lambda l, p, s: (l, 0, fb(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B * Hkv, Tb, d),
                         lambda l, p, s: (l, 0, fb(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_dim, H // 2), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            # o scales: the o projection contracts q_dim (its own group
            # count Gq = q_dim/gs, not the H-contraction's Gp)
            pl.BlockSpec((1, Gq, H), lambda l, p, s: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            # gate packed rows [0, I/2), up rows [I/2, I) of gu_p4 [L, I, H]
            pl.BlockSpec((1, ti // 2, H), lambda l, p, s: (l, gi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti // 2, H),
                         lambda l, p, s: (l, gi(l, p, s) + NG, 0),
                         memory_space=pltpu.VMEM),
            # gate+up scales [L, Gp, 2I]: tile cols [gi*2ti, (gi+1)*2ti)
            # laid out tile-major (gate tile then up tile, see megapack4)
            pl.BlockSpec((1, Gp, 2 * ti), lambda l, p, s: (l, 0, gi(l, p, s)),
                         memory_space=pltpu.VMEM),
            # down packed [L, I, H/2]: tile rows [gi*ti, (gi+1)*ti)
            pl.BlockSpec((1, ti, H // 2), lambda l, p, s: (l, gi(l, p, s), 0),
                         memory_space=pltpu.VMEM),
            # down scales, tile-major padded rows [L, NG*gtp, H]
            pl.BlockSpec((1, gtp8, H), lambda l, p, s: (l, gi(l, p, s), 0),
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
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.int8),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM(((Hq + 2 * Hkv) * 8, d), jnp.bfloat16),
            pltpu.VMEM((Hq * 8, d), jnp.float32),
            pltpu.VMEM((Hq * 8, 128), jnp.float32),
            pltpu.VMEM((Hq * 8, 128), jnp.float32),
            pltpu.VMEM((8, max(q_dim, ti)), jnp.int8),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    weight_bytes = L * (Dqkv * H + q_dim * H + 3 * I * H) // 2
    y, kn, vn = pl.pallas_call(
        functools.partial(
            _megastep4_kernel, B=B, d=d, Hq=Hq, Hkv=Hkv, qpk=qpk, NQ=NQ,
            NT=NT, NG=NG, Tb=Tb, tq=tq, ti=ti, gs=gs, L=L, eps=eps,
            rms_offset=rms_offset, scale=scale, act=act),
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
            flops=4 * B * weight_bytes * 2 + 4 * B * L * Hq * T * d,
            bytes_accessed=weight_bytes + 2 * L * B * T * Hkv * d * 2,
            transcendentals=B * L * (Hq * T + I),
        ),
        interpret=interpret,
    )(pos_arr, x, mp["attn_norm"], mp["mlp_norm"],
      mp["qkv_p4"], mp["qkv_s"], mp["qkv_bias"],
      cos_t, sin_t, R,
      k_cache, v_cache, mp["o_p4"], mp["o_s"],
      mp["gu_p4"], mp["gu_p4"], mp["gu_s"], mp["dn_p4"], mp["dn_s"])
    return y, kn, vn


# --------------------------------------------------------------- pack + gate
def _pair_rows(codes, tile: int):
    """[R, K] int codes -> [R/2, K] bytes pairing rows (r, r+tile/2) within
    each row tile; hi nibble stored XOR 8 (signed field = q_hi - 8).
    Pure jnp, so packing traces under jit (numpy fallback for tests)."""
    if isinstance(codes, np.ndarray):
        xp = np
    else:
        xp = jnp
    R, K = codes.shape
    t2 = tile // 2
    c = codes.reshape(R // tile, 2, t2, K)
    lo = c[:, 0].reshape(R // 2, K)
    hi = c[:, 1].reshape(R // 2, K)
    byte = (((hi ^ 8) << 4) | lo).astype(xp.int32)
    return ((byte + 128) % 256 - 128).astype(xp.int8)


def _pair_cols(codes_t):
    """[K, N] codes -> [K, N/2] bytes pairing columns (c, c+N/2)."""
    xp = np if isinstance(codes_t, np.ndarray) else jnp
    K, N = codes_t.shape
    lo = codes_t[:, :N // 2]
    hi = codes_t[:, N // 2:]
    byte = (((hi ^ 8) << 4) | lo).astype(xp.int32)
    return ((byte + 128) % 256 - 128).astype(xp.int8)


def _mlp_tile4(I: int) -> int:
    ti = 2048
    while I % ti or (ti // 2) % 128:
        ti //= 2
    return ti


def megapack4(cfg, sp: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Pair-packed megakernel operands from stacked UNIFORM W4 layers.

    Pure jnp (traces under jit), but packing 4-bit codes for a 3B model is
    a non-trivial one-time transform — serving paths should call
    :func:`ganq_tpu.serve.stacked.prepack` once and reuse the result."""
    ls = sp["layers_stacked"]
    qkv, o = ls["attn"]["qkv"], ls["attn"]["o"]
    gu, dn = ls["mlp"]["gateup"], ls["mlp"]["down"]
    H = cfg.hidden_size
    d = cfg.head_dim
    L = qkv["qweight"].shape[0]

    from .packing import unpack_int_rows

    Dq_all = qkv["scales"].shape[1]
    I = gu["scales"].shape[1] // 2
    tq = _qkv_tile4(Dq_all, d)
    ti = _mlp_tile4(I)

    # per-layer sequential packing (lax.map): the int32 unpack temporaries
    # exist for ONE layer at a time (a whole-model unpack is ~15 GB of
    # int32 at the 8B shape — OOM)
    def map_rows(m, tile, lo=None, hi=None):
        def one(qw_l):
            codes = unpack_int_rows(qw_l, 4, m.in_features)
            if lo is not None:
                codes = codes[lo:hi]
            return _pair_rows(codes, tile)
        return jax.lax.map(one, m["qweight"])

    def map_cols(m):
        def one(qw_l):
            codes = unpack_int_rows(qw_l, 4, m.in_features)
            return _pair_cols(codes.T)
        return jax.lax.map(one, m["qweight"])

    qkv_p4 = map_rows(qkv, tq)
    o_p4 = map_cols(o)
    gate_p = map_rows(gu, ti, 0, I)
    up_p = map_rows(gu, ti, I, 2 * I)
    dn_p4 = map_cols(dn)

    # scales stored bf16: halves their HBM stream (~0.18 GB/step at 3B);
    # the ~2^-9 relative rounding is far below the int4 quantization step
    qsc = jnp.swapaxes(qkv["scales"].astype(jnp.bfloat16), 1, 2)  # [L,G,Dq]
    osc = jnp.swapaxes(o["scales"].astype(jnp.bfloat16), 1, 2)    # [L,Gq,H]
    gsc = jnp.swapaxes(gu["scales"].astype(jnp.bfloat16), 1, 2)   # [L,G,2I]
    dsc = jnp.swapaxes(dn["scales"].astype(jnp.bfloat16), 1, 2)   # [L,Gi,H]
    # down scales tile-major with rows padded to a sublane multiple: the
    # per-tile block is [1, gtp, H], and gti = ti/gs can be < 8
    gs_w = dn.in_features // dn["scales"].shape[2]
    gti = ti // gs_w
    gtp = -(-gti // 8) * 8
    NGt = I // ti
    dsc = dsc.reshape(dsc.shape[0], NGt, gti, H)
    if gtp != gti:
        dsc = jnp.pad(dsc, ((0, 0), (0, 0), (0, gtp - gti), (0, 0)))
    dsc = dsc.reshape(dsc.shape[0], NGt * gtp, H)
    # gate+up scales tile-major: for each tile gi, gate tile cols then up
    # tile cols (matches the kernel's [1, G, 2ti] block)
    sg, su = gsc[:, :, :I], gsc[:, :, I:]
    blocks = []
    for t in range(I // ti):
        blocks.append(sg[:, :, t * ti:(t + 1) * ti])
        blocks.append(su[:, :, t * ti:(t + 1) * ti])
    gu_s = jnp.concatenate(blocks, axis=2)

    bias = qkv.arrays.get("bias")
    if bias is None:
        bias = jnp.zeros((L, Dq_all), jnp.float32)
    return {
        "qkv_p4": qkv_p4, "qkv_s": qsc,
        "o_p4": o_p4, "o_s": osc,
        "gu_p4": jnp.concatenate([gate_p, up_p], axis=1), "gu_s": gu_s,
        "dn_p4": dn_p4, "dn_s": dsc,
        "qkv_bias": jnp.asarray(bias, jnp.float32).reshape(L, 1, Dq_all),
        "attn_norm": ls["input_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H),
        "mlp_norm": ls["post_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H),
    }


def megastep4_fusable(cfg, sp: Dict[str, Any]) -> bool:
    """Static capability gate: homogeneous stacked llama-family models with
    uniform sym W4 weights, sequential 128-multiple groups, d=128."""
    ls = sp.get("layers_stacked")
    if ls is None:
        return False
    attn, mlp = ls.get("attn", {}), ls.get("mlp", {})
    qkv, o = attn.get("qkv"), attn.get("o")
    gu, dn = mlp.get("gateup"), mlp.get("down")
    if qkv is None or o is None or gu is None or dn is None:
        return False
    mats = (qkv, o, gu, dn)
    if any(getattr(m, "kind", None) != "uniform" or m.bits != 4
           for m in mats):
        return False
    if any("g_idx" in m.arrays or "lora_a" in m.arrays for m in mats):
        return False
    if any("bias" in m.arrays for m in (o, gu, dn)):
        return False
    # sym (zero point 8) everywhere: STRUCTURAL — symmetric uniform
    # artifacts omit the zeros array (ops/qlinear.uniform_linear), which
    # keeps this gate decidable on traced params under jit. All four
    # projections must share ONE 128-multiple group size (the kernel
    # slices activations and scale rows with a single gs).
    gss = set()
    for m in mats:
        if "zeros" in m.arrays:
            return False
        gs = m.in_features // m.arrays["scales"].shape[2]
        if gs % 128 or m.in_features % gs:
            return False
        gss.add(gs)
    if len(gss) != 1:
        return False
    if cfg.head_dim != 128 or cfg.v_head_dim not in (None, cfg.head_dim):
        return False
    if cfg.hidden_size % 256 or cfg.qk_norm or cfg.clip_qkv is not None:
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
    Dqkv = qkv["scales"].shape[1]                # stacked [L, R, G]
    kvd = (Dqkv - cfg.q_dim) // 2
    if cfg.q_dim + 2 * kvd != Dqkv or kvd % cfg.head_dim:
        return False
    return _qkv_tile4(Dqkv, cfg.head_dim) is not None


# ------------------------------------------------------------------- oracle
def megastep4_reference(x, lw_list, k_cache, v_cache, pos, cos_half,
                        sin_half, *, q_dim, kv_dim, head_dim, rotary_dim=0,
                        interleaved=False, eps=1e-5, rms_offset=0.0,
                        scale=1.0, act="silu", block_i=2048, softcap=0.0):
    """Pure-jnp oracle on the dequantized f32 weights: the kernel's integer
    pair algebra is EXACT, so its math equals ``x8_f32 @ W_deq.T * sx`` with
    the same activation quantizations (per-row qkv/gate/up, whole-tensor o,
    per-tile MLP) and flash == softmax.

    ``lw_list``: per-layer dicts with keys attn_norm, mlp_norm [H];
    qkv_w [Dqkv, H]; qkv_bias [Dqkv]; o_w [H, q_dim]; gate_w/up_w [I, H];
    down_w [H, I] — all dequantized f32. Optional EoRA adapters (applied
    in full precision on the pre-quantization activations, exactly like
    the kernels): qkv_la [rq, H] / qkv_lb [Dqkv, rq]; o_la [ro, q_dim] /
    o_lb [H, ro]; gu_la [rg, H] / gu_lb [2I, rg] (fused gate;up rows);
    down_la [rd, I] / down_lb [H, rd].

    Arch extras ride per-layer lw keys: q_norm/k_norm [d] (qk-norm),
    post_attn_norm/post_mlp_norm [H] (gemma sandwich), window (int sliding
    window), cos_half/sin_half (per-layer rope override — gemma3 dual
    rope); ``softcap`` (gemma2) applies cap*tanh(s/cap) on scaled scores."""
    f32 = jnp.float32
    B, H = x.shape
    d = head_dim
    Hq, Hkv = q_dim // d, kv_dim // d
    qpk = Hq // Hkv
    T = k_cache.shape[2]

    def rope_rows(y, n_roped, ch, sh):
        if not rotary_dim:
            return y
        half = rotary_dim // 2
        nh = n_roped // d
        yr = y[:, :n_roped].reshape(B, nh, d)
        r, rest = yr[..., :rotary_dim], yr[..., rotary_dim:]
        if interleaved:
            even, odd = r[..., 0::2], r[..., 1::2]
            c, sn = ch[None, None, :half], sh[None, None, :half]
            re = even * c - odd * sn
            ro = odd * c + even * sn
            r2 = jnp.stack([re, ro], axis=-1).reshape(B, nh, rotary_dim)
        else:
            lo_h, hi_h = r[..., :half], r[..., half:]
            c, sn = ch[None, None, :], sh[None, None, :]
            r2 = jnp.concatenate([lo_h * c - hi_h * sn,
                                  hi_h * c + lo_h * sn], axis=-1)
        roped = jnp.concatenate([r2, rest], axis=-1).reshape(B, n_roped)
        return jnp.concatenate([roped, y[:, n_roped:]], axis=1)

    def _sc(s):
        return softcap * jnp.tanh(s / softcap) if softcap else s

    xs = x
    kns, vns = [], []
    for lw in lw_list:
        xf = xs.astype(f32)
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        h = xf * jax.lax.rsqrt(var + eps) * (
            lw["attn_norm"].astype(f32) + rms_offset)
        x8, sx = _quant_rows(h)
        y = (x8.astype(f32) @ lw["qkv_w"].T) * sx + lw["qkv_bias"][None, :]
        if lw.get("qkv_la") is not None:
            y = y + (h @ lw["qkv_la"].T) @ lw["qkv_lb"].T
        if lw.get("q_norm") is not None:
            # per-head RMS over head_dim pre-rope (qwen3; gemma3's (1+w)
            # via rms_offset) — mirrors transformer._rms_vec semantics
            def _hn(t, w):
                tb = t.reshape(B, -1, d)
                ms = jnp.mean(tb * tb, axis=-1, keepdims=True)
                tb = tb * jax.lax.rsqrt(ms + eps) * (
                    w.astype(f32)[None, None, :] + rms_offset)
                return tb.reshape(B, -1)

            y = jnp.concatenate(
                [_hn(y[:, :q_dim], lw["q_norm"]),
                 _hn(y[:, q_dim:q_dim + kv_dim], lw["k_norm"]),
                 y[:, q_dim + kv_dim:]], axis=1)
        y = rope_rows(y, q_dim + kv_dim,
                      jnp.asarray(lw.get("cos_half", cos_half), f32),
                      jnp.asarray(lw.get("sin_half", sin_half), f32))
        q = y[:, :q_dim].reshape(B, Hq, d)
        k_new = y[:, q_dim:q_dim + kv_dim].reshape(B, Hkv, d)
        v_new = y[:, q_dim + kv_dim:].reshape(B, Hkv, d)
        kc = k_cache[len(kns)].reshape(B, Hkv, T, d)
        vc = v_cache[len(kns)].reshape(B, Hkv, T, d)
        kk = jnp.repeat(kc.astype(f32), qpk, axis=1)          # [B, Hq, T, d]
        vv = jnp.repeat(vc.astype(f32), qpk, axis=1)
        s = _sc(jnp.einsum("bhd,bhtd->bht", q, kk) * scale)
        t_arange = jnp.arange(T)[None, None, :]
        in_hist = t_arange < pos
        if lw.get("window") is not None:
            in_hist = in_hist & (t_arange > pos - lw["window"])
        s = jnp.where(in_hist, s, -jnp.inf)
        s_cur = _sc(jnp.einsum("bhd,bhd->bh", q, jnp.repeat(
            k_new, qpk, axis=1))[..., None] * scale)
        pr = jax.nn.softmax(jnp.concatenate([s, s_cur], axis=2), axis=-1)
        attn = (jnp.einsum("bht,bhtd->bhd", pr[..., :T], vv)
                + pr[..., T:] * jnp.repeat(v_new, qpk, axis=1))
        sa = jnp.maximum(
            jnp.max(jnp.abs(attn), axis=(1, 2), keepdims=True) / 127.0,
            1e-12)
        a8 = jnp.clip(jnp.round(attn / sa), -127, 127).reshape(B, q_dim)
        o = (a8 @ lw["o_w"].T) * sa[:, :, 0]
        if lw.get("o_la") is not None:
            o = o + (attn.reshape(B, q_dim) @ lw["o_la"].T) @ lw["o_lb"].T
        if lw.get("o_bias") is not None:
            o = o + lw["o_bias"][None, :]
        if lw.get("post_attn_norm") is not None:   # gemma sandwich
            ov = jnp.mean(o * o, axis=1, keepdims=True)
            o = o * jax.lax.rsqrt(ov + eps) * (
                lw["post_attn_norm"].astype(f32) + rms_offset)
        y1 = xf + o
        kns.append(k_new.reshape(B, kv_dim).astype(jnp.bfloat16))
        vns.append(v_new.reshape(B, kv_dim).astype(jnp.bfloat16))

        var = jnp.mean(y1 * y1, axis=1, keepdims=True)
        h2 = y1 * jax.lax.rsqrt(var + eps) * (
            lw["mlp_norm"].astype(f32) + rms_offset)
        x8m, sxm = _quant_rows(h2)
        I = lw["gate_w"].shape[0]
        ti = block_i
        while I % ti or (ti // 2) % 128:
            ti //= 2
        out = jnp.zeros((B, H), f32)
        xg = (h2 @ lw["gu_la"].T if lw.get("gu_la") is not None else None)
        xa_dn = 0.0
        for t0 in range(0, I, ti):
            g = (x8m.astype(f32) @ lw["gate_w"][t0:t0 + ti].T) * sxm
            u = (x8m.astype(f32) @ lw["up_w"][t0:t0 + ti].T) * sxm
            if xg is not None:
                g = g + xg @ lw["gu_lb"][t0:t0 + ti].T
                u = u + xg @ lw["gu_lb"][I + t0:I + t0 + ti].T
            if lw.get("gate_bias") is not None:
                g = g + lw["gate_bias"][t0:t0 + ti][None, :]
            if lw.get("up_bias") is not None:
                u = u + lw["up_bias"][t0:t0 + ti][None, :]
            if act == "silu":
                a = jax.nn.silu(g) * u
            elif act == "gelu_tanh":
                a = jax.nn.gelu(g, approximate=True) * u
            else:
                a = jax.nn.gelu(g, approximate=False) * u
            a8m, sam = _quant_rows(a)
            out = out + (a8m.astype(f32) @ lw["down_w"][:, t0:t0 + ti].T) * sam
            if lw.get("down_la") is not None:
                xa_dn = xa_dn + a @ lw["down_la"][:, t0:t0 + ti].T
        if lw.get("down_la") is not None:
            out = out + xa_dn @ lw["down_lb"].T
        if lw.get("down_bias") is not None:
            out = out + lw["down_bias"][None, :]
        if lw.get("post_mlp_norm") is not None:    # gemma sandwich
            ov = jnp.mean(out * out, axis=1, keepdims=True)
            out = out * jax.lax.rsqrt(ov + eps) * (
                lw["post_mlp_norm"].astype(f32) + rms_offset)
        xs = (y1 + out).astype(x.dtype)
    return xs, jnp.stack(kns), jnp.stack(vns)


__all__ = ["megastep4_decode", "megapack4", "megastep4_fusable",
           "megastep4_reference"]
