"""Fused attention-half decode kernels (W8A8 serving path).

PERF.md: after the fused-MLP megakernel, the attention half of a decoder
layer is ~20 small XLA ops per decode step (norm, qkv matmul, rope, masked
attention, projections) and per-op fixed overhead dominates decode time in
this environment. Two kernels collapse it:

1. ``fused_qkv_rope_w8a8`` — rmsnorm + dynamic-int8 activation quant + the
   fused qkv matmul (int8 x int8 on the MXU, output-side scaling) + bias +
   rope, in ONE ``pallas_call`` whose grid streams row tiles of the qkv
   weight. Rope is applied WITHOUT any head reshape: for a row tile that is
   a whole number of heads, ``roped = y * cos_tile + (y @ R_tile) * sin_tile``
   where ``R_tile`` is the block-diagonal rotate-half (or interleaved-pair)
   sign permutation — a permutation-signed matrix, so the dot is exact in
   bf16 and partial-rotary/no-rope lanes are just identity rows with
   cos=1, sin=0. (TPU-native replacement for the reference's per-kernel
   dequant + HF rope, ``gptqmodel/nn_modules/qlinear/*`` + modeling code.)

2. ``flash_decode_attention`` — single-token GQA attention against the full
   KV cache in ONE kernel: grid (B, T blocks), online-softmax (flash)
   accumulation in VMEM scratch, per-kv-group dots (q block [qpk, d] x
   K block [Tb, d]), causal position mask from an SMEM scalar. Replaces the
   masked full-cache XLA attention (~8 ops) and never materializes
   [B, Hq, T] scores in HBM.

Both kernels pin dot precision explicitly (DEFAULT for int8/bf16 operands:
a global ``jax_default_matmul_precision=highest`` makes Mosaic reject
integer dots otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------------ rope prep
def rope_tile_operands(tile: int, head_dim: int, rotary_dim: int,
                       interleaved: bool):
    """Static operands for in-kernel rope on a [B, tile] row tile holding
    ``tile // head_dim`` whole heads.

    Returns ``R [tile, tile]`` (block-diagonal rotate-half / interleaved-pair
    sign permutation; zero rows outside the rotary span) and lane index maps
    (cos_map, sin_map [tile]) selecting which rope-table entry each lane
    multiplies (-1 = identity lane: cos=1, sin=0)."""
    nh = tile // head_dim
    R = np.zeros((tile, tile), np.float32)
    cos_map = np.full((tile,), -1, np.int64)
    sin_map = np.full((tile,), -1, np.int64)
    half = rotary_dim // 2
    for h in range(nh):
        base = h * head_dim
        for j in range(rotary_dim):
            if interleaved:
                pair = j // 2
                # x'[2p] = x[2p] c_p - x[2p+1] s_p ; x'[2p+1] = x[2p+1] c_p + x[2p] s_p
                partner = base + (j + 1 if j % 2 == 0 else j - 1)
                sign = -1.0 if j % 2 == 0 else 1.0
                cos_map[base + j] = pair
                sin_map[base + j] = pair
                R[partner, base + j] = sign
            else:
                # rotate-half: x'[j] = x[j] c_j - x[j+half] s_j (j < half)
                #              x'[j] = x[j] c_{j-half} + x[j-half] s_{j-half}
                if j < half:
                    cos_map[base + j] = j
                    sin_map[base + j] = j
                    R[base + j + half, base + j] = -1.0
                else:
                    cos_map[base + j] = j - half
                    sin_map[base + j] = j - half
                    R[base + j - half, base + j] = 1.0
    return R, cos_map, sin_map


def expand_rope_tables(cos_half: jax.Array, sin_half: jax.Array,
                       cos_map: np.ndarray, sin_map: np.ndarray):
    """Per-lane cos/sin rows [1, tile] from half-dim tables [half] using the
    static lane maps (identity lanes -> cos 1 / sin 0)."""
    cm = jnp.asarray(np.where(cos_map < 0, 0, cos_map))
    sm = jnp.asarray(np.where(sin_map < 0, 0, sin_map))
    cos_l = jnp.where(jnp.asarray(cos_map < 0), 1.0,
                      cos_half.astype(jnp.float32)[cm])
    sin_l = jnp.where(jnp.asarray(sin_map < 0), 0.0,
                      sin_half.astype(jnp.float32)[sm])
    return cos_l[None, :], sin_l[None, :]


def qkv_fusable_tile(q_dim: int, kv_dim: int, head_dim: int):
    """Largest lane-aligned (128-multiple) head-aligned row tile dividing
    both the q and kv sections, or None (Mosaic requires the last block dim
    be a 128-multiple or the full array extent)."""
    for cand in (512, 256, 1024, 128, 2048):
        if (q_dim % cand == 0 and kv_dim % cand == 0
                and cand % head_dim == 0):
            return cand
    return None


# ----------------------------------------------------- kernel 1: norm+qkv+rope
def _qkv_kernel(x_ref, nw_ref, w_ref, ws_ref, b_ref, cos_ref, sin_ref,
                r_ref, o_ref, *, n_rope_tiles: int, eps: float,
                rms_offset: float, fold_norm: bool):
    t = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)                        # [B, H]
    if fold_norm:
        var = jnp.mean(x * x, axis=1, keepdims=True)
        x = x * jax.lax.rsqrt(var + eps) * (
            nw_ref[:].astype(jnp.float32) + rms_offset)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0,
                     1e-12)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(x8, w_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=jax.lax.Precision.DEFAULT)
    y = y.astype(jnp.float32) * sx * ws_ref[:][:, 0][None, :]   # [B, tile]
    y = y + b_ref[:]
    # rope via the block-diagonal sign permutation: exact (each output lane
    # is +-one input lane), so bf16 operands at DEFAULT precision are safe
    rot = jax.lax.dot_general(y.astype(jnp.bfloat16), r_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
    roped = y * cos_ref[:] + rot * sin_ref[:]
    is_rope = t < n_rope_tiles
    o_ref[:] = jnp.where(is_rope, roped, y).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "q_dim", "kv_dim", "head_dim", "rotary_dim", "interleaved", "eps",
    "rms_offset", "fold_norm"))
def fused_qkv_rope_w8a8(x: jax.Array, norm_w, qkv_w8: jax.Array,
                        qkv_scale: jax.Array, bias, cos_half, sin_half,
                        q_dim: int, kv_dim: int, head_dim: int,
                        rotary_dim: int = 0, interleaved: bool = False,
                        eps: float = 1e-5, rms_offset: float = 0.0,
                        fold_norm: bool = True) -> jax.Array:
    """x [B, H] -> qkv [B, q_dim + 2*kv_dim] bf16, rope applied to the q and
    k sections. ``cos_half/sin_half``: rope tables [rotary_dim // 2] at the
    decode position (pass zeros-len arrays when rotary_dim == 0)."""
    B, H = x.shape
    Dqkv, Hp = qkv_w8.shape
    assert Dqkv == q_dim + 2 * kv_dim
    tile = qkv_fusable_tile(q_dim, kv_dim, head_dim)
    if tile is None:
        raise ValueError(f"no 128-aligned head tile for q_dim={q_dim} "
                         f"kv_dim={kv_dim} head_dim={head_dim}")
    n_t = Dqkv // tile
    n_rope = (q_dim + kv_dim) // tile

    rd = rotary_dim or 0
    R, cmap, smap = rope_tile_operands(tile, head_dim, rd, interleaved)
    if rd:
        cos_l, sin_l = expand_rope_tables(cos_half, sin_half, cmap, smap)
    else:
        cos_l = jnp.ones((1, tile), jnp.float32)
        sin_l = jnp.zeros((1, tile), jnp.float32)
    Rb = jnp.asarray(R, jnp.bfloat16)

    if norm_w is None:
        norm_w = jnp.ones((H,), jnp.float32)
    b_row = (bias if bias is not None
             else jnp.zeros((Dqkv,), jnp.float32)).astype(jnp.float32)
    x2 = jnp.pad(x, ((0, 0), (0, Hp - H))) if Hp != H else x

    return pl.pallas_call(
        functools.partial(_qkv_kernel, n_rope_tiles=n_rope, eps=eps,
                          rms_offset=rms_offset, fold_norm=fold_norm),
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((B, Hp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, Hp), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Dqkv), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Dqkv * (H + tile),
            bytes_accessed=Dqkv * Hp + B * H * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, norm_w.reshape(1, H), qkv_w8, qkv_scale,
      b_row.reshape(1, Dqkv), cos_l, sin_l, Rb)


def fused_qkv_rope_reference(x, norm_w, qkv_w8, qkv_scale, bias, cos_half,
                             sin_half, q_dim, kv_dim, head_dim,
                             rotary_dim=0, interleaved=False, eps=1e-5,
                             rms_offset=0.0, fold_norm=True):
    """Pure-jnp oracle mirroring the kernel's math (incl. the in-kernel
    dynamic int8 activation quantization)."""
    xf = x.astype(jnp.float32)
    if fold_norm:
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * (
            norm_w.astype(jnp.float32) + rms_offset)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0,
                     1e-12)
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127)
    H = x.shape[1]
    y = (x8 @ qkv_w8[:, :H].astype(jnp.float32).T) * sx * qkv_scale[:, 0]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if rotary_dim:
        B = x.shape[0]
        Dq, Dkv = q_dim, kv_dim

        def rope_sec(sec, nh):
            s3 = sec.reshape(B, nh, head_dim)
            rot, keep = s3[..., :rotary_dim], s3[..., rotary_dim:]
            cos = jnp.concatenate([cos_half, cos_half]).astype(jnp.float32)
            sin = jnp.concatenate([sin_half, sin_half]).astype(jnp.float32)
            if interleaved:
                cos = jnp.repeat(cos_half.astype(jnp.float32), 2)
                sin = jnp.repeat(sin_half.astype(jnp.float32), 2)
                x1, x2 = rot[..., 0::2], rot[..., 1::2]
                rh = jnp.stack([-x2, x1], axis=-1).reshape(rot.shape)
            else:
                half = rotary_dim // 2
                rh = jnp.concatenate([-rot[..., half:], rot[..., :half]],
                                     axis=-1)
            out = rot * cos + rh * sin
            return jnp.concatenate([out, keep], axis=-1).reshape(B, -1)

        q = rope_sec(y[:, :Dq], Dq // head_dim)
        k = rope_sec(y[:, Dq:Dq + Dkv], Dkv // head_dim)
        y = jnp.concatenate([q, k, y[:, Dq + Dkv:]], axis=1)
    return y.astype(jnp.bfloat16)


# ------------------------------------------------- kernel 2: flash GQA decode
def _flash_decode_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                         acc_ref, m_ref, l_ref, *, n_t: int, block_t: int,
                         hkv: int, scale: float):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)

    pos = pos_ref[0]
    t_abs = t * block_t + jax.lax.broadcasted_iota(jnp.int32, (1, block_t), 1)
    valid = t_abs <= pos                                    # [1, Tb]

    @pl.when(t * block_t <= pos)
    def _():
        for g in range(hkv):
            qg = q_ref[0, g].astype(jnp.bfloat16)           # [qpk, d]
            kg = k_ref[0, :, g, :].astype(jnp.bfloat16)     # [Tb, d]
            vg = v_ref[0, :, g, :].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT) * scale  # [qpk, Tb]
            s = jnp.where(valid, s, -1e30)
            qpk = s.shape[0]
            m_prev = m_ref[g * qpk:(g + 1) * qpk, :1]       # [qpk, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)                          # [qpk, Tb]
            l_prev = l_ref[g * qpk:(g + 1) * qpk, :1]
            l_ref[g * qpk:(g + 1) * qpk, :1] = l_prev * alpha + jnp.sum(
                p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)        # [qpk, d]
            acc_ref[g * qpk:(g + 1) * qpk, :] = (
                acc_ref[g * qpk:(g + 1) * qpk, :] * alpha + pv)
            m_ref[g * qpk:(g + 1) * qpk, :1] = m_new

    @pl.when(t == n_t - 1)
    def _():
        hq = o_ref.shape[1]
        l = jnp.maximum(l_ref[:hq, :1], 1e-30)
        o_ref[0] = (acc_ref[:hq, :] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_t"))
def flash_decode_attention(q: jax.Array, k_cache: jax.Array,
                           v_cache: jax.Array, pos: jax.Array,
                           scale: float, block_t: int = 256) -> jax.Array:
    """Single-token GQA attention against the cache: q [B, Hq, d],
    k/v_cache [B, T, Hkv, d] (already containing the current token at
    ``pos``), attends keys t <= pos. Returns [B, Hq, d] bf16.

    Grid (B, T/Tb): flash accumulation in VMEM scratch; blocks entirely
    beyond ``pos`` skip compute (their HBM reads are the tail of the ring
    buffer — bounded by max_seq)."""
    B, Hq, d = q.shape
    _, T, Hkv, _ = k_cache.shape
    qpk = Hq // Hkv
    bt = min(block_t, T)
    while T % bt:
        bt //= 2
    n_t = T // bt
    rows = ((max(8, Hq) + 7) // 8) * 8

    q4 = q.reshape(B, Hkv, qpk, d)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((1, Hkv, qpk, d), lambda b, t, pos: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, Hkv, d), lambda b, t, pos: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, Hkv, d), lambda b, t, pos: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hq, d), lambda b, t, pos: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, d), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_decode_kernel, n_t=n_t, block_t=bt,
                          hkv=Hkv, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * d,
            bytes_accessed=2 * B * T * Hkv * d * 2,
            transcendentals=B * Hq * T,
        ),
    )(pos_arr, q4, k_cache, v_cache)


def flash_decode_reference(q, k_cache, v_cache, pos, scale):
    """Masked full-softmax oracle (mirrors transformer.attention at s=1)."""
    B, Hq, d = q.shape
    T, Hkv = k_cache.shape[1], k_cache.shape[2]
    qpk = Hq // Hkv
    kk = jnp.repeat(k_cache.astype(jnp.float32), qpk, axis=2)  # [B,T,Hq,d]
    vv = jnp.repeat(v_cache.astype(jnp.float32), qpk, axis=2)
    s = jnp.einsum("bhd,bthd->bht", q.astype(jnp.float32), kk) * scale
    mask = (jnp.arange(T)[None, None, :] <= pos)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bht,bthd->bhd", p, vv).astype(jnp.bfloat16)


__all__ = ["fused_qkv_rope_w8a8", "fused_qkv_rope_reference",
           "flash_decode_attention", "flash_decode_reference",
           "rope_tile_operands", "expand_rope_tables"]
