"""Whole-decode-step W4A8 / W3A8 / W2A8 megakernels: uniform sub-byte
weights streamed PACKED at exactly bits/8 bytes per weight, dequantized as
MXU algebra on masked int8 dots — the generalization of the W4 pair-nibble
kernel (ops/megastep4.py). bits=4 is one plane of two nibble fields (the
identical pair algebra), so the same kernel serves W4 while adding two
things megastep4 lacks: multi-tile grid steps (ptq/ptg walk several packed
tiles per sequential step, amortizing the ~5.5us/step floor) and the
trailing-unembed fold (final norm + w8 lm_head as vocab phases on a flat
1-D grid — the lm tiles stream ONCE per decode step, overlapped with the
last layer's compute, and the separate unembed program disappears).

Why: the megastep family is DMA-bound (PERF.md round 2: ~520 GB/s effective
with all compute disabled), so the only lever is BYTES. The paper's GANQ-3
headline is 2.39-2.57x over fp16 (reference `paper.md:551-603`); W3 streams
25% fewer weight bytes than the W4 pair kernel. A per-element unpack of
3-bit fields through the VPU is off the table on TPU (the round-1 LUT
select-tree wall), so the packed bytes must flow through the MXU as stored.

The generalized field-plane trick. A byte is a radix-2 polynomial of
fields; an int8 MXU dot against x distributes over the fields:

  plane = f0 << p0 | f1 << p1 | ... | fk        (p0 > p1 > ... > pk = 0)
  d_j   = x8 . (plane & ((1 << p_{j-1}) - 1))   (mask keeps fields j..k)
  x8.f_j = (d_j - d_{j+1}) >> p_j               (exact: multiples of 2^p_j)

with the TOP field stored XOR its sign bit so the plain SIGNED byte read
gives d_0 with f_0 - 2^(w0-1) in place of f_0 (no 9th bit needed). Each
mask costs ONE vector AND per element; each d_j is idle-MXU work in a
bandwidth-bound kernel.

W3 packs 8 output rows (blocks of tile/8) into 3 byte-planes:

  A = r0(3) | r1(3) | r2.hi(2)         3 dots, 2 masks
  B = r2.lo(1) | r3(3) | r4(3) | r5.hi(1)   4 dots, 3 masks
  C = r5.lo(2) | r6(3) | r7(3)         3 dots, 2 masks

(rows r2 and r5 are split across plane boundaries; their halves recombine
as x.q = (x.hi << shift) + x.lo — still linear in x). W2 packs 4 rows into
one byte: f(2)|f(2)|f(2)|f(2), 4 dots, 3 masks.

Same phase walk and activation-quantization points as ops/megastep4.py, so
`megastep4_reference` is the oracle for this kernel too. Applies to any
uniform sym W3/W2 artifact (GPTQ sym / AutoRound-sym / GANQ 3-bit int
recode) with sequential 128-multiple groups. TPU-native analog of the
reference's 2/3-bit CUDA paths (gptqmodel_ext/exllamav2/qdq_2.cuh,
qdq_3.cuh) — those unpack via shared-memory shift networks; here the
dequant is algebra on masked MXU partial products.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megastep4 import _quant_rows, _rope_rows
from .megastep4 import megastep4_reference as megastep_lowbit_reference

_DEF = jax.lax.Precision.DEFAULT

# field plans: per plane, (row_block, src_shift, width) high bits -> low.
# row_block indexes the tile's row octet/quartet; src_shift says which bits
# of that row's code this field holds.
_PLAN = {
    4: (
        ((0, 0, 4), (1, 0, 4)),
    ),
    3: (
        ((0, 0, 3), (1, 0, 3), (2, 1, 2)),
        ((2, 0, 1), (3, 0, 3), (4, 0, 3), (5, 2, 1)),
        ((5, 0, 2), (6, 0, 3), (7, 0, 3)),
    ),
    2: (
        ((0, 0, 2), (1, 0, 2), (2, 0, 2), (3, 0, 2)),
    ),
    # bits=8 ("w8p"): one plane, one field — the signed byte read IS the
    # centered code (coef folds to 0), so int8 artifacts (free-codebook
    # GANQ recodes, ops/qlinear.recode_uniform8 / w8_to_uniform8) ride the
    # same kernel: multi-tile grid steps, batch <= 32, trailing-unembed.
    8: (
        ((0, 0, 8),),
    ),
}


def _rope_rot(y, rd: int, interleaved: bool):
    """rotate_half (or interleaved pair-rotate) of each head's rope window
    via two cyclic lane rolls + a parity select — replaces the [tq, tq]
    sign-permutation matmul (megastep4._rope_rows R), whose VMEM window
    costs tq^2 bytes (19 MB at the 8B qkv tile). Lanes outside the rope
    window get arbitrary values; the caller's sin mask is 0 there. Head
    stride is 128 lanes (the megastep gate pins head_dim=128)."""
    n = y.shape[-1]
    ax = y.ndim - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, y.shape, ax)
    if interleaved:
        up = pltpu.roll(y, n - 1, axis=ax)           # y[i + 1]
        dn = pltpu.roll(y, 1, axis=ax)               # y[i - 1]
        return jnp.where((iota & 1) == 0, -up, dn)
    h = rd // 2
    up = pltpu.roll(y, n - h, axis=ax)               # y[i + h]
    dn = pltpu.roll(y, h, axis=ax)                   # y[i - h]
    return jnp.where((iota % 128) < h, -up, dn)


def _block_sum128(x):
    """Per-128-lane-block sum, broadcast to every lane of its block: a
    7-stage XOR butterfly of cyclic rolls (stages stay within 128-aligned
    blocks since every stride < 128). Powers the in-kernel per-head
    reductions (qk-norm RMS) without lane-dim reshapes."""
    n = x.shape[-1]
    ax = x.ndim - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
    for s in (1, 2, 4, 8, 16, 32, 64):
        up = pltpu.roll(x, n - s, axis=ax)
        dn = pltpu.roll(x, s, axis=ax)
        x = x + jnp.where((iota & s) == 0, up, dn)
    return x


def _plan_meta(bits: int):
    """(metas, coef, nd, g_r): per-plane field tuples (row, shift, width,
    bitpos), the per-row-block S coefficient folding the top-field sign
    offsets with the symmetric zero point, the derived-matrix count, and
    rows per plane-group."""
    plan = _PLAN[bits]
    metas = []
    nd = 0
    for segs in plan:
        pos = 8
        fields = []
        for (row, shift, w) in segs:
            pos -= w
            fields.append((row, shift, w, pos))
        assert pos == 0, "plan fields must fill the byte"
        metas.append(tuple(fields))
        nd += len(segs)
    g_r = max(r for segs in plan for (r, _, _) in segs) + 1
    coef = [-(1 << (bits - 1))] * g_r
    for segs in plan:
        row0, shift0, w0 = segs[0]
        coef[row0] += 1 << (shift0 + w0 - 1)
    return tuple(metas), tuple(coef), nd, g_r


def _derive(bg, tF: int, metas):
    """Masked views of one packed block [NP*tF, gs]: the signed plane plus
    one AND per non-top field."""
    out = []
    for p, fields in enumerate(metas):
        P = bg[p * tF:(p + 1) * tF]
        out.append(P)
        for (_, _, _, pos) in fields[:-1]:
            out.append(P & jnp.int8((1 << pos) - 1))
    return out


def _recover(dd, tF: int, metas, coef, S, off: int = 0):
    """Field shift algebra on the dot outputs -> per-row-block centered
    dots z_r = x8.q_r - 2^(b-1)*sum(x8), int32 [B, tF] each."""
    sar = jax.lax.shift_right_arithmetic
    zs = [None] * len(coef)
    idx = off
    for fields in metas:
        k = len(fields)
        ds = [dd[:, (idx + j) * tF:(idx + j + 1) * tF] for j in range(k)]
        ds.append(jnp.zeros_like(ds[0]))
        for j, (row, shift, _, pos) in enumerate(fields):
            raw = ds[j] - ds[j + 1]
            if pos:
                raw = sar(raw, pos)
            if shift:
                raw = raw * (1 << shift)
            zs[row] = raw if zs[row] is None else zs[row] + raw
        idx += k
    return [z + c * S if c else z for z, c in zip(zs, coef)]


# -------------------------------------------------- Walsh LUT decode
# True non-uniform per-row 8-entry codebooks (GANQ bits=3 LUT artifacts —
# the paper's GANQ-3 configuration) served EXACTLY at 3 bits/weight
# streamed (VERDICT r4 #1; the paper's LUT-mpGEMM thesis,
# reference paper.md:551-603, gptqmodel/quantization/ganq.py:39-270).
# Any function on 3 bits is a sum of 8 XOR-monomials:
#   T[r, q] = c0[r] + sum_S c_S[r] * (XOR of q's bits in S)
# so x.T[r, q_r] = c0[r]*sum(x) + sum_S c_S[r] * (x . m_S(q_r)).
# Only the 3 LINEAR bit-planes are stored (one byte = one bit of 8 output
# rows); the 4 interaction planes are XOR-derived in-kernel (1 vector op
# per byte = 1/8 op/weight) and each plane's 8 per-row bit dots come from
# the same masked-prefix-dot algebra as the uniform planes. Measured
# decode overhead vs the uniform W3 walk: ~0.8us per 3.6 MB of packed
# weights — ~11% of those bytes' DMA time (scripts/walsh_probe.py), so
# the exact-LUT decode hides under the weight stream. The kernel takes
# walsh=nmono (7 = exact 8-DOF; 3 = BCQ/linear-only 4-DOF artifacts).
_MONO = ((0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2))


def _walsh_basis_inv() -> np.ndarray:
    """Inverse of M[c, S] (column 0 = 1, then XOR-monomials): exact
    coefficient recovery c = Minv @ T for ANY 8-entry codebook."""
    M = np.zeros((8, 8), np.float64)
    M[:, 0] = 1.0
    for j, S in enumerate(_MONO):
        for c in range(8):
            v = 0
            for b in S:
                v ^= (c >> b) & 1
            M[c, 1 + j] = v
    return np.linalg.inv(M)


def walsh_coef(lut) -> jax.Array:
    """[..., m, 8] codebooks -> [..., 8, m] coefficient rows (c0 first,
    then the 7 monomials). Exact: the Walsh transform of the table."""
    Minv = jnp.asarray(_walsh_basis_inv(), jnp.float32)
    return jnp.einsum("...mk,sk->...sm", jnp.asarray(lut, jnp.float32),
                      Minv)


def _walsh_plane_pack(codes, tile: int):
    """[R, K] 3-bit codes -> [3*R/8, K] int8 bit-planes, tile-major: tile
    t's 3 planes at rows [t*3*tile/8, ...); plane p's byte holds bit p of
    the tile's 8 row-blocks (row-block r at byte bit 7-r, unflipped — the
    walsh recover handles the top row's sign read directly)."""
    xp = np if isinstance(codes, np.ndarray) else jnp
    R, K = codes.shape
    tF = tile // 8
    c = codes.reshape(R // tile, 8, tF, K)
    planes = []
    for p in range(3):
        byte = None
        for r in range(8):
            v = (c[:, r] >> p) & 1
            byte = v if byte is None else (byte << 1) | v
        planes.append(byte)
    out = xp.stack(planes, axis=1).reshape(R // tile * 3 * tF, K)
    return ((out.astype(xp.int32) + 128) % 256 - 128).astype(xp.int8)


def _walsh_views(P, nmono: int):
    """The nmono monomial plane blocks from the 3 stored ones."""
    planes = list(P)
    if nmono > 3:
        planes += [P[0] ^ P[1], P[0] ^ P[2], P[1] ^ P[2],
                   P[0] ^ P[1] ^ P[2]]
    return planes[:nmono]


def _walsh_derive1(P):
    """8 masked prefix views of one 8-field bit plane."""
    return [P] + [P & jnp.int8((1 << (7 - r)) - 1) for r in range(7)]


def _walsh_recover1(dd, tF: int):
    """dd [B, 8*tF] view dots -> [B, 8*tF] per-row bit dots (row-block-
    major). Field r: prefix diff, sar(7-r); row 0 negates (the unflipped
    top bit reads as -128 per set bit)."""
    sar = jax.lax.shift_right_arithmetic
    vs = [dd[:, k * tF:(k + 1) * tF] for k in range(8)]
    vs.append(jnp.zeros_like(vs[0]))
    parts = []
    for r in range(8):
        raw = vs[r] - vs[r + 1]
        if r == 0:
            parts.append(-sar(raw, 7))
        elif r < 7:
            parts.append(sar(raw, 7 - r))
        else:
            parts.append(raw)
    return jnp.concatenate(parts, axis=1)


def _walsh_csz(H: int, q_dim: int, ti: int) -> int:
    """In-kernel column-chunk size for the walsh walks: the largest of
    512/256/128 dividing every walked width (H for qkv+gate/up, q_dim for
    o, ti for down)."""
    for c in (512, 256, 128):
        if H % c == 0 and q_dim % c == 0 and ti % c == 0:
            return c
    return 0


def _qkv_tile_lb(Dqkv: int, d: int, g_r: int) -> int | None:
    """Largest row tile t | Dqkv with t % d == 0 and (t/g_r) % 128 == 0
    (field blocks must be lane-aligned on real hardware)."""
    for cand in (4096, 3072, 2560, 2048, 1280, 1024, 512):
        if (Dqkv % cand == 0 and cand % d == 0
                and (cand // g_r) % 128 == 0):
            return cand
    return None


def _mlp_tile_lb(I: int, g_r: int) -> int | None:
    ti = 2048
    while ti >= 128 and (I % ti or (ti // g_r) % 128):
        ti //= 2
    return ti if ti >= 128 else None


def _mlp_plan(I: int, bits: int, H: int,
              cap: int = 48 * 1024 * 1024) -> tuple:
    """(ti, ptg) minimizing MLP grid steps. The gate, up, AND down blocks
    of one step each cost ptg*ti*npl*H/g_r packed bytes, so fewest steps
    == max ptg*ti within the VMEM share (``cap`` covers all three,
    double-buffered). Non-power-of-two tiles matter: I=14336 (the 8B
    shape) steps 7x2048 under the old picker but 4x(1792*2) here —
    each sequential grid step costs ~5.5us on this runtime (PERF.md)."""
    metas, _, _, g_r = _plan_meta(bits)
    npl = len(metas)
    unit = 6 * npl * H // g_r        # dbuf bytes per unit of ptg*ti
    best = None
    for ti0 in range(256, min(I, 4096) + 1, 128):
        if I % ti0 or (ti0 // g_r) % 128:
            continue
        ng = I // ti0
        ptg = 0
        for c in range(ng, 0, -1):
            if ng % c == 0 and c * ti0 * unit <= cap:
                ptg = c
                break
        if not ptg:
            continue
        key = (ptg * ti0, ti0)
        if best is None or key > best[0]:
            best = (key, ti0, ptg)
    if best is None:
        ti = _mlp_tile_lb(I, g_r)    # tiny shapes below the 256 floor
        return ti, 1
    return best[1], best[2]


def _megastep_lb_kernel(pos_ref, x_ref, anw_ref, mnw_ref,
                        qw_ref, qs_ref, qb_ref, cos_ref, sin_ref,
                        kc_ref, vc_ref, ow_ref, os_ref,
                        gw_ref, uw_ref, gus_ref, dw_ref, ds_ref, pb_ref,
                        *rest,
                        B: int, d: int, Hq: int, Hkv: int, qpk: int,
                        NQ: int, NT: int, NG: int, Tb: int, tq: int, ti: int,
                        gs: int, L: int, eps: float, rms_offset: float,
                        scale: float, act: str, bits: int,
                        rd: int = 0, interleaved: bool = False,
                        ptq: int = 1, ptg: int = 1, gtp8k: int = 8,
                        NV: int = 0, with_bias: bool = False, Bp: int = 8,
                        with_aperm: bool = False, with_lora: bool = False,
                        with_zp: bool = False, with_qkn: bool = False,
                        softcap: float = 0.0, with_sand: bool = False,
                        with_win: bool = False, ablate: str = "none",
                        walsh: int = 0):
    # optional-operand layout (order matches the wrapper's in_specs):
    # with_aperm adds 3 inputs (qkv/gate-up/o Beneš lane-routing masks —
    # act-order artifacts, VERDICT r2 #4b); with_lora adds 8 inputs (EoRA
    # lora_a/b per projection, fused rank-r epilogue, VERDICT r2 #4d);
    # with_bias adds 3 inputs (o/gate-up/down biases, VERDICT r2 #4c);
    # trailing-unembed mode adds 3 inputs (lm weights/scales, final norm)
    # and one output (logits); the grid is flat 1-D (L*P layer steps, then
    # NV vocab steps) so the lm_head tiles stream ONCE, not per layer.
    # Scratch tail: of_s (aperm|lora), then xaq/xag/xad (lora).
    from .lane_perm import lane_permute
    ob_ref = gub_ref = dnb_ref = None
    apq_ref = apg_ref = apo_ref = None
    if with_aperm:
        apq_ref, apg_ref, apo_ref = rest[:3]
        rest = rest[3:]
    if with_lora:
        (laq_ref, lbq_ref, lao_ref, lbo_ref, lag_ref, lbg_ref,
         lad_ref, lbd_ref) = rest[:8]
        rest = rest[8:]
    qsz_ref = osz_ref = gusz_ref = dnsz_ref = None
    if with_zp:
        qsz_ref, osz_ref, gusz_ref, dnsz_ref = rest[:4]
        rest = rest[4:]
    qn_ref = None
    if with_qkn:
        qn_ref = rest[0]
        rest = rest[1:]
    pa_ref = pm_ref = None
    if with_sand:
        pa_ref, pm_ref = rest[:2]
        rest = rest[2:]
    wb_ref = None
    if with_win:
        wb_ref = rest[0]
        rest = rest[1:]
    if with_bias:
        ob_ref, gub_ref, dnb_ref = rest[:3]
        rest = rest[3:]
    if NV:
        lmw_ref, lms_ref, fnw_ref = rest[:3]
        rest = rest[3:]
    y_ref, kn_ref, vn_ref = rest[:3]
    rest = rest[3:]
    if NV:
        lg_ref = rest[0]
        rest = rest[1:]
    x_s, x8_s, sx_s, qkv_s, acc_s, m_s, l_s, a8_s, ma_s = rest[:9]
    rest = rest[9:]
    of_s = None
    if with_aperm or with_lora:
        of_s = rest[0]
        rest = rest[1:]
    if with_lora:
        xaq_s, xag_s, xad_s = rest[:3]

    def _lora_dot(xv, w_ref_val):
        """xv [B, K] f32 @ w [R, K] -> [B, R] f32 (adapters stream bf16)."""
        return jax.lax.dot_general(
            xv, w_ref_val.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_DEF)
    pos = pos_ref[B]
    f32 = jnp.float32
    NQS, NGS = NQ // ptq, NG // ptg        # grid steps walk ptq/ptg tiles
    O_STEP = NQS + NT
    P = NQS + NT + 1 + NGS
    step = pl.program_id(0)
    lix = jnp.minimum(step // P, L - 1)
    p = step - lix * P                     # >= P only on the vocab steps
    H = x_ref.shape[1]
    Gh = H // gs
    gti = ti // gs
    metas, coef, nd, g_r = _plan_meta(bits)
    tFq, tFo, tFi = tq // g_r, H // g_r, ti // g_r
    pq = len(metas) * tq // g_r            # packed rows per qkv tile
    pi = len(metas) * ti // g_r            # packed rows per gate/up tile

    def group_dot(xs, blocks_tFs):
        """One concat dot over every (block, tF) pair; returns (dd, S)."""
        rhs = jnp.concatenate(
            [m for bg, tF in blocks_tFs for m in _derive(bg, tF, metas)],
            axis=0)
        dd = jax.lax.dot_general(xs, rhs, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32,
                                 precision=_DEF)
        S = jnp.sum(xs.astype(jnp.int32), axis=1, keepdims=True)
        return dd, S

    def walsh_y(xsrc, w_ref, cf_ref, row0: int, tFw: int, ncols: int,
                col0: int = 0, cf_off: int = 0, width: int = 0):
        """One walsh-decoded tile matmul: y[b, 8*tFw] = x . T[r, q_r].
        ``xsrc(c0, n)`` yields the int8 activation slice [Bx, n];
        ``w_ref`` rows [row0, row0+3*tFw) hold the tile's 3 stored bit
        planes; coef rows stream at cf_ref[0, s, cf_off:cf_off+width].
        Walks ncols input columns in static csz chunks (``gs`` under
        walsh); interaction planes are XOR-derived per chunk. The view
        dots accumulate in INT32 across chunks and coefficients apply
        once per tile — the f32 recomposition then rounds like the
        oracle's single dequant matmul (per-chunk f32 accumulation left
        ~1e-4 absolute on pre-activation sums, enough to flip downstream
        a8 codes at rounding boundaries)."""
        width = width or 8 * tFw
        Bx = xsrc(0, gs).shape[0]
        acc = [jnp.zeros((Bx, 8 * tFw), jnp.int32) for _ in range(walsh)]
        Sacc = jnp.zeros((Bx, 1), jnp.int32)
        for ci in range(ncols // gs):
            xs = xsrc(ci * gs, gs)
            Sacc = Sacc + jnp.sum(xs.astype(jnp.int32), axis=1,
                                  keepdims=True)
            P = [w_ref[0, row0 + pp * tFw: row0 + (pp + 1) * tFw,
                       col0 + ci * gs: col0 + (ci + 1) * gs]
                 for pp in range(3)]
            for j, Pl in enumerate(_walsh_views(P, walsh)):
                dd = jax.lax.dot_general(
                    xs, jnp.concatenate(_walsh_derive1(Pl), axis=0),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32, precision=_DEF)
                acc[j] = acc[j] + dd
        y = cf_ref[0, 0, cf_off:cf_off + width][None, :] \
            * Sacc.astype(f32)
        for j in range(walsh):
            z = _walsh_recover1(acc[j], tFw)
            cf = cf_ref[0, 1 + j, cf_off:cf_off + width]
            y = y + cf[None, :] * z.astype(f32)
        return y

    def fields_y(dd, S, tF, sc_row, off=0, sz_row=None):
        """Scaled field parts concat -> [B, g_r*tF] f32 contribution.
        ``sc_row``/``sz_row`` are [1, g_r*tF] rows (2-D so dynamic-g ref
        loads feed straight in). ``sz_row`` (asym artifacts): per-col
        scale*(center-zero), applied as + sz * S (S = the group's
        activation sum)."""
        zs = _recover(dd, tF, metas, coef, S, off)
        Sf = S.astype(f32)
        parts = []
        for f in range(g_r):
            sl = sc_row[:, f * tF:(f + 1) * tF].astype(f32)
            p = sl * zs[f].astype(f32)
            if sz_row is not None:
                p = p + sz_row[:, f * tF:(f + 1) * tF] * Sf
            parts.append(p)
        return jnp.concatenate(parts, axis=1)

    # ---- layer entry: residual init, attn norm + int8 quant, flash init
    @pl.when(p == 0)
    def _():
        if ablate == "dma":
            return

        @pl.when(lix == 0)
        def _():
            x_s[:] = x_ref[:].astype(f32)
        xf = x_s[:]
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * (
            anw_ref[0].astype(f32) + rms_offset)
        if with_aperm:        # act-order: qkv columns are group-sorted
            xf = lane_permute(xf, apq_ref[0])
        if with_lora:         # x @ A.T once; tiles each apply their B rows
            xaq_s[:] = _lora_dot(xf, laq_ref[0])
        x8, sx = _quant_rows(xf)
        x8_s[:] = x8
        sx_s[:B, :1] = sx
        acc_s[:] = jnp.zeros_like(acc_s)
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)

    def _octet_loop(n, load8, step, init):
        """Group walk as a fori loop over OCTETS of groups — the compile-
        size fix for big shapes (a fully unrolled 8B body blew Mosaic past
        the remote relay's patience; the round-3 solver lesson: fori
        compiles ~8x faster with identical runtime). Scale rows load 8 at
        a time because Mosaic must statically prove sublane alignment
        (dynamic single-row loads fail 'index ... multiple of 8'); the
        inner 8-walk is inlined with static row picks. Non-octet group
        counts (small shapes) take the plain unroll — compile size is no
        concern there.

        ``load8(gbase, rows)`` -> aligned row block at [gbase, gbase+rows);
        ``step(g, row1, acc)`` -> acc with group g applied (row1 [1, w])."""
        if n % 8:
            acc = init
            rows = load8(0, n)
            for g in range(n):
                acc = step(g, jax.tree_util.tree_map(
                    lambda r: r[g:g + 1], rows), acc)
            return acc

        def outer(g8, acc):
            rows = load8(g8 * 8, 8)
            for j in range(8):
                acc = step(g8 * 8 + j, jax.tree_util.tree_map(
                    lambda r: r[j:j + 1], rows), acc)
            return acc

        return jax.lax.fori_loop(0, n // 8, outer, init)

    # profiling ablation (scripts/mb8_profile.py): "dma" empties every
    # phase body (BlockSpec fetches still run -> the grid's pure DMA
    # envelope); "noflash"/"nomlp"/"noqkv" skip one phase family. The
    # serving path always passes "none".
    ab_qkv = ablate in ("dma", "noqkv")
    ab_flash = ablate in ("dma", "noflash")
    ab_mlp = ablate in ("dma", "nomlp")
    ab_o = ablate == "dma"

    # ---- phase A: ptq qkv row tiles (plane dots) -> rope -> scatter
    @pl.when(p < NQS)
    def _():
        if ab_qkv:
            return
        for sub in range(ptq):
            def qload8(gb, nr):
                out = [qs_ref[0, pl.ds(gb, nr), sub * tq:(sub + 1) * tq]]
                if with_zp:
                    out.append(qsz_ref[0, pl.ds(gb, nr),
                                       sub * tq:(sub + 1) * tq])
                return out

            def qstep(g, rows, y):
                xs = x8_s[:, pl.ds(g * gs, gs)]
                bg = qw_ref[0, sub * pq:(sub + 1) * pq,
                            pl.ds(g * gs, gs)]            # [NP*tFq, gs]
                dd, S = group_dot(xs, [(bg, tFq)])
                return y + fields_y(
                    dd, S, tFq, rows[0],
                    sz_row=rows[1] if with_zp else None)

            if walsh:
                y = walsh_y(lambda c0, n: x8_s[:, c0:c0 + n],
                            qw_ref, qs_ref, sub * 3 * (tq // 8),
                            tq // 8, H, cf_off=sub * tq)
            else:
                y = _octet_loop(Gh, qload8, qstep,
                                jnp.zeros((B, tq), f32))
            y = y * sx_s[:B, :1] + qb_ref[0, :, sub * tq:(sub + 1) * tq]
            if with_lora:
                y = y + _lora_dot(xaq_s[:],
                                  lbq_ref[0, sub * tq:(sub + 1) * tq, :])
            if with_qkn:
                # per-head RMS over head_dim on q/k lanes, pre-rope
                # (qwen3 / gemma3's (1+w) via rms_offset); v lanes pass
                # through (mask row 0)
                wv = qn_ref[0, 0, sub * tq:(sub + 1) * tq][None, :]
                mv = qn_ref[0, 1, sub * tq:(sub + 1) * tq][None, :]
                msq = _block_sum128(y * y) * (1.0 / d)
                y = y * jnp.where(
                    mv != 0.0,
                    jax.lax.rsqrt(msq + eps) * (wv + rms_offset), 1.0)
            if rd:
                rot = _rope_rot(y, rd, interleaved)
                y = (y * cos_ref[0, sub] + rot * sin_ref[0, sub])
            y = y.astype(jnp.bfloat16)
            t_idx = p * ptq + sub
            # one [tq/d * Bp, d] store per tile (head-major scratch rows)
            yt = jnp.pad(y, ((0, Bp - B), (0, 0))).reshape(
                Bp, tq // d, d).transpose(1, 0, 2).reshape(tq // d * Bp, d)
            qkv_s[pl.ds(t_idx * (tq // d) * Bp, tq // d * Bp), :] = yt

    @pl.when(p == NQS - 1)
    def _():
        kv = qkv_s[Hq * Bp:(Hq + 2 * Hkv) * Bp, :].reshape(
            2 * Hkv, Bp, d).transpose(1, 0, 2)         # [Bp, 2Hkv, d]
        kn_ref[0] = kv[:B, :Hkv].reshape(B, Hkv * d)
        vn_ref[0] = kv[:B, Hkv:].reshape(B, Hkv * d)

    # ---- phase B: flash attention over one cache block. ONE batched dot
    # over all (b, kv-head) pairs per block (batch dim B*Hkv matches the
    # cache row order b*Hkv+g) — the unrolled per-(b,g) loop cost ~10x the
    # kernel's DMA share at the 8B shape (PERF.md round 3, VERDICT r2 #3).
    tb = p - NQS
    in_flash = (p >= NQS) & (p < NQS + NT)
    BG = B * Hkv

    def _fview(s, rows=Hq, base=0):
        """Scratch [rows*Bp, n] (row h*Bp+b, h=g*qpk+i) -> batched view
        [Bp*Hkv, per, n] (row b*Hkv+g) — a free reshape + one transpose."""
        n = s.shape[1]
        per = rows // Hkv
        v = s[base * Bp:(base + rows) * Bp, :].reshape(Hkv, per, Bp, n)
        return v.transpose(2, 0, 1, 3).reshape(Bp * Hkv, per, n)

    def _fstore(ref, v, per=None):
        """Inverse of _fview: [B*Hkv, per, n] -> full scratch block (padded
        batch rows, if any, are overwritten with zeros — they are never
        read: finalize's l-clamp maps them to 0)."""
        per = per if per is not None else qpk
        n = v.shape[2]
        if Bp != B:
            v = jnp.pad(v, ((0, (Bp - B) * Hkv), (0, 0), (0, 0)))
        v = v.reshape(Bp, Hkv, per, n).transpose(1, 2, 0, 3)
        ref[:] = v.reshape(Hkv * per * Bp, n)

    def _online_all(s_blk, v_blk):
        """Vectorized online-softmax update: s_blk [B*Hkv, qpk, Tb'] f32,
        v_blk [B*Hkv, Tb', d] bf16."""
        m_prev = _fview(m_s)[:BG]             # [BG, qpk, 128]
        l_prev = _fview(l_s)[:BG]
        a_prev = _fview(acc_s)[:BG]
        smax = jnp.max(s_blk, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, smax)
        alpha = jnp.exp(m_prev - m_new)
        pexp = jnp.exp(s_blk - m_new[:, :, :1])
        pv = jax.lax.dot_general(pexp.astype(jnp.bfloat16), v_blk,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32,
                                 precision=_DEF)
        l_new = l_prev * alpha + jnp.sum(pexp, axis=2, keepdims=True)
        a_new = a_prev * alpha + pv
        _fstore(m_s, m_new)
        _fstore(l_s, l_new)
        _fstore(acc_s, a_new)

    def _qview():
        return _fview(qkv_s)[:BG].astype(jnp.bfloat16)   # [BG, qpk, d]

    def _cap(sc):
        # gemma2 attention softcap: cap * tanh(sc / cap) on scaled scores
        if softcap:
            return softcap * jnp.tanh(sc * (1.0 / softcap))
        return sc

    @pl.when(in_flash & (tb * Tb < pos))
    def _():
        if ab_flash:
            return
        t_abs = jax.lax.broadcasted_iota(jnp.int32, (BG, qpk, Tb), 2)
        kg = kc_ref[0].astype(jnp.bfloat16)              # [BG, Tb, d]
        vg = vc_ref[0].astype(jnp.bfloat16)
        sc = jax.lax.dot_general(_qview(), kg, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32,
                                 precision=_DEF)         # [BG, qpk, Tb]
        # per-slot history length, pre-expanded to cache row order by the
        # wrapper (pb_ref row b*Hkv+g holds pos[b])
        posr = pb_ref[:BG, :1].reshape(BG, 1, 1)
        valid = (tb * Tb + t_abs) < posr
        if with_win:
            # sliding layers attend to the last w positions only (w = T on
            # full layers — a no-op); the current token at pos counts, so
            # history t is in-window iff t > pos - w
            wv = wb_ref[:1, :1].reshape(1, 1, 1)
            valid &= (tb * Tb + t_abs) > (posr - wv)
        sc = jnp.where(valid, _cap(sc * scale), -1e30)
        _online_all(sc, vg)

    @pl.when(in_flash & (tb == NT - 1))
    def _():
        if ab_flash:
            return
        kcur = _fview(qkv_s, Hkv, Hq)[:BG]               # [BG, 1, d]
        vcur = _fview(qkv_s, Hkv, Hq + Hkv)[:BG]
        s_c = _cap(jax.lax.dot_general(
            _qview().astype(jnp.float32), kcur.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_DEF) * scale)                     # [BG, qpk, 1]
        _online_all(s_c, vcur.astype(jnp.bfloat16))

    # ---- phase C: flash finalize -> o (plane dots over q_dim groups) ->
    # residual, then MLP norm + quant
    @pl.when(p == O_STEP)
    def _():
        if ab_o:
            return
        use_of = with_aperm or with_lora
        # flash finalize, all heads at once: [Hq, Bp, d] -> [Bp, Hq*d]
        a = acc_s[:].reshape(Hq, Bp, d) / jnp.maximum(
            l_s[:, :1].reshape(Hq, Bp, 1), 1e-30)
        a_bt = a.transpose(1, 0, 2).reshape(Bp, Hq * d)
        sa = jnp.maximum(jnp.max(jnp.abs(a_bt), axis=1, keepdims=True),
                         1e-12) / 127.0
        if with_aperm:
            # o columns are group-sorted: route the flat attention output
            # through o's Beneš masks before its quantization; the lora
            # epilogue then reads the permuted of_s against pack-permuted
            # la_o
            a_bt = lane_permute(a_bt, apo_ref[0])
        if use_of:
            of_s[:] = a_bt
        a8_s[:, :Hq * d] = jnp.clip(
            jnp.round(a_bt / sa), -127, 127).astype(jnp.int8)
        Dq = Hq * d

        def oload8(gb, nr):
            out = [os_ref[0, pl.ds(gb, nr), :]]
            if with_zp:
                out.append(osz_ref[0, pl.ds(gb, nr), :])
            return out

        def ostep(g, rows, o):
            xs = a8_s[:, pl.ds(g * gs, gs)]
            bg = ow_ref[0, :, pl.ds(g * gs, gs)]         # [NP*tFo, gs]
            dd, S = group_dot(xs, [(bg, tFo)])
            return o + fields_y(dd, S, tFo, rows[0],
                                sz_row=rows[1] if with_zp else None)

        if walsh:
            o = walsh_y(lambda c0, n: a8_s[:, c0:c0 + n],
                        ow_ref, os_ref, 0, H // 8, Dq)
        else:
            o = _octet_loop(Dq // gs, oload8, ostep,
                            jnp.zeros((Bp, H), f32))
        upd = (o * sa)[:B]
        if with_lora:     # o epilogue: of_s holds the exact fp attn output
            xao = _lora_dot(of_s[:], lao_ref[0])
            upd = upd + _lora_dot(xao, lbo_ref[0])[:B]
        if with_bias:
            upd = upd + ob_ref[0]
        if with_sand:     # gemma2/3: post_attention norm BEFORE the residual
            v_ = jnp.mean(upd * upd, axis=1, keepdims=True)
            upd = upd * jax.lax.rsqrt(v_ + eps) * (
                pa_ref[0].astype(f32) + rms_offset)
        x_s[:] += upd
        xf = x_s[:]
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + eps) * (
            mnw_ref[0].astype(f32) + rms_offset)
        if with_aperm:    # act-order: gate/up columns are group-sorted
            xf = lane_permute(xf, apg_ref[0])
        if with_lora:
            xag_s[:] = _lora_dot(xf, lag_ref[0])
            xad_s[:] = jnp.zeros_like(xad_s)
        x8, sx = _quant_rows(xf)
        x8_s[:] = x8
        sx_s[:B, :1] = sx
        ma_s[:] = jnp.zeros_like(ma_s)

    # ---- phase D: ptg fused MLP tiles (gate/up plane dots -> act -> a8 ->
    # down)
    @pl.when((p > O_STEP) & (p < P))
    def _():
        if ab_mlp:
            return
        for sub in range(ptg):
            o2 = sub * 2 * ti

            def mload8(gb, nr):
                out = [gus_ref[0, pl.ds(gb, nr), o2:o2 + ti],
                       gus_ref[0, pl.ds(gb, nr), o2 + ti:o2 + 2 * ti]]
                if with_zp:
                    out.append(gusz_ref[0, pl.ds(gb, nr), o2:o2 + ti])
                    out.append(gusz_ref[0, pl.ds(gb, nr),
                                        o2 + ti:o2 + 2 * ti])
                return out

            def mstep(g, rows, gu):
                gv, uv = gu
                xs = x8_s[:, pl.ds(g * gs, gs)]
                gbg = gw_ref[0, sub * pi:(sub + 1) * pi,
                             pl.ds(g * gs, gs)]           # [NP*tFi, gs]
                ubg = uw_ref[0, sub * pi:(sub + 1) * pi,
                             pl.ds(g * gs, gs)]
                dd, S = group_dot(xs, [(gbg, tFi), (ubg, tFi)])
                gv = gv + fields_y(dd, S, tFi, rows[0],
                                   sz_row=rows[2] if with_zp else None)
                uv = uv + fields_y(dd, S, tFi, rows[1], off=nd,
                                   sz_row=rows[3] if with_zp else None)
                return gv, uv

            if walsh:
                o2w = sub * 2 * ti
                tFi_w = ti // 8
                gv = walsh_y(lambda c0, n: x8_s[:, c0:c0 + n],
                             gw_ref, gus_ref, sub * 3 * tFi_w, tFi_w, H,
                             cf_off=o2w, width=ti)
                uv = walsh_y(lambda c0, n: x8_s[:, c0:c0 + n],
                             uw_ref, gus_ref, sub * 3 * tFi_w, tFi_w, H,
                             cf_off=o2w + ti, width=ti)
            else:
                gv, uv = _octet_loop(
                    Gh, mload8, mstep,
                    (jnp.zeros((B, ti), f32), jnp.zeros((B, ti), f32)))
            gv = gv * sx_s[:B, :1]
            uv = uv * sx_s[:B, :1]
            if with_lora:
                o2l = sub * 2 * ti
                gv = gv + _lora_dot(xag_s[:],
                                    lbg_ref[0, o2l:o2l + ti, :])
                uv = uv + _lora_dot(xag_s[:],
                                    lbg_ref[0, o2l + ti:o2l + 2 * ti, :])
            if with_bias:
                o2b = sub * 2 * ti
                gv = gv + gub_ref[0, :, o2b:o2b + ti]
                uv = uv + gub_ref[0, :, o2b + ti:o2b + 2 * ti]
            if act == "silu":
                a = jax.nn.silu(gv) * uv
            elif act == "gelu_tanh":
                a = jax.nn.gelu(gv, approximate=True) * uv
            else:
                a = jax.nn.gelu(gv, approximate=False) * uv
            a8, sa = _quant_rows(a)
            if with_lora:   # accumulate x@A.T for down's rank-r epilogue
                xad_s[:] += _lora_dot(
                    a, lad_ref[0, :, sub * ti:(sub + 1) * ti])
            a8_s[:B, :ti] = a8

            def dload8(gb, nr):
                # sub * gtp8k is a static octet multiple (gtp8k = rows
                # padded to 8), so the combined start stays provable
                out = [ds_ref[0, pl.ds(sub * gtp8k + gb, nr), :]]
                if with_zp:
                    out.append(dnsz_ref[0, pl.ds(sub * gtp8k + gb, nr), :])
                return out

            def dstep(g2, rows, y):
                xs = a8_s[:B, pl.ds(g2 * gs, gs)]
                bg = dw_ref[0, :, pl.ds((sub * gti + g2) * gs, gs)]
                dd, S = group_dot(xs, [(bg, tFo)])
                return y + fields_y(dd, S, tFo, rows[0],
                                    sz_row=rows[1] if with_zp else None)

            if walsh:
                y = walsh_y(lambda c0, n: a8_s[:B, c0:c0 + n],
                            dw_ref, ds_ref, 0, H // 8, ti,
                            col0=sub * ti)
            else:
                y = _octet_loop(gti, dload8, dstep,
                                jnp.zeros((B, H), f32))
            ma_s[:] += y * sa

    @pl.when(p == O_STEP + NGS)
    def _():
        upd = ma_s[:]
        if with_lora:
            upd = upd + _lora_dot(xad_s[:], lbd_ref[0])
        if with_bias:
            upd = upd + dnb_ref[0]
        if with_sand:     # gemma2/3: post_feedforward norm BEFORE residual
            v_ = jnp.mean(upd * upd, axis=1, keepdims=True)
            upd = upd * jax.lax.rsqrt(v_ + eps) * (
                pm_ref[0].astype(f32) + rms_offset)
        x_s[:] += upd

        @pl.when(lix == L - 1)
        def _():
            y_ref[:] = x_s[:].astype(y_ref.dtype)

    # ---- trailing vocab phases: final norm + quant once, then one int8
    # lm_head tile dot per step (the tile streams while the previous one
    # computes — and while the LAST layer's MLP still runs)
    if NV:
        @pl.when(p >= P)
        def _():
            if ablate == "dma":
                lg_ref[:] = jnp.zeros_like(lg_ref)
                return

            @pl.when(p == P)
            def _():
                xf = x_s[:]
                var = jnp.mean(xf * xf, axis=1, keepdims=True)
                xf = xf * jax.lax.rsqrt(var + eps) * (
                    fnw_ref[0].astype(f32) + rms_offset)
                x8, sx = _quant_rows(xf)
                x8_s[:] = x8
                sx_s[:B, :1] = sx
            dv = jax.lax.dot_general(x8_s[:], lmw_ref[:],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32,
                                     precision=_DEF)
            lg_ref[:] = (dv.astype(f32) * sx_s[:B, :1]
                         * lms_ref[0, :1, :]).astype(lg_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "q_dim", "kv_dim", "head_dim", "rotary_dim", "interleaved", "eps",
    "rms_offset", "scale", "act", "block_t", "bits", "softcap",
    "ablate", "qkv_cap_mb", "walsh", "interpret"))
def megastep_lowbit_decode(x: jax.Array, mp: Dict[str, jax.Array],
                           k_cache: jax.Array, v_cache: jax.Array,
                           pos: jax.Array, cos_half, sin_half, *,
                           q_dim: int, kv_dim: int, head_dim: int,
                           rotary_dim: int = 0, interleaved: bool = False,
                           eps: float = 1e-5, rms_offset: float = 0.0,
                           scale: float = 1.0, act: str = "silu",
                           block_t: int = 128, bits: int = 3,
                           softcap: float = 0.0, windows=None,
                           rope_sel=None, lm=None, ablate: str = "none",
                           qkv_cap_mb: int = 12, walsh: int = 0,
                           interpret: bool = False):
    """One full W4A8/W3A8/W2A8 decode step over all layers. Same contract
    as ``megastep4_decode``; ``mp`` from :func:`megapack_lowbit`.

    ``walsh`` (with bits=3): serve true per-row 8-entry LUT codebooks at
    3 bits/weight via the Walsh plane expansion (``mp`` from
    :func:`megapack_walsh`; walsh = number of monomial planes, 7 = exact
    arbitrary codebook). Scale operands become coefficient rows
    [L, 8, width] f32 and the group walk becomes a column-chunk walk.

    ``lm`` (optional): ``{"w8": [V, H] int8, "scale": [NV, tv] f32,
    "norm": [1, H] f32}`` from :func:`mega_lm_operands` — folds the final
    norm + quantized unembed into the SAME kernel as trailing vocab
    phases (the lm tiles stream once, overlapped with the last layer's
    compute; saves the separate unembed program + logits round-trip).
    Returns ``(y, kn, vn, logits)`` instead of ``(y, kn, vn)``."""
    B, H = x.shape
    # 64 is the validated cap (r5): b96 measured only +2.7% throughput
    # over b64 at the 3B shape (per-step cost scales ~linearly again past
    # the MXU-pad regime) and b128 exceeds scoped VMEM (the lm-fold
    # logits output [B, V] f32 pins in VMEM beyond the estimator's view)
    if B > 64:
        raise ValueError("megastep_lowbit_decode: B <= 64")
    Bp = -(-B // 8) * 8       # per-head batch row stride (sublane multiple)
    metas, coef, nd, g_r = _plan_meta(bits)
    npl = len(metas)
    L = mp["qkv_pk"].shape[0]
    Dqkv = mp["qkv_pk"].shape[1] * g_r // npl
    d = head_dim
    Hq, Hkv = q_dim // d, kv_dim // d
    qpk = Hq // Hkv
    T = k_cache.shape[2]
    I = mp["gu_pk"].shape[1] * g_r // npl // 2

    tq = _qkv_tile_lb(Dqkv, d, g_r)
    NQ = Dqkv // tq
    Tb = min(block_t, T)
    while T % Tb:
        Tb //= 2
    NT = T // Tb
    ti, ptg = _mlp_plan(I, bits, H)
    NG = I // ti
    if walsh:
        # coef rows replace per-group scales; the "group size" becomes
        # the in-kernel column-chunk width of the walsh walks
        assert bits == 3, "walsh decode packs 3 stored bit-planes"
        gs = _walsh_csz(H, q_dim, ti)
        gtp8 = 8
    else:
        gs = H // mp["qkv_s"].shape[1]
        gtp8 = mp["dn_s"].shape[1] // NG
    Gp = mp["qkv_s"].shape[1]
    Gq = mp["o_s"].shape[1]

    # qkv tiles walked per grid step: fewer, fatter phases (each
    # sequential grid step costs ~5.5us on this runtime — PERF.md; the
    # pack layout is tile-major, so a step can cover several consecutive
    # tiles). Largest divisor whose weight block stays within its share.
    def _per_step(n_tiles, tile_bytes, cap):
        for c in range(n_tiles, 0, -1):
            if n_tiles % c == 0 and c * tile_bytes <= cap:
                return c
        return 1

    pq0 = npl * tq // g_r
    ptq = _per_step(NQ, pq0 * H, qkv_cap_mb * 1024 * 1024)
    if lm is not None:
        V = lm["w8"].shape[0]
        NV, _, tv = lm["scale"].shape
    else:
        V, NV, tv = 0, 0, 0

    # optional-feature flags (hoisted: the VMEM estimate below needs them)
    with_aperm = "ap_q" in mp
    with_lora = "la_q" in mp
    with_zp = "qkv_sz" in mp
    with_qkn = "qk_nm" in mp
    with_sand = "pa_norm" in mp
    with_win = windows is not None
    with_bias = "o_bias" in mp

    # ---- scoped-VMEM budget guard (VERDICT r4 #2). The compiler's scoped
    # allocation must fit vmem_limit_bytes; BENCH_r04 shipped a dead
    # w8a8_b32 leg because the bits=8 x B=32 plan exceeded 112 MB by
    # 340 KB and nothing caught it before the chip did. Estimate the
    # pipeline's VMEM (double-buffered streamed blocks + scratch +
    # outputs) and degrade run-time-only knobs until it fits: first Tb
    # (the B-scaled kv blocks — biggest save per added grid step), then
    # ptg, then ptq. ti itself is pack-baked (gu/dn scale layouts) and is
    # never changed here.
    po = npl * H // g_r
    BGp_ = -(-B * Hkv // 8) * 8

    def _vmem_est(ptq_, ptg_, Tb_):
        pq_ = ptq_ * pq0
        pi_ = ptg_ * (npl * ti // g_r)
        est = 2 * pq_ * H                            # qkv planes int8
        est += 2 * 2 * Gp * ptq_ * tq                # qkv scales bf16
        est += 2 * 4 * 2 * ptq_ * B * tq             # cos+sin f32
        est += 2 * 2 * 2 * (B * Hkv) * Tb_ * d       # k+v cache bf16
        est += 2 * po * q_dim                        # o planes
        est += 2 * 2 * Gq * H                        # o scales
        est += 2 * 2 * pi_ * H                       # gate+up planes
        est += 2 * 2 * Gp * ptg_ * 2 * ti            # gu scales
        est += 2 * po * ptg_ * ti                    # down planes
        est += 2 * 2 * ptg_ * gtp8 * H               # down scales
        est += 2 * 4 * (2 * H + ptq_ * tq)           # norms + qkv bias f32
        if with_zp:
            est += 2 * 4 * (Gp * ptq_ * tq + Gq * H
                            + Gp * ptg_ * 2 * ti + ptg_ * gtp8 * H)
        if with_aperm:
            est += 2 * 2 * (2 * mp["ap_q"].shape[1] * H
                            + mp["ap_o"].shape[1] * q_dim)
        if with_lora:
            rq_, ro_ = mp["la_q"].shape[1], mp["la_o"].shape[1]
            rg_, rd_ = mp["la_g"].shape[1], mp["la_d"].shape[1]
            est += 2 * 2 * (rq_ * H + ptq_ * tq * rq_ + ro_ * q_dim
                            + H * ro_ + rg_ * H + ptg_ * 2 * ti * rg_
                            + rd_ * ptg_ * ti + H * rd_)
            est += 4 * B * (rq_ + rg_ + rd_)         # xa scratch
        if with_qkn:
            est += 2 * 4 * 2 * ptq_ * tq
        if with_sand:
            est += 2 * 4 * 2 * H
        if with_bias:
            est += 2 * 4 * (2 * H + ptg_ * 2 * ti)
        if NV:
            est += 2 * (tv * H + 4 * 8 * tv) + 4 * H + 2 * 4 * B * tv
        # outputs, residual input, per-slot position rows
        est += 2 * B * H + 2 * 2 * 2 * B * kv_dim + 4 * BGp_ * 128
        est += 2 * B * H
        # scratch (x_s, x8_s, sx, qkv rows, flash acc/m/l, a8, ma)
        est += (4 * B * H + B * H + 4 * Bp * 128
                + 2 * (Hq + 2 * Hkv) * Bp * d + 4 * Hq * Bp * d
                + 2 * 4 * Hq * Bp * 128 + Bp * max(q_dim, ti) + 4 * B * H)
        if with_aperm or with_lora:
            est += 4 * Bp * q_dim
        return est

    def _down(c, n):
        for c2 in range(c - 1, 0, -1):
            if n % c2 == 0:
                return c2
        return 1

    budget = 108 * 1024 * 1024
    while _vmem_est(ptq, ptg, Tb) > budget:
        if Tb > 16:
            Tb //= 2
        elif ptg > 1:
            ptg = _down(ptg, NG)
        elif ptq > 1:
            ptq = _down(ptq, NQ)
        else:
            break
    NT = T // Tb
    NQS, NGS = NQ // ptq, NG // ptg
    P = NQS + NT + 1 + NGS

    pos_vec = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (B,))
    parts = [pos_vec, jnp.max(pos_vec)[None]]
    if rope_sel is not None:
        # per-layer rope-table selector (gemma3 dual rope): index maps read
        # it from the scalar prefetch at s[B + 1 + layer]
        parts.append(jnp.asarray(rope_sel, jnp.int32))
    pos_arr = jnp.concatenate(parts)
    # per-slot positions expanded to the cache row order (row b*Hkv+g),
    # padded to a sublane multiple — a VMEM vector operand for the flash
    # mask (SMEM scalars cannot form a vector inside Mosaic). 128 lanes
    # because that is Mosaic's minimum last-dim tile for a VMEM block
    # (a (BGp, 8) block would fail lane alignment); the kernel reads lane
    # 0 only and the redundant lanes cost ~128 KB of VMEM, not HBM
    # bandwidth per step (constant index map -> fetched once).
    BGp = -(-B * Hkv // 8) * 8
    pos_bg = jnp.broadcast_to(
        jnp.pad(jnp.repeat(pos_vec, Hkv), (0, BGp - B * Hkv))[:, None],
        (BGp, 128))

    rd = rotary_dim or 0
    if rd:
        ch = jnp.asarray(cos_half, jnp.float32)
        sh = jnp.asarray(sin_half, jnp.float32)
        if ch.ndim == 1:
            ch = jnp.broadcast_to(ch[None, :], (B, ch.shape[0]))
            sh = jnp.broadcast_to(sh[None, :], (B, sh.shape[0]))
        if ch.ndim == 2:          # single rope table -> leading table axis
            ch, sh = ch[None], sh[None]
        # rot is computed in-kernel via lane rolls (_rope_rot) — only the
        # per-row cos/sin masks stream; the [tq, tq] R matrix is gone.
        # Dual-rope models (gemma3) pass [2, B, half] tables; the per-layer
        # selector (rope_sel) picks the block via the scalar prefetch.
        tabs = [_rope_rows(Dqkv, tq, d, rd, interleaved, q_dim + kv_dim,
                           ch[r], sh[r])[1:] for r in range(ch.shape[0])]
        cos_t = jnp.stack([c for c, _ in tabs])       # [NRt, NQ, B, tq]
        sin_t = jnp.stack([s for _, s in tabs])
    else:
        cos_t = jnp.ones((1, NQ, B, tq), jnp.float32)
        sin_t = jnp.zeros((1, NQ, B, tq), jnp.float32)

    def _l(t):
        return jnp.minimum(t // P, L - 1)

    def _p(t):
        return t - _l(t) * P

    def qi(t, s):
        return jnp.clip(_p(t), 0, NQS - 1)

    def fb(t, s):
        tb = jnp.clip(_p(t) - NQS, 0, NT - 1)
        return jnp.minimum(tb, jnp.maximum(s[B] - 1, 0) // Tb)

    def gi(t, s):
        return jnp.clip(_p(t) - NQS - NT - 1, 0, NGS - 1)

    def vi(t, s):
        # held at tile 0 through the layer steps (fetched once, reused),
        # then walks the vocab tiles on the trailing steps
        return jnp.clip(t - L * P, 0, max(NV - 1, 0))

    if rope_sel is not None:
        def rsel(t, s):
            return s[B + 1 + _l(t)]
    else:
        def rsel(t, s):
            return 0

    pq = ptq * pq0                # packed qkv rows per grid step
    po = npl * H // g_r           # packed rows of o / down (tile = H)
    pi = ptg * (npl * ti // g_r)  # packed gate/up rows per grid step
    in_specs = [
        pl.BlockSpec((B, H), lambda t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, H), lambda t, s: (_l(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, H), lambda t, s: (_l(t), 0, 0),
                     memory_space=pltpu.VMEM),
        # qkv packed [L, NP*Dqkv/g_r, H]: tile t rows [t*pq, (t+1)*pq)
        pl.BlockSpec((1, pq, H), lambda t, s: (_l(t), qi(t, s), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Gp, ptq * tq),
                     lambda t, s: (_l(t), 0, qi(t, s)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ptq * tq),
                     lambda t, s: (_l(t), 0, qi(t, s)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ptq, B, tq),
                     lambda t, s: (rsel(t, s), qi(t, s), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ptq, B, tq),
                     lambda t, s: (rsel(t, s), qi(t, s), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B * Hkv, Tb, d),
                     lambda t, s: (_l(t), 0, fb(t, s), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B * Hkv, Tb, d),
                     lambda t, s: (_l(t), 0, fb(t, s), 0),
                     memory_space=pltpu.VMEM),
        # o packed [L, NP*H/g_r, q_dim] (output-row planes)
        pl.BlockSpec((1, po, q_dim), lambda t, s: (_l(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Gq, H), lambda t, s: (_l(t), 0, 0),
                     memory_space=pltpu.VMEM),
        # gate packed tiles [0, NG), up tiles [NG, 2NG) of gu_pk:
        # a grid step covers ptg consecutive tiles, so up's first
        # ptg-tile block sits NGS block-strides in
        pl.BlockSpec((1, pi, H), lambda t, s: (_l(t), gi(t, s), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, pi, H),
                     lambda t, s: (_l(t), gi(t, s) + NGS, 0),
                     memory_space=pltpu.VMEM),
        # gate+up scales [L, Gp, 2I] tile-major (gate tile then up tile)
        pl.BlockSpec((1, Gp, ptg * 2 * ti),
                     lambda t, s: (_l(t), 0, gi(t, s)),
                     memory_space=pltpu.VMEM),
        # down packed [L, NP*H/g_r, I]: step cols [gi*ptg*ti, ...)
        pl.BlockSpec((1, po, ptg * ti),
                     lambda t, s: (_l(t), 0, gi(t, s)),
                     memory_space=pltpu.VMEM),
        # down scales, tile-major padded rows [L, NG*gtp, H]; walsh: the
        # 8 coefficient rows [L, 8, H], fetched once per layer
        (pl.BlockSpec((1, 8, H), lambda t, s: (_l(t), 0, 0),
                      memory_space=pltpu.VMEM)
         if walsh else
         pl.BlockSpec((1, ptg * gtp8, H),
                      lambda t, s: (_l(t), gi(t, s), 0),
                      memory_space=pltpu.VMEM)),
        # per-slot positions in cache row order (row b*Hkv+g = pos[b]) —
        # the flash mask reads a VECTOR; Mosaic cannot build one from
        # SMEM scalars (infer-vector-layout: unsupported shape cast)
        pl.BlockSpec((BGp, 128), lambda t, s: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    with_aperm = "ap_q" in mp
    aperm_ops = []
    if with_aperm:
        # Beneš routing masks [L, S, n] bf16 (qkv / gate-up over H, o over
        # q_dim) — fetched once per layer; ~(2*log2(H)-1)*H*2 bytes each
        S_h = mp["ap_q"].shape[1]
        S_o = mp["ap_o"].shape[1]
        in_specs += [
            pl.BlockSpec((1, S_h, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_h, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_o, q_dim), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        aperm_ops = [mp["ap_q"], mp["ap_g"], mp["ap_o"]]
    with_lora = "la_q" in mp
    lora_ops = []
    if with_lora:
        # EoRA rank-r factors: A's fetched once per layer, B's sliced in
        # step with the qkv / MLP tile walk (fused epilogue, VERDICT r2 #4d)
        rq, ro = mp["la_q"].shape[1], mp["la_o"].shape[1]
        rg, rdn = mp["la_g"].shape[1], mp["la_d"].shape[1]
        in_specs += [
            pl.BlockSpec((1, rq, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ptq * tq, rq),
                         lambda t, s: (_l(t), qi(t, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ro, q_dim), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, ro), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rg, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ptg * 2 * ti, rg),
                         lambda t, s: (_l(t), gi(t, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rdn, ptg * ti),
                         lambda t, s: (_l(t), 0, gi(t, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, rdn), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        lora_ops = [mp["la_q"], mp["lb_q"], mp["la_o"], mp["lb_o"],
                    mp["la_g"], mp["lb_g"], mp["la_d"], mp["lb_d"]]
    with_zp = "qkv_sz" in mp
    zp_ops = []
    if with_zp:
        # asym zero-point corrections: f32, same layouts as the scales
        in_specs += [
            pl.BlockSpec((1, Gp, ptq * tq),
                         lambda t, s: (_l(t), 0, qi(t, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gq, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp, ptg * 2 * ti),
                         lambda t, s: (_l(t), 0, gi(t, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ptg * gtp8, H),
                         lambda t, s: (_l(t), gi(t, s), 0),
                         memory_space=pltpu.VMEM),
        ]
        zp_ops = [mp["qkv_sz"], mp["o_sz"], mp["gu_sz"], mp["dn_sz"]]
    with_qkn = "qk_nm" in mp
    qkn_ops = []
    if with_qkn:
        # [L, 2, Dqkv]: row 0 = per-lane norm weight (q/k heads tiled),
        # row 1 = apply mask (0 on v lanes) — sliced in step with qkv tiles
        in_specs += [
            pl.BlockSpec((1, 2, ptq * tq),
                         lambda t, s: (_l(t), 0, qi(t, s)),
                         memory_space=pltpu.VMEM),
        ]
        qkn_ops = [mp["qk_nm"]]
    with_sand = "pa_norm" in mp
    sand_ops = []
    if with_sand:
        # gemma2/3 sandwich norms: post-attention / post-feedforward RMS
        # on the sublayer OUTPUT before its residual add
        in_specs += [
            pl.BlockSpec((1, 1, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        sand_ops = [mp["pa_norm"], mp["pm_norm"]]
    with_win = windows is not None
    win_ops = []
    if with_win:
        # per-layer sliding windows (full layers carry w = T, a no-op)
        in_specs += [
            pl.BlockSpec((1, 128), lambda t, s: (_l(t), 0),
                         memory_space=pltpu.VMEM),
        ]
        win_ops = [jnp.broadcast_to(
            jnp.asarray(windows, jnp.int32)[:, None], (L, 128))]
    with_bias = "o_bias" in mp
    bias_ops = []
    if with_bias:
        # o / gate+up / down biases — operands exist only for models that
        # have them (megapack_lowbit gates the keys)
        in_specs += [
            pl.BlockSpec((1, 1, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ptg * 2 * ti),
                         lambda t, s: (_l(t), 0, gi(t, s)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda t, s: (_l(t), 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        bias_ops = [mp["o_bias"], mp["gu_bias"], mp["dn_bias"]]
    out_specs = [
        pl.BlockSpec((B, H), lambda t, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, kv_dim), lambda t, s: (_l(t), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, kv_dim), lambda t, s: (_l(t), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, H), x.dtype),
        jax.ShapeDtypeStruct((L, B, kv_dim), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, B, kv_dim), jnp.bfloat16),
    ]
    lm_ops = []
    if NV:
        in_specs += [
            # lm_head int8 rows [V, H]: one (tv, H) tile per vocab step
            pl.BlockSpec((tv, H), lambda t, s: (vi(t, s), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tv), lambda t, s: (vi(t, s), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda t, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs.append(pl.BlockSpec((B, tv), lambda t, s: (0, vi(t, s)),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, V), jnp.float32))
        lm_ops = [lm["w8"], lm["scale"].astype(jnp.float32),
                  lm["norm"].astype(jnp.float32).reshape(1, H)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L * P + NV,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.int8),
            pltpu.VMEM((Bp, 128), jnp.float32),
            pltpu.VMEM(((Hq + 2 * Hkv) * Bp, d), jnp.bfloat16),
            pltpu.VMEM((Hq * Bp, d), jnp.float32),
            pltpu.VMEM((Hq * Bp, 128), jnp.float32),
            pltpu.VMEM((Hq * Bp, 128), jnp.float32),
            pltpu.VMEM((Bp, max(q_dim, ti)), jnp.int8),
            pltpu.VMEM((B, H), jnp.float32),
        ] + ([pltpu.VMEM((Bp, q_dim), jnp.float32)]
             if (with_aperm or with_lora) else [])
          + ([pltpu.VMEM((B, mp["la_q"].shape[1]), jnp.float32),
              pltpu.VMEM((B, mp["la_g"].shape[1]), jnp.float32),
              pltpu.VMEM((B, mp["la_d"].shape[1]), jnp.float32)]
             if with_lora else []),
    )
    weight_bytes = (L * (Dqkv * H + q_dim * H + 3 * I * H) * bits) // 8
    out = pl.pallas_call(
        functools.partial(
            _megastep_lb_kernel, B=B, d=d, Hq=Hq, Hkv=Hkv, qpk=qpk, NQ=NQ,
            NT=NT, NG=NG, Tb=Tb, tq=tq, ti=ti, gs=gs, L=L, eps=eps,
            rms_offset=rms_offset, scale=scale, act=act, bits=bits,
            rd=rd, interleaved=interleaved,
            ptq=ptq, ptg=ptg, gtp8k=gtp8, NV=NV, with_bias=with_bias,
            Bp=Bp, with_aperm=with_aperm, with_lora=with_lora,
            with_zp=with_zp, with_qkn=with_qkn,
            softcap=float(softcap or 0.0), with_sand=with_sand,
            with_win=with_win, ablate=ablate, walsh=walsh),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (Dqkv * H + q_dim * H + 3 * I * H)
            + 4 * B * L * Hq * T * d + 2 * B * V * H,
            bytes_accessed=weight_bytes + 2 * L * B * T * Hkv * d * 2
            + V * H,
            transcendentals=B * L * (Hq * T + I),
        ),
        interpret=interpret,
    )(pos_arr, x, mp["attn_norm"], mp["mlp_norm"],
      mp["qkv_pk"], mp["qkv_s"], mp["qkv_bias"],
      cos_t, sin_t,
      k_cache, v_cache, mp["o_pk"], mp["o_s"],
      mp["gu_pk"], mp["gu_pk"], mp["gu_s"], mp["dn_pk"], mp["dn_s"],
      pos_bg, *aperm_ops, *lora_ops, *zp_ops, *qkn_ops, *sand_ops,
      *win_ops, *bias_ops, *lm_ops)
    return tuple(out)


# --------------------------------------------------------------- pack + gate
def _plane_pack(codes, tile: int, bits: int):
    """[R, K] int codes -> [NP*R/g_r, K] int8 plane bytes, tile-major: tile
    t's planes at rows [t*NP*tile/g_r, ...), plane p's field f holding the
    tile's row block [f*tile/g_r, (f+1)*tile/g_r). Top field per plane is
    stored XOR its sign bit (signed read = field - 2^(w-1)). Pure jnp so
    packing traces under jit (numpy passthrough for tests)."""
    xp = np if isinstance(codes, np.ndarray) else jnp
    plan = _PLAN[bits]
    g_r = max(r for segs in plan for (r, _, _) in segs) + 1
    R, K = codes.shape
    tF = tile // g_r
    c = codes.reshape(R // tile, g_r, tF, K)
    planes = []
    for segs in plan:
        byte = None
        for j, (row, shift, w) in enumerate(segs):
            v = (c[:, row] >> shift) & ((1 << w) - 1)
            if j == 0:
                v = v ^ (1 << (w - 1))
            byte = v if byte is None else (byte << w) | v
        planes.append(byte)
    out = xp.stack(planes, axis=1)                  # [R/tile, NP, tF, K]
    out = out.reshape(R // tile * len(plan) * tF, K)
    return ((out.astype(xp.int32) + 128) % 256 - 128).astype(xp.int8)


def _gidx_perm(g_idx_l, gs: int):
    """Stable group-contiguous column order for one layer's g_idx, or None
    if already sequential. Raises on unbalanced groups (every group must
    hold exactly gs columns — true for any perm-derived act order)."""
    gi = np.asarray(g_idx_l, np.int64)
    n = gi.shape[0]
    if np.array_equal(gi, np.arange(n) // gs):
        return None
    counts = np.bincount(gi, minlength=n // gs)
    if counts.shape[0] != n // gs or not np.all(counts == gs):
        raise ValueError("act-order g_idx with unbalanced groups")
    return np.argsort(gi, kind="stable").astype(np.int32)


def actorder_transform(cfg, sp: Dict[str, Any], bits: int):
    """Bake act-order (``g_idx``) artifacts onto the plane-kernel fast path
    (VERDICT r2 #4b — the exllama column_remap analog,
    reference ``gptqmodel_ext/exllama/cuda_func/column_remap.cu``).

    Returns ``(tsp, masks)``: a pack-only copy of ``sp`` whose qkv/o/
    gateup/down columns are sorted group-contiguous (g_idx dropped), plus
    the Beneš lane-routing masks (ops/lane_perm) the kernel applies to the
    matching activations at run time. down's remap is purely pack-time:
    its input is the gate/up OUTPUT rows, which are permuted to match —
    no runtime work. ``masks`` is empty when nothing carries g_idx; the
    ORIGINAL ``sp`` must keep serving every non-megastep path (its
    artifacts still carry g_idx and expect unpermuted activations)."""
    from .lane_perm import benes_masks, benes_strides
    from .packing import pack_int_rows, unpack_int_rows
    from .qlinear import QLinear

    ls = sp["layers_stacked"]
    qkv, o = ls["attn"]["qkv"], ls["attn"]["o"]
    gu, dn = ls["mlp"]["gateup"], ls["mlp"]["down"]
    mats = {"qkv": qkv, "o": o, "gu": gu, "dn": dn}
    if not any("g_idx" in m.arrays for m in mats.values()):
        return sp, {}
    L = qkv["qweight"].shape[0]

    def perms_of(m):
        if "g_idx" not in m.arrays:
            return None
        gs = m.in_features // m.arrays["scales"].shape[2]
        gi = np.asarray(m["g_idx"])
        if gi.ndim == 1:                       # shared across layers
            gi = np.broadcast_to(gi, (L, gi.shape[0]))
        out = [_gidx_perm(gi[l], gs) for l in range(L)]
        return None if all(p is None for p in out) else out

    perms = {k: perms_of(m) for k, m in mats.items()}

    def perm_arr(per, n):
        return jnp.asarray(np.stack([
            p if p is not None else np.arange(n, dtype=np.int32)
            for p in per]))

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def permute_cols(qw, pa, bits, n):
        def one(args):
            qw_l, p_l = args
            codes = unpack_int_rows(qw_l, bits, n)
            return pack_int_rows(jnp.take(codes, p_l, axis=1), bits)
        return jax.lax.map(one, (qw, pa))

    def rewrite(m, col_perm, row_perm=None):
        arrays = dict(m.arrays)
        arrays.pop("g_idx", None)
        if col_perm is not None:
            pa = perm_arr(col_perm, m.in_features)
            arrays["qweight"] = permute_cols(m["qweight"], pa,
                                             m.bits, m.in_features)
            if "lora_a" in arrays:
                # adapter input columns follow the weight's sorted order
                # (the kernel computes x@A.T from the PERMUTED activation)
                arrays["lora_a"] = jnp.take_along_axis(
                    arrays["lora_a"], pa[:, None, :], axis=2)
        if row_perm is not None:
            # gate/up output rows follow down's input order: both halves
            # of the stacked [2I] row axis get the same per-layer perm.
            # "zeros" rides along (asym artifacts: sz = scale*(center-zero)
            # is per OUTPUT row-group and must stay aligned with scales)
            I = m["scales"].shape[1] // 2
            rp = perm_arr(row_perm, I)
            full = jnp.concatenate([rp, rp + I], axis=1)     # [L, 2I]
            for k in ("qweight", "scales", "zeros", "lora_b"):
                if k in arrays:
                    arrays[k] = jnp.take_along_axis(
                        arrays[k], full[:, :, None], axis=1)
            if "bias" in arrays:
                arrays["bias"] = jnp.take_along_axis(arrays["bias"], full,
                                                     axis=1)
        return QLinear(m.kind, arrays, m.bits, m.in_features)

    masks = {}

    def runtime_masks(per, n):
        if per is None:
            return None
        if n & (n - 1):
            raise ValueError("act-order runtime remap needs power-of-two "
                             f"lane count, got {n}")
        S = len(benes_strides(n))
        out = np.zeros((L, S, n), np.float32)
        for l, p in enumerate(per):
            if p is not None:
                out[l] = benes_masks(p)
        return jnp.asarray(out, jnp.bfloat16)        # 0/1: exact in bf16

    mq = runtime_masks(perms["qkv"], cfg.hidden_size)
    mg = runtime_masks(perms["gu"], cfg.hidden_size)
    mo = runtime_masks(perms["o"], cfg.q_dim)
    if mq is not None or mg is not None or mo is not None:
        S_h = len(benes_strides(cfg.hidden_size))
        S_o = len(benes_strides(cfg.q_dim))
        zh = jnp.zeros((L, S_h, cfg.hidden_size), jnp.bfloat16)
        zo = jnp.zeros((L, S_o, cfg.q_dim), jnp.bfloat16)
        masks = {"ap_q": mq if mq is not None else zh,
                 "ap_g": mg if mg is not None else zh,
                 "ap_o": mo if mo is not None else zo}

    new_attn = dict(ls["attn"])
    new_mlp = dict(ls["mlp"])
    new_attn["qkv"] = rewrite(qkv, perms["qkv"])
    new_attn["o"] = rewrite(o, perms["o"])
    new_mlp["gateup"] = rewrite(gu, perms["gu"], row_perm=perms["dn"])
    new_mlp["down"] = rewrite(dn, perms["dn"])
    tls = dict(ls)
    tls["attn"] = new_attn
    tls["mlp"] = new_mlp
    tsp = dict(sp)
    tsp["layers_stacked"] = tls
    return tsp, masks


def megapack_lowbit(cfg, sp: Dict[str, Any], bits: int = 3
                    ) -> Dict[str, jax.Array]:
    """Plane-packed megakernel operands from stacked UNIFORM W3/W2 layers.
    Pure jnp (traces under jit); serving calls serve.stacked.prepack once.
    Act-order artifacts must be baked first (:func:`actorder_transform` —
    needs concrete g_idx, so it cannot run under this function's jit)."""
    ls = sp["layers_stacked"]
    qkv, o = ls["attn"]["qkv"], ls["attn"]["o"]
    gu, dn = ls["mlp"]["gateup"], ls["mlp"]["down"]
    if any("g_idx" in m.arrays for m in (qkv, o, gu, dn)):
        raise ValueError("megapack_lowbit: act-order artifacts must go "
                         "through serve.stacked.prepack (actorder_transform"
                         " needs concrete g_idx values)")
    H = cfg.hidden_size
    d = cfg.head_dim
    L = qkv["qweight"].shape[0]
    _, _, _, g_r = _plan_meta(bits)

    from .packing import unpack_int_rows

    Dq_all = qkv["scales"].shape[1]
    I = gu["scales"].shape[1] // 2
    tq = _qkv_tile_lb(Dq_all, d, g_r)
    ti, _ = _mlp_plan(I, bits, H)        # must match the kernel's tiling

    # per-layer sequential packing (lax.map): int32 unpack temporaries for
    # ONE layer at a time (whole-model unpack would be several GB of int32)
    def map_rows(m, tile, lo=None, hi=None):
        def one(qw_l):
            codes = unpack_int_rows(qw_l, bits, m.in_features)
            if lo is not None:
                codes = codes[lo:hi]
            return _plane_pack(codes, tile, bits)
        return jax.lax.map(one, m["qweight"])

    qkv_pk = map_rows(qkv, tq)
    o_pk = map_rows(o, H)              # one tile = whole output dim
    gate_pk = map_rows(gu, ti, 0, I)
    up_pk = map_rows(gu, ti, I, 2 * I)
    dn_pk = map_rows(dn, H)

    gs_w = dn.in_features // dn["scales"].shape[2]
    gti = ti // gs_w
    gtp = -(-gti // 8) * 8
    NGt = I // ti

    def _dn_layout(dsc):
        """[L, Gi, H] -> tile-major rows padded to a sublane multiple."""
        dsc = dsc.reshape(dsc.shape[0], NGt, gti, H)
        if gtp != gti:
            dsc = jnp.pad(dsc, ((0, 0), (0, 0), (0, gtp - gti), (0, 0)))
        return dsc.reshape(dsc.shape[0], NGt * gtp, H)

    def _gu_layout(gsc):
        """[L, G, 2I] -> tile-major cols (gate tile then up tile)."""
        sg, su = gsc[:, :, :I], gsc[:, :, I:]
        blocks = []
        for t in range(I // ti):
            blocks.append(sg[:, :, t * ti:(t + 1) * ti])
            blocks.append(su[:, :, t * ti:(t + 1) * ti])
        return jnp.concatenate(blocks, axis=2)

    # scales bf16 (HBM stream halved; rounding far below the int3 step)
    qsc = jnp.swapaxes(qkv["scales"].astype(jnp.bfloat16), 1, 2)  # [L,G,Dq]
    osc = jnp.swapaxes(o["scales"].astype(jnp.bfloat16), 1, 2)    # [L,Gq,H]
    gsc = jnp.swapaxes(gu["scales"].astype(jnp.bfloat16), 1, 2)   # [L,G,2I]
    dsc = _dn_layout(jnp.swapaxes(dn["scales"].astype(jnp.bfloat16), 1, 2))
    gu_s = _gu_layout(gsc)

    out = {
        "qkv_pk": qkv_pk, "qkv_s": qsc,
        "o_pk": o_pk, "o_s": osc,
        "gu_pk": jnp.concatenate([gate_pk, up_pk], axis=1), "gu_s": gu_s,
        "dn_pk": dn_pk, "dn_s": dsc,
    }
    out.update(_common_pack_ops(cfg, ls, qkv, o, gu, dn, L, H, Dq_all,
                                I, ti))
    # asymmetric (zero-point) artifacts: per-(group, output-col) correction
    # sz = scale * (2^(b-1) - zero), streamed f32 alongside the scales
    # (VERDICT r3 #4 — the marlin/exllamav2 zp-path analog, reference
    # gptqmodel_ext/exllamav2/cuda/quant/qdq_4.cuh). The kernel adds
    # sz * S per group (S = the group's int8 activation sum); f32 because
    # |S| reaches 127*gs and bf16 rounding of sz would cost ~1 ulp of the
    # OUTPUT at worst case. Ecosystem gptq-v1 sym=False checkpoints ride
    # the fast path through this.
    if any("zeros" in m.arrays for m in (qkv, o, gu, dn)):
        center = float(1 << (bits - 1))

        def _sz(m):
            s = m["scales"].astype(jnp.float32)
            if "zeros" not in m.arrays:
                return jnp.zeros_like(s)
            return s * (center - m["zeros"].astype(jnp.float32))

        out["qkv_sz"] = jnp.swapaxes(_sz(qkv), 1, 2)
        out["o_sz"] = jnp.swapaxes(_sz(o), 1, 2)
        out["gu_sz"] = _gu_layout(jnp.swapaxes(_sz(gu), 1, 2))
        out["dn_sz"] = _dn_layout(jnp.swapaxes(_sz(dn), 1, 2))
    return out


def _common_pack_ops(cfg, ls, qkv, o, gu, dn, L: int, H: int, Dq_all: int,
                     I: int, ti: int) -> Dict[str, jax.Array]:
    """Megastep operands shared by every pack flavor (uniform lowbit and
    walsh LUT): norms, qkv bias, qk-norm rows, gemma sandwich norms,
    optional o/gate-up/down biases, EoRA adapter factors."""
    d = cfg.head_dim
    bias = qkv.arrays.get("bias")
    if bias is None:
        bias = jnp.zeros((L, Dq_all), jnp.float32)
    out = {
        "qkv_bias": jnp.asarray(bias, jnp.float32).reshape(L, 1, Dq_all),
        "attn_norm": ls["input_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H),
        "mlp_norm": ls["post_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H),
    }
    # qk-norm operand (qwen3/gemma3 per-head RMS, VERDICT r3 #6): lane-
    # expanded weight row (q heads tile q_norm, k heads k_norm, v lanes 1)
    # plus an apply-mask row; streamed once per layer at 8 bytes/lane
    qn_mod = ls["attn"].get("q_norm")
    if qn_mod is not None and cfg.qk_norm in (True, "head"):
        kvd_ = (Dq_all - cfg.q_dim) // 2
        Hq_, Hkv_ = cfg.q_dim // d, kvd_ // d
        qqn = qn_mod["weight"].astype(jnp.float32)          # [L, d]
        kkn = ls["attn"]["k_norm"]["weight"].astype(jnp.float32)
        w_row = jnp.concatenate(
            [jnp.tile(qqn, (1, Hq_)), jnp.tile(kkn, (1, Hkv_)),
             jnp.ones((L, kvd_), jnp.float32)], axis=1)
        m_row = jnp.concatenate(
            [jnp.ones((L, cfg.q_dim + kvd_), jnp.float32),
             jnp.zeros((L, kvd_), jnp.float32)], axis=1)
        out["qk_nm"] = jnp.stack([w_row, m_row], axis=1)    # [L, 2, Dqkv]
    if cfg.sandwich_norm and "post_attn_norm" in ls:
        # gemma2/3 sandwich norms ride as per-layer operands
        out["pa_norm"] = ls["post_attn_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H)
        out["pm_norm"] = ls["post_mlp_norm"]["weight"].astype(
            jnp.float32).reshape(L, 1, H)
    # o/gate-up/down biases stream into the kernel as extra operands ONLY
    # when the model has any (VERDICT r2 #4c); bias-free models compile
    # the leaner program
    if any("bias" in mod.arrays for mod in (o, gu, dn)):
        def _bias3(mod, width):
            b = mod.arrays.get("bias")
            if b is None:
                b = jnp.zeros((L, width), jnp.float32)
            return jnp.asarray(b, jnp.float32).reshape(L, 1, width)

        # gate/up bias rearranged tile-major like gu_s: [gate_t | up_t]
        gub = gu.arrays.get("bias")
        if gub is None:
            gub = jnp.zeros((L, 2 * I), jnp.float32)
        gub = jnp.asarray(gub, jnp.float32)
        out["o_bias"] = _bias3(o, H)
        out["gu_bias"] = jnp.concatenate(
            [gub[:, a * I + t * ti:a * I + (t + 1) * ti]
             for t in range(I // ti) for a in (0, 1)],
            axis=1).reshape(L, 1, 2 * I)
        out["dn_bias"] = _bias3(dn, H)
    # EoRA adapters ride the kernel as a fused rank-r epilogue (VERDICT r2
    # #4d — the exllama_eora fused-GEMM analog): lora_a/b streamed bf16,
    # applied in full precision on the pre-quantization activations.
    # Engaged only when ALL FOUR projections carry adapters (our EoRA flow
    # adapts whole subsets; a partial set means a foreign layout).
    if all("lora_a" in m.arrays for m in (qkv, o, gu, dn)):
        bf = jnp.bfloat16
        out["la_q"] = qkv["lora_a"].astype(bf)        # [L, rq, H]
        out["lb_q"] = qkv["lora_b"].astype(bf)        # [L, Dqkv, rq]
        out["la_o"] = o["lora_a"].astype(bf)          # [L, ro, q_dim]
        out["lb_o"] = o["lora_b"].astype(bf)          # [L, H, ro]
        out["la_g"] = gu["lora_a"].astype(bf)         # [L, rg, H]
        lbg = gu["lora_b"].astype(bf)                 # [L, 2I, rg]
        # tile-major rows like gu_s: [gate_t | up_t] per MLP tile
        out["lb_g"] = jnp.concatenate(
            [lbg[:, a * I + t * ti:a * I + (t + 1) * ti]
             for t in range(I // ti) for a in (0, 1)], axis=1)
        out["la_d"] = dn["lora_a"].astype(bf)         # [L, rd, I]
        out["lb_d"] = dn["lora_b"].astype(bf)         # [L, H, rd]
    return out


def megapack_walsh(cfg, sp: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Walsh-packed megakernel operands from stacked per-row 8-entry LUT
    layers (GANQ bits=3 artifacts): 3 stored bit-planes per projection
    (exactly 3 bits/weight streamed) + 8 f32 Walsh coefficient rows in
    the scale slots. Pure jnp (traces under jit); serving calls
    serve.stacked.prepack once. The kernel decodes the ARBITRARY per-row
    codebook exactly (walsh=7) — the TPU-native answer to the reference's
    LUT-mpGEMM kernels (gptqmodel/quantization/ganq.py:39-270)."""
    ls = sp["layers_stacked"]
    qkv, o = ls["attn"]["qkv"], ls["attn"]["o"]
    gu, dn = ls["mlp"]["gateup"], ls["mlp"]["down"]
    H = cfg.hidden_size
    d = cfg.head_dim
    L = qkv["lut"].shape[0]
    Dq_all = qkv["lut"].shape[1]
    I = gu["lut"].shape[1] // 2

    from .packing import unpack_int_rows

    tq = _qkv_tile_lb(Dq_all, d, 8)
    ti, _ = _mlp_plan(I, 3, H)           # must match the kernel's tiling

    def map_rows(m, tile, lo=None, hi=None):
        def one(ip_l):
            codes = unpack_int_rows(ip_l, 3, m.in_features)
            if lo is not None:
                codes = codes[lo:hi]
            return _walsh_plane_pack(codes, tile)
        return jax.lax.map(one, m["idx_packed"])

    qkv_pk = map_rows(qkv, tq)
    o_pk = map_rows(o, H)                # one tile = whole output dim
    gate_pk = map_rows(gu, ti, 0, I)
    up_pk = map_rows(gu, ti, I, 2 * I)
    dn_pk = map_rows(dn, H)

    def _gu_coef(c):
        """[L, 8, 2I] -> tile-major cols (gate tile then up tile)."""
        cg, cu = c[:, :, :I], c[:, :, I:]
        blocks = []
        for t in range(I // ti):
            blocks.append(cg[:, :, t * ti:(t + 1) * ti])
            blocks.append(cu[:, :, t * ti:(t + 1) * ti])
        return jnp.concatenate(blocks, axis=2)

    out = {
        "qkv_pk": qkv_pk, "qkv_s": walsh_coef(qkv["lut"]),
        "o_pk": o_pk, "o_s": walsh_coef(o["lut"]),
        "gu_pk": jnp.concatenate([gate_pk, up_pk], axis=1),
        "gu_s": _gu_coef(walsh_coef(gu["lut"])),
        "dn_pk": dn_pk, "dn_s": walsh_coef(dn["lut"]),
    }
    out.update(_common_pack_ops(cfg, ls, qkv, o, gu, dn, L, H, Dq_all,
                                I, ti))
    return out


def megastep_walsh_fusable(cfg, sp: Dict[str, Any]) -> bool:
    """Static capability gate for the walsh LUT megastep: homogeneous
    stacked llama-family models whose four projections are per-row
    8-entry LUT artifacts (kind="lut", bits=3 — a GANQ bits=3 solve),
    with lane-aligned walsh tiles. The arch surface (qk-norm, sandwich,
    softcap, windows, dual rope, biases, EoRA) matches the uniform plane
    gate; g_idx/zeros do not exist on lut artifacts."""
    ls = sp.get("layers_stacked")
    if ls is None:
        return False
    attn, mlp = ls.get("attn", {}), ls.get("mlp", {})
    qkv, o = attn.get("qkv"), attn.get("o")
    gu, dn = mlp.get("gateup"), mlp.get("down")
    if qkv is None or o is None or gu is None or dn is None:
        return False
    mats = (qkv, o, gu, dn)
    if any(getattr(m, "kind", None) != "lut" or m.bits != 3
           for m in mats):
        return False
    if any(m["lut"].shape[-1] != 8 for m in mats):
        return False
    from .packing import pack_factor
    for m in mats:
        # lane-padded artifacts (lut_linear Kp > K) would dequant pad
        # codes through the codebook — require exact-width packs
        if m["idx_packed"].shape[-1] * pack_factor(3) != m.in_features:
            return False
    n_lora = sum("lora_a" in m.arrays for m in mats)
    if n_lora not in (0, 4):
        return False
    if not _arch_fusable_common(cfg, ls, attn):
        return False
    H = cfg.hidden_size
    if H % 8 or (H // 8) % 128:          # o/down field blocks lane-align
        return False
    Dqkv = qkv["lut"].shape[1]
    kvd = (Dqkv - cfg.q_dim) // 2
    if cfg.q_dim + 2 * kvd != Dqkv or kvd % cfg.head_dim:
        return False
    I = gu["lut"].shape[1] // 2
    ti = _mlp_plan(I, 3, H)[0]
    if ti is None or _qkv_tile_lb(Dqkv, cfg.head_dim, 8) is None:
        return False
    return _walsh_csz(H, cfg.q_dim, ti) != 0


def mega_lm_operands(cfg, sp: Dict[str, Any], max_tile_bytes: int = 4 * 1024 * 1024):
    """Operands for the trailing-unembed fold (``lm=`` of
    :func:`megastep_lowbit_decode`), or None when the model's unembed
    cannot fold: requires a w8 (int8) lm_head, an rmsnorm final norm, and
    no project_out. logit_scale/softcap stay with the caller (applied on
    the returned logits, exactly as models/transformer.unembed does)."""
    lm = sp.get("lm_head")
    if lm is None or getattr(lm, "kind", None) != "w8":
        return None
    if "bias" in getattr(lm, "arrays", {}):
        return None
    # per-output-row scale layout only: a per-tensor or per-group w8 scale
    # would misassign scales to vocab tiles after the reshape below
    if lm["scale"].size != lm["w8"].shape[0]:
        return None
    if (not cfg.final_layer_norm or "final_norm" not in sp
            or "project_out" in sp or cfg.norm != "rmsnorm"):
        return None
    w8 = lm["w8"]
    V, H = w8.shape
    tv = None
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if V % cand == 0 and cand * H <= max_tile_bytes:
            tv = cand
            break
    if tv is None:
        return None
    # [NV, 8, tv]: sublane-broadcast so the per-tile block (1, 8, tv)
    # satisfies the TPU (8, 128) block divisibility rule (scales are tiny
    # — the 8x redundant stream is ~1 MB/step at a 32k vocab)
    scale = jnp.asarray(lm["scale"], jnp.float32).reshape(V // tv, 1, tv)
    return {"w8": w8, "scale": jnp.broadcast_to(scale, (V // tv, 8, tv)),
            "norm": jnp.asarray(sp["final_norm"]["weight"], jnp.float32)}


def _arch_fusable_common(cfg, ls, attn) -> bool:
    """Architecture surface every megastep plane kernel supports: rope
    (incl. gemma3 dual), rmsnorm pre-norm residual stacks, d=128, per-head
    qk-norm, gemma sandwich norms, softcap/sliding windows — shared by the
    uniform lowbit gate and the walsh LUT gate."""
    if cfg.head_dim != 128 or cfg.v_head_dim not in (None, cfg.head_dim):
        return False
    if cfg.clip_qkv is not None:
        return False
    # per-head qk-norm (qwen3 / gemma3-style) rides in-kernel via the
    # butterfly block-RMS (VERDICT r3 #6); other variants (flat/cohere)
    # keep the per-layer path
    if cfg.qk_norm:
        if cfg.qk_norm not in (True, "head"):
            return False
        qn, kn = attn.get("q_norm"), attn.get("k_norm")
        if qn is None or kn is None:
            return False
        if (qn["weight"].shape[-1] != cfg.head_dim
                or kn["weight"].shape[-1] != cfg.head_dim):
            return False
    if cfg.norm != "rmsnorm" or not cfg.do_layer_norm_before:
        return False
    if (cfg.norm_after_sublayer or cfg.parallel_residual
            or cfg.residual_multiplier is not None):
        return False
    # gemma2/3 sandwich norms run in-kernel (post_attn/post_mlp RMS on the
    # sublayer output); the stacked pytree must carry both weights
    if cfg.sandwich_norm and ("post_attn_norm" not in ls
                              or "post_mlp_norm" not in ls):
        return False
    # attention softcap (gemma2) is a static tanh insert in the flash
    # phase; sliding windows (gemma2/3) ride as per-layer window operands;
    # dual local/global rope (gemma3) as a second cos/sin table + selector
    if cfg.pos != "rope" or cfg.mla:
        return False
    if not cfg.gated_mlp or "moe" in ls:
        return False
    return True


def megastep_lowbit_fusable(cfg, sp: Dict[str, Any], bits: int) -> bool:
    """Static capability gate: homogeneous stacked llama-family models with
    uniform sym W4/W3/W2 weights (bits=4 is the 'w4p' plane variant — the
    pair algebra with multi-tile grid steps), sequential 128-multiple
    groups, d=128, and lane-aligned field blocks (H and the chosen tiles
    divisible by g_r*128)."""
    if bits not in _PLAN:
        return False
    _, _, _, g_r = _plan_meta(bits)
    ls = sp.get("layers_stacked")
    if ls is None:
        return False
    attn, mlp = ls.get("attn", {}), ls.get("mlp", {})
    qkv, o = attn.get("qkv"), attn.get("o")
    gu, dn = mlp.get("gateup"), mlp.get("down")
    if qkv is None or o is None or gu is None or dn is None:
        return False
    mats = (qkv, o, gu, dn)
    if any(getattr(m, "kind", None) != "uniform" or m.bits != bits
           for m in mats):
        return False
    # EoRA adapters: all-or-nothing — all four projections adapted rides
    # the fused rank-r epilogue; a partial set falls back to per-layer
    n_lora = sum("lora_a" in m.arrays for m in mats)
    if n_lora not in (0, 4):
        return False
    # act-order (g_idx) artifacts ride the Beneš activation remap
    # (actorder_transform, VERDICT r2 #4b); the runtime lane routing
    # needs power-of-two lane counts (qkv/gate-up remap H, o remaps
    # q_dim); down's remap is purely pack-time, any I works. This check
    # is structural (key presence + static dims) so it stays decidable
    # under jit; group balance is validated at prepack time on concrete
    # values (any perm-derived act order is balanced).
    def _pow2(v):
        return v & (v - 1) == 0

    if ("g_idx" in qkv.arrays or "g_idx" in gu.arrays) \
            and not _pow2(cfg.hidden_size):
        return False
    if "g_idx" in o.arrays and not _pow2(cfg.q_dim):
        return False
    # biases on any projection are streamed into the kernel (zeros
    # otherwise) — no gate needed (VERDICT r2 #4c)
    gss = set()
    for m in mats:
        # asym (zeros) artifacts ride the fast path via the streamed
        # sz = scale*(center-zero) correction (VERDICT r3 #4) — the only
        # structural requirement is the per-group layout matching scales
        if ("zeros" in m.arrays
                and m["zeros"].shape != m["scales"].shape):
            return False
        gs = m.in_features // m.arrays["scales"].shape[2]
        if gs % 128 or m.in_features % gs:
            return False
        gss.add(gs)
    if len(gss) != 1:
        return False
    # lane-aligned field blocks: o/down fields are H/g_r wide
    if cfg.hidden_size % (g_r * 128):
        return False
    if not _arch_fusable_common(cfg, ls, attn):
        return False
    Dqkv = qkv["scales"].shape[1]
    kvd = (Dqkv - cfg.q_dim) // 2
    if cfg.q_dim + 2 * kvd != Dqkv or kvd % cfg.head_dim:
        return False
    I = gu["scales"].shape[1] // 2
    if _mlp_plan(I, bits, cfg.hidden_size)[0] is None:
        return False
    return _qkv_tile_lb(Dqkv, cfg.head_dim, g_r) is not None


__all__ = ["megastep_lowbit_decode", "megapack_lowbit", "mega_lm_operands",
           "megastep_lowbit_fusable", "megastep_lowbit_reference",
           "megapack_walsh", "megastep_walsh_fusable", "walsh_coef"]
