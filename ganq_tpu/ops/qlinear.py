"""Quantized-linear parameter container and the apply dispatcher.

The TPU analog of the reference's kernel-module family
(``gptqmodel/nn_modules/qlinear/``): instead of swapping nn.Module classes, a
linear is a :class:`QLinear` pytree whose *static* metadata (kind, bits,
in_features) lives in the treedef — so jitted model functions specialize on
the quantization format exactly like XLA specializes on shapes. The
capability/auto-selection role of ``utils/importer.py:157`` lives in
``core/backend.py``.

Kinds:
- ``dense``: fp weight [out, in] (+bias) — the FAKE/oracle path
  (reference ``qlinear/fake.py``).
- ``lut``:   per-row codebook ``lut [out, 2^bits]`` + packed codes
  ``idx_packed [out, in/packfactor] (int32)`` — the real GANQ artifact.
- ``uniform``: packed codes + per-group scale/zero (+g_idx) — GPTQ family
  (reference ``qlinear/torch.py`` dequant semantics).

Every kind has a pure-jnp reference implementation here; fused Pallas kernels
(ops/lut_matmul.py, ops/uniform_matmul.py) are selected via ``backend``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import os

from .packing import pack_factor, pack_int_rows, unpack_int_rows

# token-row count at which quantized matmuls switch from the
# decode-shaped fused kernels to the dequant-once MXU GEMM (see apply()).
# MEASURED crossover on the real chip (scripts/prefill_profile.py, r5):
# at b1 the decode kernels win up to 512 rows (4958 vs 3866 tok/s at
# seq=512) and the GEMM wins from ~1024 (6906 vs 5572) — the r4 guess
# that medium buckets were misrouted was wrong; 1024 stands.
_PREFILL_GEMM_ROWS = int(os.environ.get("GANQ_PREFILL_GEMM_ROWS", "1024"))


@jax.tree_util.register_pytree_node_class
class QLinear:
    """A linear layer's parameters. ``kind``/``bits``/``in_features`` are
    static (treedef aux data); tensors live in ``arrays``."""

    def __init__(self, kind: str, arrays: Dict[str, jax.Array],
                 bits: int = 16, in_features: int = 0):
        self.kind = kind
        self.arrays = arrays
        self.bits = bits
        self.in_features = in_features

    # -- pytree protocol
    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        children = tuple(self.arrays[k] for k in keys)
        return children, (self.kind, self.bits, self.in_features, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, bits, in_features, keys = aux
        return cls(kind, dict(zip(keys, children)), bits, in_features)

    def __getitem__(self, k):
        return self.arrays[k]

    def __setitem__(self, k, v):
        self.arrays[k] = v

    def __contains__(self, k):
        return k in self.arrays

    def get(self, k, default=None):
        return self.arrays.get(k, default)

    def __repr__(self):
        shapes = {k: getattr(v, "shape", v) for k, v in self.arrays.items()}
        return f"QLinear({self.kind}, bits={self.bits}, {shapes})"

    @property
    def out_features(self) -> int:
        if self.kind == "dense":
            return self.arrays["weight"].shape[0]
        if self.kind == "lut":
            return self.arrays["lut"].shape[0]
        if self.kind == "w8":
            return self.arrays["w8"].shape[0]
        return self.arrays["qweight"].shape[0]


# ----------------------------------------------------------------- constructors
def dense_linear(weight: jax.Array, bias: Optional[jax.Array] = None) -> QLinear:
    arrays = {"weight": weight}
    if bias is not None:
        arrays["bias"] = bias
    return QLinear("dense", arrays, in_features=weight.shape[1])


def lut_linear(lut: jax.Array, idx: jax.Array, bits: int,
               bias: Optional[jax.Array] = None) -> QLinear:
    """Build a packed LUT linear from solver output.

    The codebook is sorted per row and codes remapped so the artifact is
    canonical (sorted LUTs also enable monotone-codebook kernel tricks).
    """
    order = jnp.argsort(lut, axis=1)
    rank = jnp.argsort(order, axis=1)  # old code -> new code
    lut_sorted = jnp.take_along_axis(lut, order, axis=1)
    idx_new = jnp.take_along_axis(rank, idx, axis=1)
    # pad columns so the planar plane width (K'/packfactor) meets the Mosaic
    # 128-lane constraint for any K (e.g. 11008 -> 11264); padded codes are 0
    # and the matmul entry zero-pads x to match.
    from .packing import pack_factor
    align = 128 * pack_factor(bits)
    K = idx_new.shape[1]
    Kp = -(-K // align) * align if K > align else K
    if Kp != K:
        idx_new = jnp.pad(idx_new, ((0, 0), (0, Kp - K)))
    arrays = {
        "lut": lut_sorted.astype(jnp.bfloat16),
        "idx_packed": pack_int_rows(idx_new, bits),
    }
    if bias is not None:
        arrays["bias"] = bias
    return QLinear("lut", arrays, bits=bits, in_features=idx.shape[1])


def uniform_linear(qidx: jax.Array, scale: jax.Array, zero: jax.Array,
                   g_idx: jax.Array, bits: int,
                   bias: Optional[jax.Array] = None) -> QLinear:
    """Packed uniform linear. qidx [out, in] int codes; scale/zero
    [out, n_groups]; g_idx [in] maps input column -> group.

    A trivially-sequential g_idx (``k // group_size`` — every non-desc_act
    checkpoint) is OMITTED from the arrays: sequentiality then becomes
    pytree-STRUCTURAL, so the fused-kernel dispatch in
    :func:`uniform_matmul` stays decidable under jit (a traced g_idx cannot
    be inspected at trace time). ``uniform_g_idx`` reconstructs it."""
    arrays = {
        "qweight": pack_int_rows(qidx, bits),
        "scales": scale.astype(jnp.float32),
    }
    # symmetric artifacts (every zero point == 2^(b-1)) omit the zeros
    # array: symmetry becomes pytree-STRUCTURAL, so sym-only fused kernels
    # (ops/megastep4.py) stay decidable under jit (same design as the
    # sequential-g_idx omission below)
    center = float(1 << (bits - 1))
    if isinstance(zero, jax.core.Tracer) or not bool(
            np.all(np.asarray(zero) == center)):
        arrays["zeros"] = zero.astype(jnp.float32)
    if g_idx is None:
        pass                                        # sequential, structural
    elif isinstance(g_idx, jax.core.Tracer):
        arrays["g_idx"] = g_idx.astype(jnp.int32)   # unknown: keep dynamic
    else:
        K = qidx.shape[1]
        n_groups = scale.shape[1]
        gs = -(-K // max(n_groups, 1))
        if not np.array_equal(np.asarray(g_idx), np.arange(K) // gs):
            arrays["g_idx"] = jnp.asarray(g_idx, jnp.int32)
    if bias is not None:
        arrays["bias"] = bias
    return QLinear("uniform", arrays, bits=bits, in_features=qidx.shape[1])


def uniform_zeros(p: QLinear) -> jax.Array:
    """The zero points for a uniform linear (the symmetric center when the
    array was omitted at construction)."""
    if "zeros" in p.arrays:
        return p["zeros"]
    return jnp.full_like(p["scales"], float(1 << (p.bits - 1)))


def uniform_g_idx(p: QLinear) -> jax.Array:
    """The column->group map for a uniform linear (reconstructed when the
    sequential map was omitted at construction)."""
    if "g_idx" in p.arrays:
        return p["g_idx"]
    n_groups = p["scales"].shape[1]
    gs = -(-p.in_features // max(n_groups, 1))
    return jnp.arange(p.in_features, dtype=jnp.int32) // gs


# ----------------------------------------------------------- reference dequant
def dequantize_weight(p: QLinear) -> jax.Array:
    """Materialize the fp weight [out, in] — the oracle every kernel must match
    (reference ``PackableQuantLinear.dequantize_weight``,
    qlinear/__init__.py:439-490)."""
    if p.kind == "dense":
        return p["weight"]
    if p.kind == "lut":
        idx = unpack_int_rows(p["idx_packed"], p.bits, p.in_features)
        lut = p["lut"].astype(jnp.float32)
        k = lut.shape[-1]
        if k <= 16:
            # arithmetic select tree instead of take_along_axis: a [out,
            # in] gather is scalar-indexed (slow) on TPU, while 2^bits
            # vectorized compare/selects keep prefill-time dequant on the
            # VPU (exact — every code hits one branch)
            w = jnp.zeros(idx.shape, jnp.float32)
            for s in range(k):
                w = jnp.where(idx == s, lut[..., s:s + 1], w)
            return w
        return jnp.take_along_axis(lut, idx, axis=-1)
    if p.kind == "uniform":
        qidx = unpack_int_rows(p["qweight"], p.bits, p.in_features)
        gi = uniform_g_idx(p)
        scale = p["scales"][:, gi]                  # [out, in]
        zero = uniform_zeros(p)[:, gi]
        return scale * (qidx.astype(jnp.float32) - zero)
    if p.kind == "w8":
        w = p["w8"].astype(jnp.float32) * p["scale"]
        return w[:, :p.in_features]
    raise ValueError(f"unknown qlinear kind: {p.kind}")


def apply(p: QLinear, x: jax.Array, backend: str = "reference") -> jax.Array:
    """y = x @ W^T + b for any linear kind. x: [..., in] -> [..., out]."""
    rows = 1
    for s in x.shape[:-1]:
        rows *= int(s)
    if p.kind == "dense":
        y = jnp.dot(x, p["weight"].T.astype(x.dtype))
    elif backend == "reference":
        w = dequantize_weight(p)
        y = jnp.dot(x, w.T.astype(x.dtype))
    elif backend in ("pallas", "pallas_a8") and rows >= _PREFILL_GEMM_ROWS:
        # prefill-shaped (many token rows): COMPUTE-bound, so dequantize
        # once to bf16 and ride XLA's MXU GEMM — the fused dequant kernels
        # are decode-shaped and measured 0.40x bf16 at a b8x2048 prefill
        # (VERDICT r3 #5; the reference's exllamav2/marlin switch to GEMM
        # paths at bs>1 for the same reason, q_gemm.cu). The bf16 weight
        # materializes for ONE layer at a time (~2x the packed bytes).
        # Threshold 1024, measured (scripts/prefill_profile.py r5):
        # decode kernels win 128-512 rows at b1, the GEMM from ~1024;
        # GANQ_PREFILL_GEMM_ROWS overrides. Uniform sym artifacts take a
        # bf16-NATIVE dequant (codes -> int8 -> bf16 * bf16 scales, no
        # f32 intermediates): measured 0.99-1.03x a plain bf16 GEMM per
        # matmul vs 1.02-1.08x for the f32 form (same scale-rounding
        # class as the serving kernels' bf16 scale streams).
        if (p.kind == "uniform" and "zeros" not in p.arrays
                and "g_idx" not in p.arrays
                and p.in_features % p["scales"].shape[-1] == 0):
            codes = unpack_int_rows(p["qweight"], p.bits, p.in_features)
            center = 1 << (p.bits - 1)
            c8 = (codes - center).astype(jnp.int8).astype(jnp.bfloat16)
            gs_ = p.in_features // p["scales"].shape[-1]
            sc = jnp.repeat(p["scales"].astype(jnp.bfloat16), gs_, axis=-1)
            w = c8 * sc
        else:
            w = dequantize_weight(p).astype(jnp.bfloat16)
        y = jnp.dot(x.astype(jnp.bfloat16), w.T)
    elif backend in ("pallas", "pallas_a8"):
        from . import lut_matmul, uniform_matmul, w8_matmul
        if p.kind == "lut":
            y = lut_matmul.lut_matmul(x, p["lut"], p["idx_packed"], p.bits)
        elif p.kind == "w8":
            if backend == "pallas_a8":
                y = w8_matmul.w8a8_matmul(x, p["w8"], p["scale"])
            else:
                y = w8_matmul.w8_matmul(x, p["w8"], p["scale"])
        elif backend == "pallas_a8":
            # true W4A8: packed int4 straight to the int8 MXU (QQQ-kernel
            # equivalent) — half the weight HBM traffic of the w8 path
            y = uniform_matmul.uniform_a8_matmul(
                x, p["qweight"], p["scales"], uniform_zeros(p),
                p.arrays.get("g_idx"), p.bits)
        else:
            y = uniform_matmul.uniform_matmul(
                x, p["qweight"], p["scales"], uniform_zeros(p),
                p.arrays.get("g_idx"), p.bits)
    else:
        raise ValueError(f"unknown backend: {backend}")
    if "lora_a" in p:  # EoRA low-rank correction (adapter/eora.py)
        from ..adapter.eora import apply_lora
        y = y + apply_lora(x, p["lora_a"], p["lora_b"])
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def recode_w8(p: QLinear) -> QLinear:
    """LUT or uniform linear -> per-row int8 linear (load-time fast serving
    path, see ops/w8_matmul.py). Recode error is bounded by rowrange/254 —
    the decode-throughput/accuracy trade the user opts into via
    ``optimize()``; the exact kinds keep their own fused kernels otherwise.
    Other kinds pass through unchanged."""
    if p.kind == "lut":
        from .w8_matmul import recode_lut_to_int8
        w8, scale = recode_lut_to_int8(p["lut"], p["idx_packed"], p.bits,
                                       p.in_features)
    elif p.kind == "uniform":
        w = dequantize_weight(p)                     # [out, in] f32
        if "scale_extra" in p:
            # QQQ's calibrated per-channel 8-bit scale of the ORIGINAL
            # weight (reference quantization/qqq.py:21-35) — the two-level
            # W4A8 scheme's int8 recode, instead of a post-hoc max-abs
            scale = p["scale_extra"].reshape(-1, 1).astype(jnp.float32)
            scale = jnp.maximum(scale, 1e-12)
        else:
            amax = jnp.max(jnp.abs(w), axis=1, keepdims=True)
            scale = jnp.maximum(amax, 1e-12) / 127.0
        w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    else:
        return p
    arrays = {"w8": w8, "scale": scale}
    if "bias" in p:
        arrays["bias"] = p["bias"]
    return QLinear("w8", arrays, bits=8, in_features=p.in_features)


def w8_to_uniform8(p: QLinear) -> QLinear:
    """Per-row-scale int8 linear ("w8") -> uniform bits=8 artifact.

    LOSSLESS: uniform code = w8 code + 128 (zero point 2^7 is exactly the
    per-row grid's center) and the per-row scale broadcasts across
    128-column groups. The result rides the plane megastep ("w8p",
    ops/megastep_lowbit.py bits=8): batch <= 32, multi-tile grid steps,
    trailing-unembed fold — where the per-row w8 kernel (ops/megastep.py)
    stops at batch <= 8. Non-w8 kinds pass through unchanged."""
    if p.kind != "w8":
        return p
    n = p.in_features
    if n % 128 or n % pack_factor(8):
        return p
    w8 = p["w8"][..., :n]                     # w8 arrays may be lane-padded
    codes = w8.astype(jnp.int32) + 128
    scale = jnp.asarray(p["scale"], jnp.float32)      # [..., R, 1]
    scales = jnp.broadcast_to(scale, (*scale.shape[:-1], n // 128))
    arrays = {"qweight": pack_int_rows(codes, 8), "scales": scales}
    for extra in ("bias", "lora_a", "lora_b"):
        if extra in p.arrays:
            arrays[extra] = p[extra]
    return QLinear("uniform", arrays, bits=8, in_features=n)


def recode_uniform8(p: QLinear) -> QLinear:
    """LUT linear -> uniform 8-bit artifact with per-128-column-group
    max-abs scales (the free-codebook GANQ fast-serving recode, VERDICT r3
    #2). Strictly tighter than :func:`recode_w8` (per-GROUP int8 grid vs
    per-row: recode error <= groupmax/254 instead of rowmax/254), and the
    result rides the plane megastep at batch <= 32. Call per-layer (the
    dequantized f32 weight materializes); odd widths fall back to
    :func:`recode_w8`'s artifact converted losslessly."""
    if p.kind != "lut":
        return p
    n = p.in_features
    if n % 128 or n % pack_factor(8):
        return w8_to_uniform8(recode_w8(p))
    w = dequantize_weight(p)                          # [..., R, n] f32
    gw = w.reshape(*w.shape[:-1], n // 128, 128)
    scale = jnp.maximum(jnp.max(jnp.abs(gw), axis=-1), 1e-12) / 127.0
    codes = jnp.clip(jnp.round(gw / scale[..., None]), -127, 127) + 128
    codes = codes.reshape(*w.shape[:-2], w.shape[-2], n).astype(jnp.int32)
    arrays = {"qweight": pack_int_rows(codes, 8),
              "scales": scale.astype(jnp.float32)}
    for extra in ("bias", "lora_a", "lora_b"):
        if extra in p.arrays:
            arrays[extra] = p[extra]
    return QLinear("uniform", arrays, bits=8, in_features=n)


def recode_uniform4(p: QLinear) -> QLinear:
    """bits=3 LUT linear (per-row 8-entry codebook) -> uniform bits=4
    artifact at W4 bytes: the 8 codebook VALUES snap onto the row's
    16-level affine grid (quantum = rowrange/15 ~ half the 8-codeword
    spacing) while the ASSIGNMENTS keep the Hessian-optimized GANQ solve.
    The result rides the W4 plane megastep (2.4x-class decode) through
    the asym zeros path. Lossy (snap error <= rowrange/30) — an OPT-IN
    speed recode like the affine solve constraint, but applied post-hoc
    to an unconstrained-accuracy artifact; measure the ppl cost with
    scripts/accuracy_ab.py (ganq3_free_u4snap row). Other kinds pass
    through unchanged."""
    if p.kind != "lut" or p.bits != 3:
        return p
    n = p.in_features
    if n % 128 or n % pack_factor(4):
        return p
    if p["idx_packed"].shape[-1] * pack_factor(3) != n:
        return p                     # lane-padded artifact (lut_linear)
    lut = p["lut"].astype(jnp.float32)               # [..., R, 8]
    tmin = jnp.min(lut, axis=-1)
    tmax = jnp.max(lut, axis=-1)
    s = jnp.maximum((tmax - tmin) / 15.0, 1e-12)     # [..., R]
    zero = -tmin / s                                 # v = s * (q - zero)
    q16 = jnp.clip(jnp.round((lut - tmin[..., None]) / s[..., None]),
                   0, 15).astype(jnp.int32)          # [..., R, 8]
    idx = unpack_int_rows(p["idx_packed"], 3, n)     # [..., R, n]
    # 8-way select instead of take_along_axis (gather is scalar-indexed
    # on TPU; the recode runs jitted per layer at load time)
    codes = jnp.zeros(idx.shape, jnp.int32)
    for v in range(8):
        codes = jnp.where(idx == v, q16[..., v:v + 1], codes)
    G = n // 128
    arrays = {
        "qweight": pack_int_rows(codes, 4),
        "scales": jnp.broadcast_to(s[..., None], (*s.shape, G)),
        "zeros": jnp.broadcast_to(zero[..., None], (*zero.shape, G)),
    }
    for extra in ("bias", "lora_a", "lora_b"):
        if extra in p.arrays:
            arrays[extra] = p[extra]
    return QLinear("uniform", arrays, bits=4, in_features=n)


def certify_uniform(p: QLinear, tol_rel: float = 2.0 ** -7):
    """LUT linear whose per-row codebook lies on an affine grid -> uniform
    linear (None when any row is not grid-representable).

    The solve-time affine codebook (QuantizeConfig.ganq_codebook="affine" /
    "affine_sym", quant/ganq.t_step_affine) emits ``T[r,s] = a_r + b_r
    (s - 8)`` — exactly the uniform dequant ``scale*(q - zero)`` — so the
    GANQ-LUT artifact serves through the packed-4-bit uniform kernels
    (ops/megastep4.py / megastep_lowbit.py) at W4 bytes instead of the
    exact-LUT oracle path. Certification is numeric (per-row least-squares
    fit + residual bound), so external affine-grid LUT checkpoints qualify
    too; the fit residual is bounded by ``tol_rel`` of the row range —
    default one ulp-class below the lut artifact's own bf16/fp16 codeword
    storage granularity, ~32x below the 16-codeword spacing. Rows fit with
    the zero point pinned to the symmetric center first (structural-sym
    artifacts ride the sym-only megasteps); per-row scales are expanded to
    128-column groups so the fused kernels' shared-group-size contract
    holds across projections. Host-side only (concrete arrays).
    """
    if p.kind != "lut" or getattr(p, "bits", 0) < 2:
        return None
    lut_nd = np.asarray(p["lut"], np.float32)        # [..., k] sorted
    k = lut_nd.shape[-1]
    if k != 1 << p.bits:
        return None
    lead = lut_nd.shape[:-1]        # ([m] per-layer; [L, m] stacked pytrees)
    lut = lut_nd.reshape(-1, k)
    center = float(1 << (p.bits - 1))
    u = np.arange(k, dtype=np.float32) - center            # sym basis
    uc = np.arange(k, dtype=np.float32) - (k - 1) / 2.0    # centered (sum 0)
    span = np.maximum(lut[:, -1] - lut[:, 0], np.max(np.abs(lut), axis=1))
    tol = tol_rel * np.maximum(span, 1e-30)
    # sym-constrained fit: value = b * (s - center)
    b_sym = (lut @ u) / float(u @ u)
    resid_sym = np.max(np.abs(lut - b_sym[:, None] * u[None, :]), axis=1)
    sym = bool(np.all(resid_sym <= tol))
    if sym:
        a = -0.5 * b_sym                         # in the centered basis
        b = b_sym
    else:
        # free affine LS fit in the centered basis: value = a + b * uc
        # (sum(uc) == 0 makes the row mean the exact intercept)
        a = np.mean(lut, axis=1)
        b = ((lut - a[:, None]) @ uc) / float(uc @ uc)
        resid = np.max(np.abs(lut - a[:, None] - b[:, None] * uc[None, :]),
                       axis=1)
        if not np.all(resid <= tol):
            return None
    # constant rows (b ~ 0): representable only at value 0 (scale 0)
    flat = np.abs(b) <= 1e-30
    if np.any(flat & (np.abs(a) > tol)):
        return None
    b = np.where(flat, 1e-30, b)
    n = p.in_features
    from .packing import pack_factor
    if p["idx_packed"].shape[-1] != n // pack_factor(p.bits):
        return None        # lane-padded artifact (lut_linear Kp > K):
        # the passthrough below would dequant pad codes to -scale*zero
    # per-row scale/zero expanded to 128-column groups: the megastep
    # kernels require ONE group size shared by all projections, and 128
    # divides every in_features at serving scale (scale stream cost:
    # bytes/32 of the codes). Odd widths fall back to one group per row —
    # still a valid uniform artifact, just not megastep-eligible.
    G = n // 128 if n % 128 == 0 else 1
    scale = np.broadcast_to(np.float32(b).reshape(*lead, 1), (*lead, G))
    # the LUT index planes and the uniform qweight planes share ONE
    # packed layout (ops/packing.pack_int_rows), so the code bytes pass
    # through untouched — certification costs only the [.., 2^bits] lut
    # fetch, never a device->host code round-trip (matters at 3B+: the
    # codes are GBs, the codebooks are KBs)
    arrays = {"qweight": p["idx_packed"],
              "scales": jnp.asarray(np.ascontiguousarray(scale))}
    if not sym:
        # value(s) = a + b*(s - (k-1)/2) = b*(s - zero)
        zero = np.broadcast_to(
            np.float32((k - 1) / 2.0 - a / b).reshape(*lead, 1), (*lead, G))
        arrays["zeros"] = jnp.asarray(np.ascontiguousarray(zero))
    # g_idx omitted: sequential-groups stays pytree-structural (see
    # uniform_linear); sym omits zeros the same way
    for extra in ("bias", "lora_a", "lora_b"):
        if extra in p.arrays:
            arrays[extra] = p[extra]
    return QLinear("uniform", arrays, bits=p.bits, in_features=n)


def concat_rows(linears) -> QLinear:
    """Fuse linears sharing an input (qkv, gate+up) by concatenating output
    rows — legal for every kind because all row-wise arrays (weight/lut/
    packed codes/scales) are independent per output row."""
    kinds = {p.kind for p in linears}
    bits = {p.bits for p in linears}
    if len(kinds) != 1 or len(bits) != 1:
        raise ValueError("cannot fuse linears of mixed kind/bits")
    has_lora = ["lora_a" in p.arrays for p in linears]
    if any(has_lora) and not all(has_lora):
        # rank-0 pads would change pytree structure mid-stack; our EoRA
        # flow adapts whole subsets uniformly, so mixed means foreign
        raise ValueError("cannot fuse a mix of adapted and plain linears")
    keys = linears[0].arrays.keys()
    arrays = {}
    if all(has_lora):
        # block-diagonal LoRA fusion: A' = rows-stacked A_i ([sum r, in]),
        # B' = blockdiag(B_i) ([sum out, sum r]) so each fused output
        # section sees only its own adapter — y += (x @ A'.T) @ B'.T is
        # exactly the per-linear sum (the exllama_eora fused-GEMM analog,
        # reference gptqmodel_ext/exllama_eora/q_gemm.cu)
        keys = [k for k in keys if k not in ("lora_a", "lora_b")]
        arrays["lora_a"] = jnp.concatenate([p["lora_a"] for p in linears],
                                           axis=0)
        outs = [p["lora_b"].shape[0] for p in linears]
        ranks = [p["lora_b"].shape[1] for p in linears]
        bd = jnp.zeros((sum(outs), sum(ranks)), linears[0]["lora_b"].dtype)
        o = r = 0
        for p, no, nr in zip(linears, outs, ranks):
            bd = jax.lax.dynamic_update_slice(bd, p["lora_b"], (o, r))
            o += no
            r += nr
        arrays["lora_b"] = bd
    for k in keys:
        if k == "g_idx":  # shared input-column map
            # all fused linears must agree (our looper quantizes a subset
            # with one shared Hessian so they do; a foreign checkpoint
            # with divergent per-module act orders cannot fuse)
            import numpy as _np
            g0 = _np.asarray(linears[0][k])
            if any(not _np.array_equal(g0, _np.asarray(p[k]))
                   for p in linears[1:]):
                raise ValueError("cannot fuse linears with divergent g_idx")
            arrays[k] = linears[0][k]
        else:
            arrays[k] = jnp.concatenate([p[k] for p in linears], axis=0)
    return QLinear(linears[0].kind, arrays, linears[0].bits,
                   linears[0].in_features)


__all__ = ["QLinear", "dense_linear", "lut_linear", "uniform_linear",
           "dequantize_weight", "apply", "concat_rows", "recode_w8",
           "recode_uniform4", "recode_uniform8", "w8_to_uniform8",
           "certify_uniform"]
