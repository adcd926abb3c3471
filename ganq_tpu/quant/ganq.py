"""GANQ non-uniform LUT solver (JAX/XLA).

Implements Algorithm 1 of "GANQ: GPU-Adaptive Layer-Wise LUT-Based Non-Uniform
Quantization" with the semantics of the reference implementation
(``gptqmodel/quantization/ganq.py:397-646``):

- per-row 2^bits codebook ``T`` initialized by Hinv-weighted 1-D k-means
  (LeanQuant style, ganq.py:423-438);
- K alternating iterations of
  * **S-step**: backward-substitution assignment over columns ``j=n-1..0``:
    ``idx = argmin_s |W[:,j] + r/L[j,j] - T[:,s]|`` with residual
    ``r = (W[:,j:] - Wq[:,j:]) L[j:,j-1]`` (ganq.py:533-567 / the fused Metal
    ``compute_s`` kernel ganq.py:39-270) — here a ``lax.scan`` over columns
    with the residual GEMV batched over all rows on the MXU;
  * **T-step**: least-squares codebook refit
    ``T = WH S^T (S H S^T)^+`` via batched symmetric-eigh pseudo-inverse of the
    per-row 16x16 normal matrix (the reference needs a CPU gelsd hop,
    ganq.py:576-591; we stay on-device);
- best-(T, Q) tracking by the quadratic proxy loss ``tr(E H E^T)``
  (ganq.py:621-626).

The whole solver is resident on TPU: no host round-trips inside the loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import QuantizeConfig
from ..ops.kmeans import leanquant_weights, weighted_kmeans_1d
from .preamble import prepare

HIGH = jax.lax.Precision.HIGHEST


@dataclass
class GANQResult:
    Q: jax.Array          # [m, n] fake-quantized weight, original column order
    lut: jax.Array        # [m, 2^bits] per-row codebook (fp32)
    idx: jax.Array        # [m, n] int32 codes into lut, original column order
    avg_loss: float
    quad_loss: float
    damp_used: float
    nsamples: int
    # constrained-codebook diagnostics (codebook != "free"): the free
    # codebook's quad loss on the same assignments, so the cost of the
    # affine/int8-grid constraint is reported per module (VERDICT r2 #1b:
    # "report its quad-loss vs the free codebook")
    quad_loss_free: Optional[float] = None


# --------------------------------------------------------------------- S-step
@jax.jit
def s_step(W: jax.Array, L: jax.Array, T: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sequential assignment pass. Returns (Q [m,n] int32, Werr [m,n]).

    Scan runs j = n-1 .. 0. The residual GEMV uses the full Werr matrix:
    columns < j are still zero (written back-to-front), so no masking is
    needed to reproduce ``(W[:,j:] - Wq[:,j:]) @ L[j:, j-1]``.
    """
    m, n = W.shape
    js = jnp.arange(n - 1, -1, -1)
    Ldiag = jnp.diagonal(L)[js]                   # L[j, j] per step
    Lprev = L.T[(js - 1) % n]                     # L[:, j-1] per step, [n, n]

    def step(carry, xs):
        r, Werr = carry
        j, ldiag, lprev = xs
        w_j = jax.lax.dynamic_slice(W, (0, j), (m, 1))[:, 0]
        eff = w_j + r / ldiag
        d = jnp.abs(eff[:, None] - T)             # [m, k]
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        werr_j = w_j - jnp.take_along_axis(T, idx[:, None], axis=1)[:, 0]
        Werr = jax.lax.dynamic_update_slice(Werr, werr_j[:, None], (0, j))
        r = jnp.dot(Werr, lprev, precision=HIGH)  # cols < j are zero
        return (r, Werr), idx

    init = (jnp.zeros((m,), W.dtype), jnp.zeros_like(W))
    (_, Werr), idx_seq = jax.lax.scan(step, init, (js, Ldiag, Lprev))
    Q = jnp.flip(idx_seq, axis=0).T               # [m, n] in column order
    return Q, Werr


@partial(jax.jit, static_argnames=("blk",))
def s_step_blocked(W: jax.Array, L: jax.Array, T: jax.Array,
                   blk: int = 128) -> Tuple[jax.Array, jax.Array]:
    """Blocked S-step: identical math to :func:`s_step`, restructured so the
    hot loop touches O(m*blk) instead of O(m*n) per column.

    :func:`s_step` recomputes ``r = Werr @ L[:, j-1]`` against the FULL
    error matrix every column — O(m*n) FLOPs and a full [m, n] HBM read per
    step, O(m*n^2) traffic overall (12.6 s/iteration measured at the 1B
    down-proj shape m=2048, n=8192). But ``r_c = sum_{l>c} Werr[:,l] L[l,c]``
    splits per column block [b0, b1):

      * a TRAILING part from committed blocks ``sum_{l>=b1}`` — one
        [m, n] x [n, blk] MXU matmul per block (columns < b1 of Werr are
        still zero, so the full-width dot is exact), and
      * an IN-BLOCK part maintained incrementally: after assigning column
        j = b0+t, ``acc += werr_j (outer) L[j, b0:b1]`` — O(m*blk) per
        column. L is lower-triangular, so rows already processed (c > t)
        receive only zeros and the diagonal term lands in a slot never
        read again.

    Same assignment semantics as the reference's per-column backsolve
    (gptqmodel/quantization/ganq.py:533-567); the restructure is the GPTQ
    lazy-batch trick applied to GANQ. fp summation ORDER differs from
    s_step, so near-tie argmins can flip on ~1e-7-relative distances;
    loss-equivalence is pinned by tests.
    """
    m, n = W.shape
    assert n % blk == 0, (n, blk)
    nb = n // blk

    def block(Werr, bi_rev):
        b0 = (nb - 1 - bi_rev) * blk
        Lcols = jax.lax.dynamic_slice(L, (0, b0), (n, blk))     # [n, blk]
        Rext = jnp.dot(Werr, Lcols, precision=HIGH)             # [m, blk]
        Wblk = jax.lax.dynamic_slice(W, (0, b0), (m, blk))
        Lrows = jax.lax.dynamic_slice(L, (b0, b0), (blk, blk))  # lower-tri

        def col(acc, t):
            w_j = jax.lax.dynamic_slice(Wblk, (0, t), (m, 1))[:, 0]
            ldiag = jax.lax.dynamic_slice(Lrows, (t, t), (1, 1))[0, 0]
            r = (jax.lax.dynamic_slice(Rext, (0, t), (m, 1))[:, 0]
                 + jax.lax.dynamic_slice(acc, (0, t), (m, 1))[:, 0])
            eff = w_j + r / ldiag
            d = jnp.abs(eff[:, None] - T)                       # [m, k]
            idx = jnp.argmin(d, axis=1).astype(jnp.int32)
            werr = w_j - jnp.take_along_axis(T, idx[:, None], axis=1)[:, 0]
            lrow = jax.lax.dynamic_slice(Lrows, (t, 0), (1, blk))[0]
            acc = acc + werr[:, None] * lrow[None, :]
            return acc, (idx, werr)

        ts = jnp.arange(blk - 1, -1, -1)
        _, (idx_seq, werr_seq) = jax.lax.scan(
            col, jnp.zeros((m, blk), W.dtype), ts)
        idx_blk = jnp.flip(idx_seq, axis=0).T                   # [m, blk]
        werr_blk = jnp.flip(werr_seq, axis=0).T
        Werr = jax.lax.dynamic_update_slice(Werr, werr_blk, (0, b0))
        return Werr, idx_blk

    Werr, idx_blocks = jax.lax.scan(block, jnp.zeros_like(W),
                                    jnp.arange(nb))
    # blocks were produced right-to-left: [nb, m, blk] -> [m, n]
    Q = jnp.flip(idx_blocks, axis=0).transpose(1, 0, 2).reshape(m, n)
    return Q, Werr


def s_step_reference(W, L, T):
    """Slow, obviously-correct S-step (python loop) for kernel parity tests."""
    W = np.asarray(W, np.float32)
    L = np.asarray(L, np.float32)
    T = np.asarray(T, np.float32)
    m, n = W.shape
    Q = np.zeros((m, n), np.int32)
    r = np.zeros((m,), np.float32)
    for j in range(n - 1, -1, -1):
        eff = W[:, j] + r / L[j, j]
        idx = np.argmin(np.abs(eff[:, None] - T), axis=1)
        Q[:, j] = idx
        Wq = np.take_along_axis(T, Q[:, j:], axis=1)
        r = (W[:, j:] - Wq) @ L[j:, (j - 1) % n]
    return Q


# --------------------------------------------------------------------- T-step
def _split_f32_bf16(x: jax.Array, terms: int = 3):
    """Exact-to-f32 split of a f32 array into ``terms`` bf16 summands:
    x = sum(parts) with |residual| <= 2^-8t |x|. Three terms cover the full
    24-bit f32 mantissa, so a bf16 MXU pass per term reproduces the f32
    matmul at ~3x single-pass cost instead of the 6-pass HIGHEST path."""
    parts = []
    rem = x
    for _ in range(terms - 1):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _normal_ops(Qc, WHc, Hsplit, k: int, cprec):
    """Per-row normal-equation operands (SHST [rc,k,k], WHST [rc,k]).

    Only the O(m n^2 k) first contraction runs in the requested mode (the
    one-hot factor is exactly representable in bf16, and H rides in as
    split-bf16 summands, so split mode carries full f32 precision at bf16
    MXU throughput); the k-times-smaller second/third contractions always
    run at HIGHEST f32 — their cost is ~2k/n of the first's."""
    cdt = Hsplit[0].dtype
    E = jax.nn.one_hot(Qc, k, dtype=cdt)                    # [rc, n, k]
    SH = None
    for Hc in Hsplit:
        part = jnp.einsum("rna,nl->ral", E, Hc, precision=cprec,
                          preferred_element_type=jnp.float32)  # [rc, k, n]
        SH = part if SH is None else SH + part
    Ef = E.astype(jnp.float32)                              # exact (0/1)
    SHST = jnp.einsum("ral,rlb->rab", SH, Ef, precision=HIGH)  # [rc, k, k]
    WHST = jnp.einsum("rn,rna->ra", WHc.astype(jnp.float32), Ef,
                      precision=HIGH)                          # [rc, k]
    return 0.5 * (SHST + jnp.swapaxes(SHST, 1, 2)), WHST


def _h_terms(H: jax.Array, fast):
    """The contraction operands for ``fast``: "strict" keeps the 6-pass
    HIGHEST f32 path (oracle); False/"split" is the 3-term bf16 split
    (loss-identical to f32, ~2x faster); True/"bf16" is the single-pass
    bf16 path (fastest, H rounds to 8 mantissa bits)."""
    if fast == "strict":
        return [H], HIGH
    if fast is True or fast == "bf16":
        return [H.astype(jnp.bfloat16)], jax.lax.Precision.DEFAULT
    return _split_f32_bf16(H), jax.lax.Precision.DEFAULT


@partial(jax.jit, static_argnames=("k", "row_chunk", "fast", "stats",
                                   "snap8"))
def t_step(WH: jax.Array, H: jax.Array, Q: jax.Array, k: int,
           row_chunk: int = 256, rcond: float = 16 * 1.19e-7,
           fast=False, stats: bool = False, snap8: bool = False):
    """Codebook refit: T[i] = (WH S_i^T) (S_i H S_i^T)^+ per row.

    Min-norm pseudo-inverse via symmetric eigh with a gelsd-style relative
    cutoff; rows whose codeword is unused get T entry 0 (matching the
    reference's lstsq min-norm behavior on singular S H S^T).

    ``fast`` selects the contraction precision for the O(m n^2 2^bits)
    one-hot contractions (see :func:`_h_terms`): the default split-bf16
    path is loss-identical to f32 (the 7B-scale quantization-speed fix,
    VERDICT r2 #2); ``"bf16"`` (QuantizeConfig.hessian_dtype="bfloat16")
    trades H to 8 mantissa bits for one fewer pass; ``"strict"`` is the
    6-pass HIGHEST oracle. The 16x16 solves stay f32 in all modes.

    ``stats=True`` returns ``(T, rel)`` where ``rel = sum_r(-2 t_r y_r +
    t_r A_r t_r)`` — the quadratic loss minus the iteration-constant
    tr(W H W^T), computed from the ALREADY-BUILT normal operands. The
    alternating loop tracks best-(T, Q) with this instead of a dense
    O(m n^2) quad_loss evaluation + host sync per iteration (the round-3
    quantization-throughput fix). ``snap8=True`` snaps t onto the per-row
    int8 grid INSIDE the chunk (codebook="lut8") so rel scores the
    snapped codebook actually kept.
    """
    m, n = Q.shape
    pad = (-m) % row_chunk
    Qp = jnp.pad(Q, ((0, pad), (0, 0)))
    WHp = jnp.pad(WH, ((0, pad), (0, 0)))
    Hsplit, cprec = _h_terms(H, fast)

    def solve_chunk(args):
        Qc, WHc = args                             # [rc, n], [rc, n]
        SHST, WHST = _normal_ops(Qc, WHc, Hsplit, k, cprec)
        lam, V = jnp.linalg.eigh(SHST)             # ascending eigenvalues
        cutoff = rcond * jnp.maximum(lam[:, -1:], 0.0)
        inv = jnp.where(lam > cutoff, 1.0 / jnp.where(lam > cutoff, lam, 1.0), 0.0)
        # T = WHST @ V diag(inv) V^T
        t = jnp.einsum("ra,rab,rb,rcb->rc", WHST, V, inv, V, precision=HIGH)
        if snap8:
            b = jnp.maximum(jnp.max(jnp.abs(t), axis=1, keepdims=True),
                            1e-30) / 127.0
            t = jnp.clip(jnp.round(t / b), -127, 127) * b
        if not stats:
            return t
        rel = (jnp.einsum("ra,rab,rb->", t, SHST, t, precision=HIGH)
               - 2.0 * jnp.sum(t * WHST))
        return t, rel

    chunks = (Qp.reshape(-1, row_chunk, n), WHp.reshape(-1, row_chunk, n))
    out = jax.lax.map(solve_chunk, chunks)
    if not stats:
        return out.reshape(-1, k)[:m]
    T, rels = out
    return T.reshape(-1, k)[:m], jnp.sum(rels)


@partial(jax.jit, static_argnames=("k", "row_chunk", "fast", "sym",
                                   "stats"))
def t_step_affine(WH: jax.Array, H: jax.Array, Q: jax.Array, k: int,
                  row_chunk: int = 256, fast=False,
                  sym: bool = False, stats: bool = False):
    """Affine-constrained codebook refit: ``T[r, s] = a_r + b_r (s - c)``
    with center ``c = 2^(bits-1)`` — the per-row 4-bit *grid* that serves
    losslessly through the uniform megastep kernels at W4 bytes (the
    solve-time certified affine recode of VERDICT r2 #1b).

    Minimizing ``(w - T S) H (T S - w)^T`` over (a, b) given the assignment
    S is a per-row 2x2 normal system in the span {1, u} of the free
    codebook's normal equations: with A = S H S^T and y = S (WH)^T,

        [1A1  1Au] [a]   [1y]
        [uA1  uAu] [b] = [uy],    u_s = s - c .

    ``sym=True`` pins a = 0 (symmetric grid, zero point exactly 2^(b-1)) —
    a 1x1 solve. Degenerate rows (all mass in one codeword) fall back to
    b = 0 with a = the weighted mean. Reference for the GANQ T-step this
    constrains: gptqmodel/quantization/ganq.py:576-616.
    """
    m, n = Q.shape
    pad = (-m) % row_chunk
    Qp = jnp.pad(Q, ((0, pad), (0, 0)))
    WHp = jnp.pad(WH, ((0, pad), (0, 0)))
    Hsplit, cprec = _h_terms(H, fast)
    u = jnp.arange(k, dtype=jnp.float32) - float(k // 2)
    eps = jnp.float32(1e-30)

    def solve_chunk(args):
        Qc, WHc = args
        A, y = _normal_ops(Qc, WHc, Hsplit, k, cprec)     # [rc,k,k], [rc,k]
        A1 = jnp.sum(A, axis=2)                           # A @ 1   [rc, k]
        Au = A @ u                                        # [rc, k]
        aa = jnp.sum(A1, axis=1)                          # 1A1
        ab = jnp.sum(Au, axis=1)                          # 1Au
        bb = jnp.einsum("a,rab,b->r", u, A, u)            # uAu
        y1 = jnp.sum(y, axis=1)
        yu = y @ u
        if sym:
            b = yu / jnp.maximum(bb, eps)
            a = jnp.zeros_like(b)
        else:
            det = aa * bb - ab * ab
            ok = det > eps * jnp.maximum(aa * bb, eps)
            safe = jnp.where(ok, det, 1.0)
            a = jnp.where(ok, (bb * y1 - ab * yu) / safe,
                          y1 / jnp.maximum(aa, eps))
            b = jnp.where(ok, (aa * yu - ab * y1) / safe, 0.0)
        t = a[:, None] + b[:, None] * u[None, :]
        if not stats:
            return t
        # rel loss from the same normal operands (see t_step stats):
        # t A t = a^2 1A1 + 2ab 1Au + b^2 uAu ; t.y = a y1 + b yu
        rel = jnp.sum(a * a * aa + 2.0 * a * b * ab + b * b * bb
                      - 2.0 * (a * y1 + b * yu))
        return t, rel

    chunks = (Qp.reshape(-1, row_chunk, n), WHp.reshape(-1, row_chunk, n))
    out = jax.lax.map(solve_chunk, chunks)
    if not stats:
        return out.reshape(-1, k)[:m]
    T, rels = out
    return T.reshape(-1, k)[:m], jnp.sum(rels)


@jax.jit
def snap_lut8(T: jax.Array) -> jax.Array:
    """Snap a free codebook onto a per-row int8 grid: T ~= b * round(T/b)
    with b = rowmax|T|/127. Codebooks on an int8 grid serve EXACTLY through
    the w8 recode (ops/qlinear.recode_w8 + the w8 megastep) — the certified
    free-codebook serving path. Snap error <= rowrange/254, an order below
    the 16-codeword spacing, and the S-step keeps optimizing assignments
    AGAINST the snapped codebook so the artifact loss accounts for it."""
    b = jnp.maximum(jnp.max(jnp.abs(T), axis=1, keepdims=True), 1e-30) / 127.0
    return jnp.clip(jnp.round(T / b), -127, 127) * b


@jax.jit
def quad_loss(W: jax.Array, Wq: jax.Array, H: jax.Array) -> jax.Array:
    """tr((W-Wq) H (W-Wq)^T) — reference quad_loss_2 (ganq.py:392-395)."""
    E = W - Wq
    return jnp.sum(jnp.dot(E, H, precision=HIGH) * E)


# ----------------------------------------------------------------------- main
def ganq_quantize(W: jax.Array, H: jax.Array, qcfg: QuantizeConfig,
                  nsamples: int,
                  codebook_init_fn=None) -> GANQResult:
    """Full GANQ pipeline on one weight matrix.

    ``codebook_init_fn(W_perm, hinv_diag) -> [m, 2^bits]`` may be injected
    (e.g. the exact native k-means); default is the batched Lloyd solver.
    """
    prep = prepare(W, H, qcfg)
    m, n = prep.W.shape
    k = 2**qcfg.bits

    hinv_diag = jnp.diagonal(prep.Hinv)
    if codebook_init_fn is not None:
        T = jnp.asarray(codebook_init_fn(prep.W, hinv_diag), jnp.float32)
    elif qcfg.codebook_init == "kmeans_exact":
        # exact SMAWK-class DP on the host (native C++), LeanQuant weighting
        from ..ops.kmeans_exact import kmeans_rows_exact
        wts = np.asarray(leanquant_weights(hinv_diag, qcfg.codebook_weight_exp))
        T = jnp.asarray(kmeans_rows_exact(np.asarray(prep.W), wts, k),
                        jnp.float32)
    elif qcfg.codebook_init == "linear":
        base = jnp.linspace(-1.0, 1.0, k)
        T = jnp.broadcast_to(base, (m, k)) * jnp.max(prep.W, axis=1, keepdims=True)
    elif qcfg.codebook_init == "normal":
        probs = jnp.linspace(0.0, 1.0, k + 2)[1:-1]
        quant = jax.scipy.special.erfinv(2 * probs - 1) * np.sqrt(2.0)
        T = jnp.broadcast_to(quant, (m, k)) * jnp.max(prep.W, axis=1, keepdims=True)
    else:
        wts = leanquant_weights(hinv_diag, qcfg.codebook_weight_exp)
        T = weighted_kmeans_1d(prep.W, wts, k=k)

    Hd = prep.Xxt_damped
    WH = jnp.dot(prep.W, Hd, precision=HIGH)  # constant across iterations

    # S-step backend (round-3 re-measurement, scripts/solver_profile.py
    # with ON-DEVICE reduction barriers — round 2's host-fetch barriers
    # were dominated by the ~40 MB/s tunnel transfer of the [m, n]
    # outputs and mis-ranked every implementation):
    #   blocked-pipeline Pallas kernel (ops/ganq_solver.
    #   s_step_blocked_pallas): 65-79 ms at the 1B module shapes vs the
    #   XLA scan's 133-333 ms — 2-5x, exact index parity. auto uses it
    #   whenever shapes tile; "jax" pins the scan; "pallas" pins the
    #   legacy whole-column kernel (kept for A/Bs).
    backend = qcfg.solver_backend
    use_blocked = use_pallas = False
    if backend == "pallas":
        from ..ops.ganq_solver import s_step_fits
        use_pallas = s_step_fits(m, n)
    elif backend != "jax" and jax.default_backend() != "cpu":
        from ..ops.ganq_solver import s_step_blocked_fits
        use_blocked = s_step_blocked_fits(m, n)

    fast_t = {"bfloat16": "bf16", "float32_strict": "strict"}.get(
        qcfg.hessian_dtype, False)
    codebook = getattr(qcfg, "ganq_codebook", "free")

    def refit(Q):
        """(T, rel) — rel = quad loss minus the constant tr(W H W^T),
        computed from the T-step's own normal operands (no extra O(m n^2)
        pass, no host sync; see t_step stats)."""
        if codebook in ("affine", "affine_sym"):
            return t_step_affine(WH, Hd, Q, k, fast=fast_t,
                                 sym=codebook == "affine_sym", stats=True)
        return t_step(WH, Hd, Q, k, fast=fast_t, stats=True,
                      snap8=codebook == "lut8")

    if codebook in ("affine", "affine_sym"):
        # minmax grid init: the uniform quantizer's per-row grid covers
        # outlier columns exactly (a refit of free-kmeans assignments
        # under-stretches on heavy-tailed rows and the alternation can
        # stay stuck below plain GPTQ); the S-step then compensates like
        # GPTQ's loop and the 2x2 refit strictly improves from there
        u = jnp.arange(k, dtype=jnp.float32) - float(k // 2)
        wmin = jnp.min(prep.W, axis=1, keepdims=True)
        wmax = jnp.max(prep.W, axis=1, keepdims=True)
        if codebook == "affine_sym":
            b = jnp.maximum(-wmin / float(k // 2),
                            wmax / float(k // 2 - 1))
            T = b * u[None, :]
        else:
            b = (wmax - wmin) / float(k - 1)
            T = wmin + b * (u[None, :] + float(k // 2))
    elif codebook == "lut8":
        T = snap_lut8(T)

    # best-(T, Q) tracking stays ON DEVICE: per-iteration relative losses
    # come from the T-step's normal operands and the best pair is kept
    # with jnp.where selects — the whole K-round alternation dispatches
    # without a single host sync (round 2 paid a dense quad_loss + float()
    # fetch per iteration; at the 1B down shape that was ~10x the S-step).
    best_rel, bT, bQ, found = jnp.float32(jnp.inf), None, None, None
    T_init = T
    for _ in range(qcfg.ganq_iterations):
        if use_blocked:
            from ..ops.ganq_solver import s_step_blocked_pallas
            Q, _werr = s_step_blocked_pallas(prep.W, prep.L, T)
        elif use_pallas:
            from ..ops.ganq_solver import s_step_pallas
            Q, _werr = s_step_pallas(prep.W, prep.L, T)
        else:
            Q, _werr = s_step(prep.W, prep.L, T)
        T, rel = refit(Q)
        better = jnp.isfinite(rel) & (rel < best_rel)
        if bT is None:
            bT, bQ, found = T, Q, better
            best_rel = jnp.where(better, rel, best_rel)
            continue
        best_rel = jnp.where(better, rel, best_rel)
        bT = jnp.where(better, T, bT)
        bQ = jnp.where(better, Q, bQ)
        found = found | better

    if bQ is not None and bool(found):      # ONE device fetch for the loop
        T, Q = bT, bQ
        Wq = jnp.take_along_axis(T, Q, axis=1)
        dist = float(quad_loss(prep.W, Wq, Hd))
    else:  # no iteration improved (K=0 or NaN) — one assignment pass
        # against the INITIAL codebook (refit output may be NaN)
        T = T_init
        Q, _ = s_step(prep.W, prep.L, T)
        Wq = jnp.take_along_axis(T, Q, axis=1)
        dist = float(quad_loss(prep.W, Wq, Hd))

    quad_free = None
    if codebook != "free" and Q is not None:
        # what the unconstrained codebook would score on the same
        # assignments — the reported price of the constraint
        T_free = t_step(WH, Hd, Q, k, fast=fast_t)
        quad_free = float(quad_loss(
            prep.W, jnp.take_along_axis(T_free, Q, axis=1), Hd))

    d = jnp.diagonal(prep.Hinv)
    losses = (prep.W - Wq) ** 2 / d[None, :] ** 2 / 2.0
    avg_loss = float(jnp.sum(losses)) / nsamples

    if prep.invperm is not None:
        Wq = Wq[:, prep.invperm]
        Q = Q[:, prep.invperm]

    return GANQResult(
        Q=Wq, lut=T, idx=Q.astype(jnp.int32),
        avg_loss=avg_loss, quad_loss=dist,
        damp_used=prep.damp_used, nsamples=nsamples,
        quad_loss_free=quad_free,
    )


__all__ = ["GANQResult", "ganq_quantize", "s_step", "s_step_reference",
           "t_step", "t_step_affine", "snap_lut8", "quad_loss"]
