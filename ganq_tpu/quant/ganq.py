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
from typing import Tuple

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
@partial(jax.jit, static_argnames=("k", "row_chunk", "fast"))
def t_step(WH: jax.Array, H: jax.Array, Q: jax.Array, k: int,
           row_chunk: int = 256, rcond: float = 16 * 1.19e-7,
           fast: bool = False) -> jax.Array:
    """Codebook refit: T[i] = (WH S_i^T) (S_i H S_i^T)^+ per row.

    Min-norm pseudo-inverse via symmetric eigh with a gelsd-style relative
    cutoff; rows whose codeword is unused get T entry 0 (matching the
    reference's lstsq min-norm behavior on singular S H S^T).

    ``fast`` runs the O(m n^2 2^bits) one-hot contractions in bf16 with f32
    accumulation (~8x MXU throughput; the one-hot factor is exact in bf16,
    only H rounds) — the 7B-scale quantization-speed knob
    (QuantizeConfig.hessian_dtype="bfloat16"); the 16x16 solves stay f32.
    """
    m, n = Q.shape
    pad = (-m) % row_chunk
    Qp = jnp.pad(Q, ((0, pad), (0, 0)))
    WHp = jnp.pad(WH, ((0, pad), (0, 0)))
    cdt = jnp.bfloat16 if fast else jnp.float32
    cprec = jax.lax.Precision.DEFAULT if fast else HIGH
    Hc = H.astype(cdt)

    def solve_chunk(args):
        Qc, WHc = args                             # [rc, n], [rc, n]
        E = jax.nn.one_hot(Qc, k, dtype=cdt)                # [rc, n, k]
        SH = jnp.einsum("rna,nl->ral", E, Hc, precision=cprec,
                        preferred_element_type=jnp.float32)   # [rc, k, n]
        SHST = jnp.einsum("ral,rlb->rab", SH.astype(cdt), E, precision=cprec,
                          preferred_element_type=jnp.float32)  # [rc, k, k]
        WHST = jnp.einsum("rn,rna->ra", WHc.astype(cdt), E, precision=cprec,
                          preferred_element_type=jnp.float32)  # [rc, k]
        SHST = 0.5 * (SHST + jnp.swapaxes(SHST, 1, 2))
        lam, V = jnp.linalg.eigh(SHST)             # ascending eigenvalues
        cutoff = rcond * jnp.maximum(lam[:, -1:], 0.0)
        inv = jnp.where(lam > cutoff, 1.0 / jnp.where(lam > cutoff, lam, 1.0), 0.0)
        # T = WHST @ V diag(inv) V^T
        t = jnp.einsum("ra,rab,rb,rcb->rc", WHST, V, inv, V, precision=HIGH)
        return t

    chunks = (Qp.reshape(-1, row_chunk, n), WHp.reshape(-1, row_chunk, n))
    T = jax.lax.map(solve_chunk, chunks).reshape(-1, k)
    return T[:m]


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

    # fused Pallas S-step: measured on-chip (scripts/sstep_ab.py,
    # 2026-08-19) it beats the XLA scan by only 1.08-1.14x at 2048^2 /
    # 4096x1024 — the per-column sequential dependency dominates both.
    # auto therefore prefers the XLA scan (identical indices, parity-
    # tested); "pallas" stays available as an explicit opt-in.
    use_pallas = qcfg.solver_backend == "pallas"
    if use_pallas:
        from ..ops.ganq_solver import s_step_fits, s_step_pallas
        use_pallas = s_step_fits(m, n)

    fast_t = qcfg.hessian_dtype == "bfloat16"
    best = (float("inf"), T, None)
    for _ in range(qcfg.ganq_iterations):
        if use_pallas:
            from ..ops.ganq_solver import s_step_pallas
            Q, _werr = s_step_pallas(prep.W, prep.L, T)
        else:
            Q, _werr = s_step(prep.W, prep.L, T)
        T = t_step(WH, Hd, Q, k, fast=fast_t)
        Wq = jnp.take_along_axis(T, Q, axis=1)
        dist = float(quad_loss(prep.W, Wq, Hd))
        if dist < best[0]:
            best = (dist, T, Q)

    dist, T, Q = best
    if Q is None:  # no iteration improved (K=0 or NaN) — one assignment pass
        Q, _ = s_step(prep.W, prep.L, T)
        Wq = jnp.take_along_axis(T, Q, axis=1)
        dist = float(quad_loss(prep.W, Wq, Hd))
    else:
        Wq = jnp.take_along_axis(T, Q, axis=1)

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
    )


__all__ = ["GANQResult", "ganq_quantize", "s_step", "s_step_reference", "t_step", "quad_loss"]
