"""Shared solver preamble: dead columns, activation sorting, damping, Cholesky.

Reproduces the numerical pipeline of the reference ``GPTQ.quantize`` preamble
(``gptqmodel/quantization/gptq.py:259-320``):

1. dead input columns (``diag(H)==0``) repaired to 1 on the diagonal and the
   corresponding weight columns zeroed or set to the row mean;
2. optional activation sort: permute columns of W and H by ``diag(H)``;
3. ``Xxt`` snapshot (undamped H, post-perm);
4. GANQ L-factor: ``L = chol(H + diag(clamp(rowsum|H| - 2 diag(H))))`` — a
   diagonally-dominant, undamped factor (gptq.py:289-291);
5. damped inverse factor with auto-increment retry: ``H += p*mean(diag(H))*I``
   (cumulative across retries, matching the reference's in-place mutation),
   ``Hinv = upper-chol(H^-1)``, and the GPTQ-style L (``chol(H_damped)``).

All dense linear algebra runs on-device in fp32; only the tiny
"did Cholesky fail" flag is pulled to the host for the retry loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import QuantizeConfig


@dataclass
class Prepared:
    """Solver inputs after the preamble. All arrays fp32, columns permuted."""

    W: jax.Array            # [m, n] dead-fixed, permuted weight
    Hinv: jax.Array         # [n, n] upper Cholesky factor of damped H^-1
    L: jax.Array            # [n, n] lower factor for GANQ S-step (style-dependent)
    Xxt: jax.Array          # [n, n] undamped H (permuted)
    Xxt_damped: jax.Array   # [n, n] damped H (permuted)
    perm: Optional[jax.Array]     # [n] int32 or None
    invperm: Optional[jax.Array]  # [n] int32 or None
    damp_used: float
    dead: jax.Array         # [n] bool mask of dead columns (permuted order)


def repair_dead(W: jax.Array, H: jax.Array, dead_mode: str):
    """Dead (never-activated) input columns: fix H's diagonal to 1 and zero
    or mean-fill the weight columns (reference gptq.py:269-276). Shared by
    the GPTQ/GANQ preamble and the AutoRound solvers."""
    diag = jnp.diag(H)
    dead = diag == 0
    H = jnp.where(jnp.diag(dead), 1.0, H)
    if dead_mode == "zero":
        W = jnp.where(dead[None, :], 0.0, W)
    else:  # "mean" — row mean over live columns (reference gptq.py:274)
        n_live = jnp.maximum(jnp.sum(~dead), 1)
        row_mean = jnp.sum(jnp.where(dead[None, :], 0.0, W), axis=1,
                           keepdims=True) / n_live
        W = jnp.where(dead[None, :], row_mean, W)
    return W, H, dead


@partial(jax.jit, static_argnames=("dead_mode", "act_sort"))
def _fix_and_sort(W, H, dead_mode: str, act_sort: str):
    W, H, dead = repair_dead(W, H, dead_mode)

    if act_sort != "none":
        perm = jnp.argsort(jnp.diag(H), descending=(act_sort == "desc"), stable=True)
        W = W[:, perm]
        H = H[perm][:, perm]
        dead = dead[perm]
        invperm = jnp.argsort(perm)
    else:
        perm = invperm = None
    return W, H, dead, perm, invperm


@jax.jit
def _ganq_L(H):
    offset = jnp.clip(jnp.sum(jnp.abs(H), axis=1) - 2.0 * jnp.diag(H), min=1e-8)
    return jnp.linalg.cholesky(H + jnp.diag(offset))


@jax.jit
def _damp_step(H, damp_percent):
    """One damping attempt: returns (H_damped, L, ok)."""
    damp = damp_percent * jnp.mean(jnp.diag(H))
    Hd = H + damp * jnp.eye(H.shape[0], dtype=H.dtype)
    L = jnp.linalg.cholesky(Hd)
    ok = jnp.logical_not(jnp.any(jnp.isnan(L)))
    return Hd, L, ok


@jax.jit
def _hinv_upper(L):
    """Upper-triangular U with H^-1 = U^T U, given H = L L^T.

    Matches ``torch.linalg.cholesky(torch.cholesky_inverse(L), upper=True)``
    (reference gptq.py:306-308): torch's upper factor of A is the transpose of
    the jnp lower factor of A.
    """
    n = L.shape[0]
    Hinv_full = jax.scipy.linalg.cho_solve((L, True), jnp.eye(n, dtype=L.dtype))
    # symmetrize against fp drift before factorizing
    Hinv_full = 0.5 * (Hinv_full + Hinv_full.T)
    return jnp.linalg.cholesky(Hinv_full).T


def prepare(W: jax.Array, H: jax.Array, qcfg: QuantizeConfig,
            max_damp_retries: int = 50) -> Prepared:
    """Run the full preamble. Raises if damping cannot stabilize the Cholesky."""
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    act_sort = qcfg.resolved_act_sort()

    W, H, dead, perm, invperm = _fix_and_sort(W, H, qcfg.dead, act_sort)

    Xxt = H  # undamped snapshot (post-perm)

    L_ganq = _ganq_L(H) if qcfg.l_damp_style == "ganq" else None

    damp_percent = qcfg.damp_percent
    H_work = H
    L_damped = None
    for _ in range(max_damp_retries):
        if not (0 < damp_percent < 1):
            break
        H_work, L_try, ok = _damp_step(H_work, jnp.float32(damp_percent))
        if bool(ok):
            L_damped = L_try
            break
        if qcfg.damp_auto_increment <= 0:
            raise FloatingPointError(
                f"Cholesky failed at damp_percent={damp_percent:.5f} and "
                "damp_auto_increment is 0; increase damp or calibration size."
            )
        damp_percent += qcfg.damp_auto_increment
    if L_damped is None:
        raise FloatingPointError(
            f"Cholesky failed to stabilize (final damp_percent={damp_percent:.5f})."
        )

    Hinv = _hinv_upper(L_damped)
    if bool(jnp.any(jnp.isnan(Hinv))):
        raise FloatingPointError("Hinv factorization produced NaN.")

    L = L_ganq if qcfg.l_damp_style == "ganq" else L_damped

    return Prepared(
        W=W, Hinv=Hinv, L=L, Xxt=Xxt, Xxt_damped=H_work,
        perm=perm, invperm=invperm, damp_used=float(damp_percent), dead=dead,
    )


__all__ = ["Prepared", "prepare", "repair_dead"]
