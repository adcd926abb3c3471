"""EoRA: eigenspace low-rank accuracy recovery for quantized linears.

Re-implements the reference's EoRA pipeline (``gptqmodel/eora/eora.py:28-102``
+ ``looper/eora_processor.py``): per-module activation covariance
``C = mean_t x x^T``, eigen-scaled SVD of the quantization error
``delta = W - Wq``:

    C = Q diag(L) Q^T          (negative eigenvalues clamped to min positive)
    S = Q diag(sqrt(L))        (the "scaling" matrix)
    U Sig V = svd(delta @ S)
    B = U_r sqrt(Sig_r)        [out, r]
    A = sqrt(Sig_r) V_r S^-1   [r, in]

so ``delta ~= B @ A`` minimizes the *activation-weighted* reconstruction
error. Applied at inference as ``y += (x @ A^T) @ B^T`` (reference
``adapter/adapter.py:108-128``).

All math stays on-device in fp32 (the reference needs a float64 CPU hop).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def compute_eora_full(delta: jax.Array, cov: jax.Array
                      ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Full-factor computation; rank truncation happens in `compute_eora`."""
    cov = 0.5 * (cov + cov.T).astype(jnp.float32)
    L, Q = jnp.linalg.eigh(cov)
    pos_min = jnp.min(jnp.where(L > 0, L, jnp.inf))
    L = jnp.where(L < 0, pos_min, jnp.maximum(L, 1e-12))
    sqrtL = jnp.sqrt(L)
    scaling = Q * sqrtL[None, :]                 # Q @ diag(sqrt(L))
    # inv(scaling) = diag(1/sqrt(L)) @ Q^T
    scaling_inv = (Q / sqrtL[None, :]).T
    delta_scale = jnp.dot(delta.astype(jnp.float32), scaling,
                          precision=jax.lax.Precision.HIGHEST)
    U, S, Vt = jnp.linalg.svd(delta_scale, full_matrices=False)
    return U, S, Vt, scaling_inv


def compute_eora(delta: jax.Array, cov: jax.Array, rank: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """Returns (A [rank, in], B [out, rank]) with delta ~= B @ A."""
    U, S, Vt, scaling_inv = compute_eora_full(delta, cov)
    sqrtS = jnp.sqrt(S[:rank])
    B = U[:, :rank] * sqrtS[None, :]
    A = (sqrtS[:, None] * Vt[:rank]) @ scaling_inv
    return A, B


def apply_lora(x: jax.Array, lora_a: jax.Array, lora_b: jax.Array) -> jax.Array:
    """The adapter contribution (x @ A^T) @ B^T; negligible FLOPs at low rank."""
    return jnp.dot(jnp.dot(x, lora_a.T.astype(x.dtype)),
                   lora_b.T.astype(x.dtype))


__all__ = ["compute_eora", "apply_lora"]
