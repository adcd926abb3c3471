"""QuaRot-style pre-quantization rotation (the reference's
``gptqmodel/quantization/rotation/rotation.py``).

Two function-preserving transforms applied before quantization to make weight
distributions more quantization-friendly:

1. :func:`fuse_norms` — fold RMSNorm scale vectors into the adjacent linears
   (``rotation.py:44-69``): every norm becomes weight-1, its scale multiplies
   the input columns of the consuming projections (and final norm into
   lm_head/embed for tied models).
2. :func:`rotate` — the global R1 rotation (``rotation.py:169-194``): a
   random-orthogonal or scaled-Hadamard matrix Q applied so the residual
   stream lives in a rotated basis: embeddings ``E Q``; q/k/v/gate/up inputs
   ``W Q``; o/down outputs ``Q^T W``; lm_head ``W Q``. With unit-weight
   RMSNorms the network function is unchanged (rotations commute with the
   norm), while per-channel outliers spread across the basis.

RMSNorm architectures only (llama family), matching the reference's support.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import ModelConfig
from ..ops.qlinear import QLinear, dense_linear
from ..utils.logger import get_logger

log = get_logger(__name__)


def _scale_in(lin: QLinear, scale: jax.Array) -> None:
    """W[:, j] *= scale[j] (fold a norm into the consumer's input columns)."""
    lin["weight"] = lin["weight"] * scale[None, :].astype(lin["weight"].dtype)


def fuse_norms(cfg: ModelConfig, params: Dict[str, Any]) -> None:
    """Fold all RMSNorm scales into adjacent linears, in place."""
    if cfg.norm != "rmsnorm":
        raise ValueError("norm fusing requires an RMSNorm architecture")
    if cfg.norm_after_sublayer:
        # olmo2: norms act on sublayer outputs, so they are not input scales
        # of the q/k/v/gate/up linears and cannot be folded this way
        raise ValueError("norm fusing requires pre-norm (norm_after_sublayer=False)")
    for lp in params["layers"]:
        w_in = lp["input_norm"]["weight"].astype(jnp.float32) + cfg.rms_offset
        for k in ("q", "k", "v"):
            _scale_in(lp["attn"][k], w_in)
        lp["input_norm"]["weight"] = (
            jnp.ones_like(w_in) - cfg.rms_offset).astype(
                lp["input_norm"]["weight"].dtype)

        w_post = lp["post_norm"]["weight"].astype(jnp.float32) + cfg.rms_offset
        if "moe" in lp:
            _scale_in(lp["moe"]["router"], w_post)
            for exp in lp["moe"]["experts"]:
                _scale_in(exp["gate"], w_post)
                _scale_in(exp["up"], w_post)
        else:
            for k in ("gate", "up"):
                if k in lp["mlp"]:
                    _scale_in(lp["mlp"][k], w_post)
        lp["post_norm"]["weight"] = (
            jnp.ones_like(w_post) - cfg.rms_offset).astype(
                lp["post_norm"]["weight"].dtype)

    if "final_norm" in params:
        w_f = params["final_norm"]["weight"].astype(jnp.float32) + cfg.rms_offset
        if "lm_head" in params:
            _scale_in(params["lm_head"], w_f)
        else:
            # tied embeddings serve as the head: scale its columns, and undo
            # on the embedding side so lookups are unchanged
            emb = params["embed_tokens"]["weight"].astype(jnp.float32)
            params["embed_tokens"]["weight"] = (emb * w_f[None, :]).astype(
                params["embed_tokens"]["weight"].dtype)
            # input lookups now carry w_f; compensate by folding 1/w_f into
            # the first layer inputs is NOT function-preserving through the
            # norm, so for tied models we materialize an explicit lm_head
            params["lm_head"] = dense_linear(params["embed_tokens"]["weight"])
            params["embed_tokens"]["weight"] = (emb).astype(
                params["embed_tokens"]["weight"].dtype)
        params["final_norm"]["weight"] = (
            jnp.ones_like(w_f) - cfg.rms_offset).astype(
                params["final_norm"]["weight"].dtype)


def make_rotation(hidden: int, mode: str = "hadamard", seed: int = 0) -> jax.Array:
    """Orthogonal Q [h, h]: scaled Hadamard (power-of-2 h) or random (QR)."""
    if mode == "hadamard":
        if hidden & (hidden - 1) == 0:
            from scipy.linalg import hadamard
            Q = hadamard(hidden).astype(np.float64) / np.sqrt(hidden)
            return jnp.asarray(Q, jnp.float32)
        log.warning(f"hidden={hidden} not a power of 2; using random orthogonal")
        mode = "random"
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(hidden, hidden))
    Qm, R = np.linalg.qr(A)
    Qm = Qm * np.sign(np.diag(R))[None, :]
    return jnp.asarray(Qm, jnp.float32)


def rotate(cfg: ModelConfig, params: Dict[str, Any], Q: jax.Array) -> None:
    """Apply the R1 rotation in place. Requires fused (unit) norms."""
    f32 = jnp.float32

    def in_rot(lin: QLinear) -> None:   # W' = W Q
        lin["weight"] = (lin["weight"].astype(f32) @ Q).astype(lin["weight"].dtype)

    def out_rot(lin: QLinear) -> None:  # W' = Q^T W ; bias' = Q^T b
        lin["weight"] = (Q.T @ lin["weight"].astype(f32)).astype(lin["weight"].dtype)
        if "bias" in lin:
            lin["bias"] = (Q.T @ lin["bias"].astype(f32)).astype(lin["bias"].dtype)

    params["embed_tokens"]["weight"] = (
        params["embed_tokens"]["weight"].astype(f32) @ Q).astype(
            params["embed_tokens"]["weight"].dtype)
    for lp in params["layers"]:
        for k in ("q", "k", "v"):
            in_rot(lp["attn"][k])
        out_rot(lp["attn"]["o"])
        if "moe" in lp:
            in_rot(lp["moe"]["router"])
            for exp in lp["moe"]["experts"]:
                in_rot(exp["gate"])
                in_rot(exp["up"])
                out_rot(exp["down"])
        else:
            for k in ("gate", "up"):
                if k in lp["mlp"]:
                    in_rot(lp["mlp"][k])
            out_rot(lp["mlp"]["down"])
    if "lm_head" in params:
        in_rot(params["lm_head"])
    # tied models got an explicit lm_head during fuse_norms; embed itself was
    # rotated above, so lm_head must be re-tied from the *pre-rotation* embed:
    # handled by fuse_norms materialization order (lm_head rotated via in_rot).


def rotate_ov(cfg: ModelConfig, params: Dict[str, Any],
              mode: str = "hadamard", seed: int = 0) -> jax.Array:
    """R2: the per-head ov rotation (reference ``rotation.py:161-166``
    ``rotate_ov_proj`` / ``apply_exact_had_to_linear(had_dim=head_dim)``).

    Every head's value vector is rotated by one orthogonal H [d, d]:
    v output row-chunks become ``H @ W_chunk`` and o input column-chunks
    ``W_chunk @ H^T``, so per head ``(W_o H^T)(H v) = W_o v`` — function
    preserved without touching the residual stream. Because attention
    output is a convex combination of v's, the same H propagates through
    softmax, which is why this is where QuaRot suppresses *activation*
    outliers entering o (serves the W4A8 path). Works under GQA: each of
    the query head's d-chunks of o's input carries the shared kv head's H.
    """
    d = cfg.v_cache_dim  # head_dim (v_head_dim only under MLA)
    if mode == "hadamard" and d & (d - 1):
        log.warning(f"head_dim={d} not a power of 2; using random orthogonal")
        mode = "random"
    H = make_rotation(d, mode, seed)
    f32 = jnp.float32

    def out_heads(lin: QLinear) -> None:   # row-chunks: W' = H @ W_chunk
        W = lin["weight"].astype(f32)
        out, inn = W.shape
        Wr = W.reshape(out // d, d, inn)
        lin["weight"] = jnp.einsum("ij,hjk->hik", H, Wr).reshape(
            out, inn).astype(lin["weight"].dtype)
        if "bias" in lin:
            b = lin["bias"].astype(f32).reshape(out // d, d)
            lin["bias"] = (b @ H.T).reshape(out).astype(lin["bias"].dtype)

    def in_heads(lin: QLinear) -> None:    # col-chunks: W' = W_chunk @ H^T
        W = lin["weight"].astype(f32)
        out, inn = W.shape
        Wr = W.reshape(out, inn // d, d)
        lin["weight"] = jnp.einsum("ohj,ij->ohi", Wr, H).reshape(
            out, inn).astype(lin["weight"].dtype)

    for lp in params["layers"]:
        out_heads(lp["attn"]["v"])
        in_heads(lp["attn"]["o"])
    return H


def rotate_model(cfg: ModelConfig, params: Dict[str, Any],
                 mode: str = "hadamard", seed: int = 0,
                 ov: bool = True) -> jax.Array:
    """fuse_norms + R1 rotation (+ R2 per-head ov rotation when the
    attention path is a plain rotation-commuting map: no qk-norm on v, no
    MLA). Returns Q (also useful for tests)."""
    fuse_norms(cfg, params)
    Q = make_rotation(cfg.hidden_size, mode, seed)
    rotate(cfg, params, Q)
    if ov and not cfg.mla:
        rotate_ov(cfg, params, mode, seed + 1)
    return Q


__all__ = ["fuse_norms", "rotate", "rotate_ov", "rotate_model",
           "make_rotation"]
