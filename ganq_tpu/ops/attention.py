"""Attention kernels: flash (Pallas, prefill) + masked reference.

The long-context answer (SURVEY.md §5.7 — absent in the single-device
reference, which relies on HF eager/flash-attn2): O(s) memory blockwise
attention on TPU via the Pallas flash kernel for prefill, and the plain
masked path for single-token decode (where the KV read, not the score
matrix, dominates).

Layouts follow the model code: q/k/v are [batch, seq, heads, head_dim].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reference_attention(q, k, v, mask, scale: float) -> jax.Array:
    """Masked softmax attention; GQA via head repeat. The parity oracle."""
    hq, hkv = q.shape[2], k.shape[2]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bshd,bthd->bhst", q, k).astype(jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def _flash_ok(q, k) -> bool:
    b, s, hq, d = q.shape
    t = k.shape[1]
    return (jax.default_backend() != "cpu"
            and s == t and s >= 256 and s % 128 == 0 and d % 64 == 0)


def flash_attention(q, k, v, scale: float, causal: bool = True) -> jax.Array:
    """Blockwise flash attention (jax Pallas TPU kernel); falls back to the
    reference path off-TPU or at unsupported shapes."""
    if not _flash_ok(q, k):
        s, t = q.shape[1], k.shape[1]
        mask = None
        if causal:
            qi = jnp.arange(s)[:, None]
            ki = jnp.arange(t)[None, :]
            mask = (ki <= qi)[None, None]
        return reference_attention(q, k, v, mask, scale)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    hq, hkv = q.shape[2], k.shape[2]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # [b, s, h, d] -> [b, h, s, d]
    qt = jnp.moveaxis(q, 1, 2)
    kt = jnp.moveaxis(k, 1, 2)
    vt = jnp.moveaxis(v, 1, 2)
    out = fa.flash_attention(qt, kt, vt, causal=causal, sm_scale=scale)
    return jnp.moveaxis(out, 1, 2).astype(v.dtype)


__all__ = ["flash_attention", "reference_attention"]
