"""Ovis2 vision tower + probabilistic visual tokenizer — native VL serving.

The reference treats Ovis as a remote-code wrapper and only quantizes the
inner LLM (``gptqmodel/models/definitions/ovis.py``); serving goes through
HF ``generate`` with the visual tokenizer in full precision.  This module
is the TPU-native vision half for the transformers-native **Ovis2** family
(oracle: ``transformers`` ``Ovis2VisionModel``):

- the AIMv2-style ViT (bias-free swiglu blocks, pre-RMSNorm, learned
  absolute positions, patch-embed conv + RMSNorm),
- the ``hidden_stride`` 2x2 spatial merge,
- the tokenizer head: linear -> LayerNorm -> softmax over the visual
  vocabulary (``tokenize_function="softmax"``, the released checkpoints'
  setting; argmax variants are inference-degenerate gumbel/st tricks),
- the visual embedding table: ``probs @ vte`` soft lookup, plus the
  learned embeddings of the ``num_visual_indicator_tokens`` indicator rows.

Ovis2 is an embeds-splice model (no cross-attention): the outputs replace
the prompt's image/indicator token embeddings and the standard (quantized)
decoder runs unchanged — serving reuses the engine path in ``serve/vl.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Ovis2VisionConfig:
    """HF ``Ovis2VisionConfig`` shape knobs."""
    hidden_size: int = 1024
    intermediate_size: int = 2816
    num_hidden_layers: int = 24
    num_attention_heads: int = 8
    num_channels: int = 3
    patch_size: int = 14
    image_size: int = 224
    qkv_bias: bool = False
    mlp_bias: bool = False
    rms_norm_eps: float = 1e-5
    vocab_size: int = 16384
    hidden_stride: int = 1
    num_visual_indicator_tokens: int = 5
    tokenize_function: str = "softmax"


def vision_config_from_hf(hf: Dict[str, Any]) -> Ovis2VisionConfig:
    vc = dict(hf.get("vision_config") or hf)
    keep = {f.name for f in dataclasses.fields(Ovis2VisionConfig)}
    return Ovis2VisionConfig(**{k: v for k, v in vc.items() if k in keep})


# --------------------------------------------------------------- param import

def extract_vision_state(state: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Subset an Ovis2 state dict to the vision tower + visual embedding
    table, with the ``model.`` wrapper prefix normalized off."""
    out = {}
    for k, v in state.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith(("vision_tower.", "visual_embeddings_table.")):
            out[k] = v
    return out or None


def import_vision_params(state: Dict[str, Any]) -> Dict[str, Any]:
    flat = extract_vision_state(state)
    if flat is None:
        raise ValueError("no vision_tower.* keys in state dict")
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    return out


# ------------------------------------------------------------------- forward

def _rms(p, x, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * p["weight"]


def _linear(p, x):
    y = x @ p["weight"].T
    return y + p["bias"] if "bias" in p else y


def _attention(p, x, heads):
    B, L, D = x.shape
    hd = D // heads

    def proj(d):
        return _linear(d, x).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = proj(p["q_proj"]), proj(p["k_proj"]), proj(p["v_proj"])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return _linear(p["out_proj"], o.transpose(0, 2, 1, 3).reshape(B, L, D))


def _encoder_layer(cfg: Ovis2VisionConfig, p, x):
    h = _rms(p["rms_norm1"], x, cfg.rms_norm_eps)
    x = x + _attention(p["attention"], h, cfg.num_attention_heads)
    h = _rms(p["rms_norm2"], x, cfg.rms_norm_eps)
    f = p["ffn"]
    h = _linear(f["down_proj"],
                jax.nn.silu(_linear(f["gate_proj"], h)) * _linear(f["up_proj"], h))
    return x + h


def visual_tokens(cfg: Ovis2VisionConfig, params: Dict[str, Any],
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """``Ovis2VisionModel.forward``: images [n, C, H, W] -> soft visual-token
    probabilities [n, L, vocab] (indicator columns zero-padded)."""
    vt = params["vision_tower"]["transformer"]
    n, C, H, W = pixel_values.shape
    ps = cfg.patch_size
    D = cfg.hidden_size
    hp, wp = H // ps, W // ps

    px = pixel_values.reshape(n, C, hp, ps, wp, ps)
    px = px.transpose(0, 2, 4, 1, 3, 5).reshape(n, hp * wp, C * ps * ps)
    emb = vt["embeddings"]
    h = px.astype(jnp.float32) @ emb["patch_embedding"]["weight"].reshape(D, -1).T
    if "bias" in emb["patch_embedding"]:
        h = h + emb["patch_embedding"]["bias"]
    h = _rms(emb["rms_norm"], h, cfg.rms_norm_eps)
    h = h + emb["position_embedding"]["weight"][:hp * wp]

    layers = vt["encoder"]["layers"]
    for key in sorted(layers, key=int):
        h = _encoder_layer(cfg, layers[key], h)
    h = _rms(vt["rms_norm"], h, cfg.rms_norm_eps)

    if cfg.hidden_stride > 1:
        s = cfg.hidden_stride
        L = h.shape[1]
        side = int(round(L ** 0.5))
        if side * side != L:
            raise ValueError("token sequence length must be a perfect square")
        pad = (s - side % s) % s
        h = jnp.pad(h, ((0, 0), (0, 0), (0, 0))) if pad == 0 else jnp.pad(
            h.reshape(n, side, side, D), ((0, 0), (0, pad), (0, pad), (0, 0))
        ).reshape(n, (side + pad) ** 2, D)
        side += pad
        h = h.reshape(n, side // s, s, side // s, s, D)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, -1, s * s * D)

    head = params["vision_tower"]
    logits = h @ head["head_linear"]["weight"].T
    ln = head["head_norm"]
    mu = jnp.mean(logits, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(logits - mu), axis=-1, keepdims=True)
    logits = (logits - mu) * jax.lax.rsqrt(var + 1e-5) * ln["weight"] + ln["bias"]
    if cfg.tokenize_function == "softmax":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    else:  # gumbel_argmax / st_argmax degenerate to hard argmax at inference
        probs = jax.nn.one_hot(jnp.argmax(logits, axis=-1),
                               logits.shape[-1], dtype=jnp.float32)
    pad_cols = cfg.num_visual_indicator_tokens
    return jnp.pad(probs, ((0, 0), (0, 0), (0, pad_cols)))


def image_features(cfg: Ovis2VisionConfig, params: Dict[str, Any],
                   pixel_values: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(image features [n, L, H_text], indicator features [k, H_text]) via
    the soft visual-embedding-table lookup (``Ovis2Model.get_image_features``)."""
    vte = params["visual_embeddings_table"]["weight"]
    probs = visual_tokens(cfg, params, pixel_values)
    feats = probs @ vte.astype(probs.dtype)
    indicators = vte[cfg.vocab_size - cfg.num_visual_indicator_tokens:
                     cfg.vocab_size]
    return feats, indicators
