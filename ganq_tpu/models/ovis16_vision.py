"""Ovis-1.6 vision tower (SigLIP) + probabilistic visual tokenizer.

The final Ovis gap (VERDICT r2 stretch, r4 #8): Ovis-1.6 (AIDC-AI) wraps
an inner LLM (llama/gemma2) with a **SigLIP-so400m** visual tokenizer —
unlike Ovis2's AIMv2 (models/ovis2_vision.py). The probabilistic head is
the same design in both generations: hidden states -> (hidden_stride^2
spatial merge) -> linear -> LayerNorm -> softmax over the visual
vocabulary, zero-padded with the indicator columns, then the soft
``probs @ vte`` embedding lookup. Reference wrapper:
``gptqmodel/models/definitions/ovis.py`` (which serves the tokenizer in
fp through HF generate; here it is a JAX program).

SigLIP tower (oracle: ``transformers.SiglipVisionModel``): conv patch
embed (bias), learned absolute positions, no cls token, pre-LayerNorm
encoder blocks (biased qkv/out, gelu-tanh fc1/fc2), final post_layernorm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Ovis16VisionConfig:
    """SigLIP backbone shape knobs + the Ovis tokenizer head's."""
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    patch_size: int = 14
    image_size: int = 384
    layer_norm_eps: float = 1e-6
    vocab_size: int = 65536
    hidden_stride: int = 2
    num_visual_indicator_tokens: int = 5
    tokenize_function: str = "softmax"


def vision_config_from_hf(hf: Dict[str, Any]) -> Ovis16VisionConfig:
    """From the Ovis wrapper config: ``visual_tokenizer_config`` carries
    vocab/stride/tokenize_function and nests the SigLIP ``backbone_config``."""
    vt = dict(hf.get("visual_tokenizer_config") or hf)
    bc = dict(vt.get("backbone_config") or vt)
    keep = {f.name for f in dataclasses.fields(Ovis16VisionConfig)}
    merged = {**{k: v for k, v in bc.items() if k in keep},
              **{k: v for k, v in vt.items() if k in keep}}
    return Ovis16VisionConfig(**merged)


def extract_vision_state(state: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Subset an Ovis-1.6 state dict to the visual tokenizer + vte."""
    out = {}
    for k, v in state.items():
        if k.startswith(("visual_tokenizer.", "vte.")):
            out[k] = v
    return out or None


def import_vision_params(state: Dict[str, Any]) -> Dict[str, Any]:
    flat = extract_vision_state(state)
    if flat is None:
        raise ValueError("no visual_tokenizer.* keys in state dict")
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    return out


# ------------------------------------------------------------------- forward

def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["weight"]
            + p["bias"]).astype(x.dtype)


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


def _encoder_layer(cfg: Ovis16VisionConfig, p, x):
    h = _ln(p["layer_norm1"], x, cfg.layer_norm_eps)
    x = x + _attention(p["self_attn"], h, cfg.num_attention_heads)
    h = _ln(p["layer_norm2"], x, cfg.layer_norm_eps)
    h = _linear(p["mlp"]["fc2"],
                jax.nn.gelu(_linear(p["mlp"]["fc1"], h), approximate=True))
    return x + h


def siglip_hidden(cfg: Ovis16VisionConfig, vm: Dict[str, Any],
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """``SiglipVisionModel`` trunk: images [n, C, H, W] -> last hidden
    states [n, (H/ps)*(W/ps), D] (post_layernorm applied; no head pool —
    the Ovis tokenizer consumes the token sequence)."""
    n, C, H, W = pixel_values.shape
    ps = cfg.patch_size
    D = cfg.hidden_size
    hp, wp = H // ps, W // ps
    emb = vm["embeddings"]
    px = pixel_values.reshape(n, C, hp, ps, wp, ps)
    px = px.transpose(0, 2, 4, 1, 3, 5).reshape(n, hp * wp, C * ps * ps)
    h = px.astype(jnp.float32) @ \
        emb["patch_embedding"]["weight"].reshape(D, -1).T
    h = h + emb["patch_embedding"]["bias"]
    h = h + emb["position_embedding"]["weight"][:hp * wp]
    for key in sorted(vm["encoder"]["layers"], key=int):
        h = _encoder_layer(cfg, vm["encoder"]["layers"][key], h)
    return _ln(vm["post_layernorm"], h, cfg.layer_norm_eps)


def visual_tokens(cfg: Ovis16VisionConfig, params: Dict[str, Any],
                  pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Images -> soft visual-token probabilities [n, L, vocab] (indicator
    columns zero-padded) — ``SiglipVisualTokenizer`` semantics."""
    vt = params["visual_tokenizer"]
    h = siglip_hidden(cfg, vt["backbone"]["vision_model"], pixel_values)
    n, L, D = h.shape
    if cfg.hidden_stride > 1:
        s = cfg.hidden_stride
        side = int(round(L ** 0.5))
        if side * side != L:
            raise ValueError("token sequence length must be a perfect square")
        pad = (s - side % s) % s
        if pad:
            h = jnp.pad(h.reshape(n, side, side, D),
                        ((0, 0), (0, pad), (0, pad), (0, 0))
                        ).reshape(n, (side + pad) ** 2, D)
            side += pad
        h = h.reshape(n, side // s, s, side // s, s, D)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, -1, s * s * D)
    # head.0 = bias-free linear to vocab - indicators, head.1 = LayerNorm
    head = vt["head"]
    logits = h @ head["0"]["weight"].T
    logits = _ln(head["1"], logits, 1e-5)
    if cfg.tokenize_function == "softmax":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    else:  # gumbel_argmax / st_argmax degenerate to argmax at inference
        probs = jax.nn.one_hot(jnp.argmax(logits, axis=-1),
                               logits.shape[-1], dtype=jnp.float32)
    return jnp.pad(probs, ((0, 0), (0, 0),
                           (0, cfg.num_visual_indicator_tokens)))


def image_features(cfg: Ovis16VisionConfig, params: Dict[str, Any],
                   pixel_values: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(image features [n, L, H_text], indicator features [k, H_text]) via
    the soft ``probs @ vte`` lookup — identical combine to Ovis2
    (models/ovis2_vision.image_features); only the tower differs."""
    vte = params["vte"]["weight"]
    probs = visual_tokens(cfg, params, pixel_values)
    feats = probs @ vte.astype(probs.dtype)
    indicators = vte[cfg.vocab_size - cfg.num_visual_indicator_tokens:
                     cfg.vocab_size]
    return feats, indicators


__all__ = ["Ovis16VisionConfig", "vision_config_from_hf",
           "extract_vision_state", "import_vision_params", "siglip_hidden",
           "visual_tokens", "image_features"]
