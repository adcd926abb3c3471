"""Mllama (Llama-3.2-Vision) vision tower — native VL support, step 1.

The reference only QUANTIZES mllama's text decoder and serves through HF
``model.generate`` with the vision tower in full precision
(``gptqmodel/models/definitions/mllama.py``).  This module is the TPU-native
vision half: the full Mllama ViT as a pure JAX function over an fp params
pytree (oracle: ``transformers`` ``MllamaVisionModel``):

- tiled patch embedding (strided conv == non-overlapping patch extraction
  + one MXU matmul),
- gated pre/post tile (aspect-ratio) embeddings and the gated positional
  embedding,
- the 2-stack encoder: ``num_hidden_layers`` ungated local layers whose
  per-layer outputs are retained (``intermediate_layers_indices``), then
  ``num_global_layers`` tanh-gated global layers,
- tile-padding attention mask built from ``aspect_ratio_mask``,
- output = concat(final, intermediates) per patch — the cross-attention
  states consumed by the text decoder's gated cross-attention layers —
  plus :func:`project_cross_attention` (``multi_modal_projector``).

The vision tower is never quantized (matching the reference), so its params
stay plain fp arrays.  Gated cross-attention *decoder* serving is tracked in
ROADMAP.md; text-only mllama serving (cross layers dropped, as HF does for
text-only inputs) lives in ``models/registry.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MllamaVisionConfig:
    """HF ``MllamaVisionConfig`` shape knobs."""
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_global_layers: int = 8
    attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    max_num_tiles: int = 4
    max_aspect_ratio_id: int = 8
    intermediate_layers_indices: Tuple[int, ...] = (3, 7, 15, 23, 30)
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @property
    def output_dim(self) -> int:
        return self.hidden_size * (1 + len(self.intermediate_layers_indices))


def vision_config_from_hf(hf: Dict[str, Any]) -> MllamaVisionConfig:
    vc = dict(hf.get("vision_config") or hf)
    keep = {f.name for f in dataclasses.fields(MllamaVisionConfig)}
    kw = {k: v for k, v in vc.items() if k in keep}
    if "intermediate_layers_indices" in kw:
        kw["intermediate_layers_indices"] = tuple(
            kw["intermediate_layers_indices"])
    return MllamaVisionConfig(**kw)


# --------------------------------------------------------------- param import

def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    return out


def import_vision_params(state: Dict[str, Any]) -> Dict[str, Any]:
    """Subset an HF mllama state dict to the ``vision_model.*`` tree (plus
    ``multi_modal_projector.*`` when present) as a nested fp32 pytree."""
    flat = {}
    for k, v in state.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("vision_model.") or k.startswith(
                "multi_modal_projector."):
            flat[k] = v
    if not flat:
        raise ValueError("no vision_model.* keys in state dict")
    return _nest(flat)


def _ordered_layers(layers: Dict[str, Any]) -> List[Dict[str, Any]]:
    return [layers[k] for k in sorted(layers, key=int)]


# ------------------------------------------------------------------- forward

def _layernorm(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _attention(p, x, mask, heads):
    # full (bidirectional) attention over tiles*patches, additive mask
    B, L, D = x.shape
    hd = D // heads

    def proj(w):
        return (x @ w.T).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)

    q = proj(p["q_proj"]["weight"])
    k = proj(p["k_proj"]["weight"])
    v = proj(p["v_proj"]["weight"])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5) + mask
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
    return o @ p["o_proj"]["weight"].T


def _encoder_layer(p, x, mask, cfg: MllamaVisionConfig, gated: bool):
    h = _layernorm(p["input_layernorm"], x, cfg.norm_eps)
    h = _attention(p["self_attn"], h, mask, cfg.attention_heads)
    if gated:
        h = jnp.tanh(p["gate_attn"]) * h
    x = x + h
    h = _layernorm(p["post_attention_layernorm"], x, cfg.norm_eps)
    h = jax.nn.gelu(h @ p["mlp"]["fc1"]["weight"].T + p["mlp"]["fc1"]["bias"],
                    approximate=False)
    h = h @ p["mlp"]["fc2"]["weight"].T + p["mlp"]["fc2"]["bias"]
    if gated:
        h = jnp.tanh(p["gate_ffn"]) * h
    return x + h


def _tile_embedding(p, h, ar_ids, cfg: MllamaVisionConfig):
    # h: [B*M, T, P, D]; gated aspect-ratio tile embedding
    emb = p["embedding"]["weight"][ar_ids.reshape(-1)]
    emb = emb.reshape(-1, cfg.max_num_tiles, 1, cfg.hidden_size)
    return h + emb * jnp.tanh(p["gate"])


def _tile_mask(ar_mask, num_patches, target_len, num_heads_dummy=None):
    """Additive attention mask from the per-tile validity mask
    (oracle: ``modeling_mllama._prepare_aspect_ratio_attention_mask``).
    ``target_len`` is the 8-padded patch count; padded patch rows are
    always masked (target_len > num_patches holds for every legal shape:
    a square count +1 is never 0 mod 8)."""
    B, T = ar_mask.shape
    m = jnp.broadcast_to(
        ar_mask.astype(jnp.float32)[:, :, None, None], (B, T, target_len, 1))
    pad = target_len - num_patches
    m = m.at[:, :, target_len - pad:].set(0.0)
    m = 1.0 - m.reshape(B, T * target_len, 1)
    neg = jnp.finfo(jnp.float32).min
    return (m @ m.transpose(0, 2, 1) * neg)[:, None]  # [B, 1, TL, TL]


def vision_forward(cfg: MllamaVisionConfig, params: Dict[str, Any],
                   pixel_values: jnp.ndarray, aspect_ratio_ids: jnp.ndarray,
                   aspect_ratio_mask: jnp.ndarray) -> jnp.ndarray:
    """The MllamaVisionModel forward.

    pixel_values [B, media, tiles, C, H, W], aspect_ratio_ids [B, media],
    aspect_ratio_mask [B, media, tiles] -> cross-attention states
    [B, media, tiles, num_patches, hidden*(1+n_intermediate)].
    """
    vp = params["vision_model"]
    B, M, T, C, H, W = pixel_values.shape
    p_sz = cfg.patch_size
    D = cfg.hidden_size
    hp, wp = H // p_sz, W // p_sz

    # patch embedding: strided conv == patch extraction + one matmul
    px = pixel_values.reshape(B * M * T, C, hp, p_sz, wp, p_sz)
    px = px.transpose(0, 2, 4, 1, 3, 5).reshape(B * M * T, hp * wp,
                                                C * p_sz * p_sz)
    wconv = vp["patch_embedding"]["weight"].reshape(D, -1)
    h = px.astype(jnp.float32) @ wconv.T                     # [BMT, P-1, D]

    ar_ids = aspect_ratio_ids.reshape(B * M)
    h = h.reshape(B * M, T, hp * wp, D)
    h = _tile_embedding(vp["pre_tile_positional_embedding"], h, ar_ids, cfg)

    # class token + gated positional embeddings
    cls = jnp.broadcast_to(vp["class_embedding"], (B * M, T, 1, D))
    h = jnp.concatenate([cls, h], axis=2)                    # [BM, T, P, D]
    P = h.shape[2]
    gate = jnp.tanh(vp["gated_positional_embedding"]["gate"])
    h = h + (1.0 - gate) * vp["gated_positional_embedding"]["embedding"]
    tile_pos = vp["gated_positional_embedding"]["tile_embedding"]["weight"]
    h = h + gate * tile_pos[ar_ids].reshape(B * M, T, P, D)

    h = _layernorm(vp["layernorm_pre"], h, 1e-5)

    # pad patches to a multiple of 8, build the tile mask over padded length
    pad = (8 - P % 8) % 8
    h = jnp.pad(h, ((0, 0), (0, 0), (0, pad), (0, 0)))
    Lp = P + pad
    mask = _tile_mask(aspect_ratio_mask.reshape(B * M, T), P, Lp)

    h = h.reshape(B * M, T * Lp, D)
    local_layers = _ordered_layers(vp["transformer"]["layers"])
    intermediates: List[jnp.ndarray] = []
    for i, lp in enumerate(local_layers):
        h = _encoder_layer(lp, h, mask, cfg, gated=False)
        if i in cfg.intermediate_layers_indices:
            intermediates.append(h)
    h = _layernorm(vp["layernorm_post"], h, 1e-5)

    h = h.reshape(B * M, T, Lp, D)
    h = _tile_embedding(vp["post_tile_positional_embedding"], h, ar_ids, cfg)
    h = h.reshape(B * M, T * Lp, D)
    for lp in _ordered_layers(vp["global_transformer"]["layers"]):
        h = _encoder_layer(lp, h, mask, cfg, gated=True)

    h = h.reshape(B * M, T, Lp, D)[:, :, :P]
    inter = jnp.stack(intermediates, axis=-1)                # [BM, TLp, D, K]
    inter = inter.reshape(B * M, T, Lp, -1)[:, :, :P]
    out = jnp.concatenate([h, inter], axis=-1)
    return out.reshape(B, M, T, P, cfg.output_dim)


def project_cross_attention(params: Dict[str, Any],
                            vision_out: jnp.ndarray) -> jnp.ndarray:
    """``multi_modal_projector``: vision output -> text-hidden cross states,
    flattened over (media, tiles, patches) per batch row."""
    pj = params["multi_modal_projector"]
    B = vision_out.shape[0]
    x = vision_out.reshape(B, -1, vision_out.shape[-1])
    return x @ pj["weight"].T + pj["bias"]
