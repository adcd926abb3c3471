"""Multimodal (Qwen2-VL) serving: vision tower + M-RoPE text generation.

The reference serves VL checkpoints by handing HF ``model.generate`` the
processor outputs (vision tower in fp, quantized text decoder linears
swapped in). TPU-native equivalent: run the JAX vision tower once per
request (``models/qwen2_vl_vision.vision_forward``), splice the image-token
embeddings into the prompt embeddings, drive the standard quantized decoder
with M-RoPE position tables for the prefill, and decode with the per-row
mrope position delta — the whole generate is one compiled program, same as
the text engine (serve/engine.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen2_vl_vision import (VisionConfig, VLTokens, get_rope_index,
                                      mrope_tables, vision_forward)
from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_tables, unembed)
from .engine import _sample, init_cache


@functools.partial(jax.jit,
                   static_argnames=("cfg", "backend", "max_new_tokens",
                                    "temperature", "top_k", "top_p", "eos_id"),
                   donate_argnums=(2,))
def generate_tokens_embeds(cfg: ModelConfig, params, cache, x: jax.Array,
                           rope_cos: jax.Array, rope_sin: jax.Array,
                           deltas: jax.Array, key,
                           max_new_tokens: int, temperature: float = 0.0,
                           top_k: int = 0, top_p: float = 1.0,
                           eos_id: int = -1, backend: str = "reference"):
    """Prefill from precomputed embeddings ``x`` [b, s, h] with caller-built
    rope tables (mrope), then scan-decode with rope positions offset by the
    per-row mrope delta (cache position + delta = rope position). One
    compiled program, like ``engine.generate_tokens``."""
    b, s, _ = x.shape
    max_seq = (cache[0]["k"] if "k" in cache[0] else cache[0]["c"]).shape[1]
    mask = causal_mask(s, max_seq)
    rope = (rope_cos, rope_sin)
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        x, lc, _ = layer_forward(cfg, lp, x, mask, rope, cache=lc,
                                 cache_pos=0, backend=backend,
                                 window=cfg.layer_window(i))
        new_cache.append(lc)
    cache = new_cache
    logits0 = unembed(cfg, params, x[:, -1:, :])[:, 0, :]
    key, k0 = jax.random.split(key)
    tok0 = _sample(logits0, k0, temperature, top_k, top_p)
    done0 = (tok0 == eos_id) if eos_id >= 0 else jnp.zeros((b,), bool)

    def body(carry, _):
        cache, tok, pos, key, done = carry
        positions = deltas + pos                       # [b, 1] rope positions
        h = embed(cfg, params, tok[:, None], positions)
        mask = (jnp.arange(max_seq) <= pos)[None, None, None, :]
        rope_d = rope_tables(cfg, positions)
        new_cache = []
        for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
            h, lc, _ = layer_forward(cfg, lp, h, mask, rope_d, cache=lc,
                                     cache_pos=pos, backend=backend,
                                     window=cfg.layer_window(i))
            new_cache.append(lc)
        logits = unembed(cfg, params, h)[:, 0, :]
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(done, eos_id if eos_id >= 0 else 0, nxt)
        done = done | ((nxt == eos_id) if eos_id >= 0 else False)
        return (new_cache, nxt, pos + 1, key, done), tok

    (_, last, _, _, _), toks = jax.lax.scan(
        body, (cache, tok0, jnp.int32(s), key, done0), None,
        length=max_new_tokens - 1)
    toks = jnp.moveaxis(toks, 0, 1)
    return jnp.concatenate([toks, last[:, None]], axis=1)


@dataclass
class VLEngine:
    """Image/video-aware generation over a (quantized) Qwen2-VL model."""
    cfg: ModelConfig
    params: Dict[str, Any]
    vcfg: VisionConfig
    vparams: Dict[str, Any]
    tokens: VLTokens
    backend: str = "reference"
    max_seq: int = 2048

    def embed_multimodal(self, input_ids: np.ndarray,
                         pixel_values: Optional[np.ndarray] = None,
                         image_grid_thw: Optional[np.ndarray] = None,
                         pixel_values_videos: Optional[np.ndarray] = None,
                         video_grid_thw: Optional[np.ndarray] = None):
        """(embeds [b,s,h], position_ids [3,b,s], deltas [b,1]) for a prompt
        with its image tokens replaced by vision-tower outputs."""
        ids = np.asarray(input_ids, np.int32)
        if ids.ndim == 1:
            ids = ids[None, :]
        b, s = ids.shape
        x = embed(self.cfg, self.params, jnp.asarray(ids),
                  jnp.zeros((b, s), jnp.int32))
        flat = ids.reshape(-1)

        def splice(x2d, pixels, grid, token_id):
            emb = vision_forward(self.vcfg, self.vparams,
                                 jnp.asarray(pixels, x2d.dtype), grid)
            idx = np.where(flat == token_id)[0]
            if len(idx) != emb.shape[0]:
                raise ValueError(
                    f"{len(idx)} vision tokens vs {emb.shape[0]} "
                    f"vision embeddings (token id {token_id})")
            return x2d.at[jnp.asarray(idx)].set(emb.astype(x2d.dtype))

        x2d = x.reshape(b * s, -1)
        if pixel_values is not None:
            x2d = splice(x2d, pixel_values, image_grid_thw,
                         self.tokens.image_token_id)
        if pixel_values_videos is not None:
            x2d = splice(x2d, pixel_values_videos, video_grid_thw,
                         self.tokens.video_token_id)
        x = x2d.reshape(b, s, -1)
        pos3, deltas = get_rope_index(ids, image_grid_thw, video_grid_thw,
                                      self.tokens,
                                      self.vcfg.spatial_merge_size)
        return x, pos3, deltas

    def forward_logits(self, input_ids: np.ndarray, **mm) -> np.ndarray:
        """Full-sequence logits (no cache) — parity/eval hook."""
        x, pos3, _ = self.embed_multimodal(input_ids, **mm)
        cos, sin = mrope_tables(self.cfg, jnp.asarray(pos3),
                                self.tokens.mrope_section)
        b, s, _ = x.shape
        mask = causal_mask(s, s)
        for i, lp in enumerate(self.params["layers"]):
            x, _, _ = layer_forward(self.cfg, lp, x, mask, (cos, sin),
                                    backend=self.backend,
                                    window=self.cfg.layer_window(i))
        return np.asarray(unembed(self.cfg, self.params, x))

    def generate(self, input_ids: np.ndarray,
                 pixel_values: Optional[np.ndarray] = None,
                 image_grid_thw: Optional[np.ndarray] = None,
                 pixel_values_videos: Optional[np.ndarray] = None,
                 video_grid_thw: Optional[np.ndarray] = None,
                 max_new_tokens: int = 32, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, eos_id: int = -1,
                 seed: int = 0) -> np.ndarray:
        x, pos3, deltas = self.embed_multimodal(
            input_ids, pixel_values=pixel_values,
            image_grid_thw=image_grid_thw,
            pixel_values_videos=pixel_values_videos,
            video_grid_thw=video_grid_thw)
        b, s, _ = x.shape
        if s + max_new_tokens > self.max_seq:
            raise ValueError(
                f"sequence {s + max_new_tokens} exceeds max_seq {self.max_seq}")
        cos, sin = mrope_tables(self.cfg, jnp.asarray(pos3),
                                self.tokens.mrope_section)
        cache = init_cache(self.cfg, b, self.max_seq)
        out = generate_tokens_embeds(
            self.cfg, self.params, cache, x, cos, sin,
            jnp.asarray(deltas, jnp.int32), jax.random.PRNGKey(seed),
            max_new_tokens, temperature, top_k, top_p, eos_id, self.backend)
        return np.asarray(out)


__all__ = ["VLEngine", "generate_tokens_embeds"]
