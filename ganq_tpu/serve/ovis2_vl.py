"""Ovis2 multimodal serving: probabilistic visual tokenizer + quantized decode.

The reference treats Ovis as a remote-code wrapper and only ever quantizes
the inner LLM (``gptqmodel/models/definitions/ovis.py``); images go through
HF ``generate`` with the visual tokenizer in full precision.  Here the whole
path is TPU-native for the transformers-native **Ovis2** family: the AIMv2
vision tower + softmax visual tokenizer run as one JAX program
(``models/ovis2_vision.py``), the resulting soft visual-embedding-table
lookups replace the prompt's image/indicator token embeddings, and the
standard (quantized) decoder generates under plain rope — Ovis2 is an
embeds-splice model with no cross-attention and no M-RoPE, so serving is
the qwen2-vl engine minus the position machinery (``serve/vl.py``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ovis2_vision import (Ovis2VisionConfig, image_features,
                                   import_vision_params,
                                   vision_config_from_hf)
from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_tables, unembed)
from .engine import init_cache
from .vl import generate_tokens_embeds


def vl_tokens_from_hf(hf: Dict[str, Any]):
    """(image_token_id, visual_indicator_token_ids) from the wrapper config
    (HF ``Ovis2Config.image_token_id`` / ``visual_indicator_token_ids``)."""
    img = int(hf["image_token_id"])
    ind = [int(t) for t in (hf.get("visual_indicator_token_ids") or [])]
    return img, ind


@dataclass
class Ovis2VLEngine:
    """Image-aware generation over a (quantized) Ovis2 — or, via
    :meth:`build_ovis16`, Ovis-1.6 — model. The two generations share the
    probabilistic-tokenizer combine exactly; ``features_fn`` selects the
    tower (AIMv2 vs SigLIP, models/ovis{2,16}_vision.py)."""
    cfg: ModelConfig
    params: Dict[str, Any]
    vcfg: Any
    vparams: Dict[str, Any]
    image_token_id: int
    visual_indicator_token_ids: List[int]
    backend: str = "reference"
    max_seq: int = 2048
    features_fn: Any = None

    @classmethod
    def build(cls, cfg: ModelConfig, params, hf_config: Dict[str, Any],
              vision_state: Dict[str, Any], backend: str = "reference",
              max_seq: int = 2048) -> "Ovis2VLEngine":
        vcfg = vision_config_from_hf(hf_config)
        vparams = import_vision_params(vision_state)
        img, ind = vl_tokens_from_hf(hf_config)
        if len(ind) != vcfg.num_visual_indicator_tokens:
            # embed_multimodal indexes indicators[i] with JAX (clamping)
            # semantics; a silent mismatch would map extra indicator tokens
            # onto the last learned row instead of failing.
            raise ValueError(
                f"wrapper config lists {len(ind)} visual_indicator_token_ids "
                f"but the vision config has "
                f"{vcfg.num_visual_indicator_tokens} indicator rows")
        return cls(cfg, params, vcfg, vparams, img, ind,
                   backend=backend, max_seq=max_seq,
                   features_fn=image_features)

    @classmethod
    def build_ovis16(cls, cfg: ModelConfig, params,
                     hf_config: Dict[str, Any],
                     vision_state: Dict[str, Any],
                     backend: str = "reference",
                     max_seq: int = 2048) -> "Ovis2VLEngine":
        """Ovis-1.6 (SigLIP tower): same engine, the generation's token
        conventions default to the remote-code constants (image token
        -200, indicators -301..-305) when the wrapper config does not
        carry them (reference definitions/ovis.py wraps that code)."""
        from ..models.ovis16_vision import image_features as feat16
        from ..models.ovis16_vision import import_vision_params as imp16
        from ..models.ovis16_vision import vision_config_from_hf as vc16

        vcfg = vc16(hf_config)
        vparams = imp16(vision_state)
        img = int(hf_config.get("image_token_id", -200))
        ind = [int(t) for t in
               (hf_config.get("visual_indicator_token_ids")
                or [-301, -302, -303, -304, -305])]
        return cls(cfg, params, vcfg, vparams, img, ind,
                   backend=backend, max_seq=max_seq, features_fn=feat16)

    # ------------------------------------------------------------- embedding
    def embed_multimodal(self, input_ids: np.ndarray,
                         pixel_values: Optional[np.ndarray] = None
                         ) -> jax.Array:
        """Prompt embeddings [b, s, h] with image tokens replaced by the
        soft vte lookups and indicator tokens by the learned indicator rows
        (``Ovis2Model.forward``'s masked_scatter semantics)."""
        ids = np.asarray(input_ids, np.int32)
        if ids.ndim == 1:
            ids = ids[None, :]
        b, s = ids.shape
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        # ovis-1.6 uses NEGATIVE placeholder ids (-200 image, -30x
        # indicators); clamp for the text embedding lookup — every
        # placeholder row is overwritten below
        ids_safe = np.where(ids < 0, 0, ids)
        x = embed(self.cfg, self.params, jnp.asarray(ids_safe), positions)
        if pixel_values is None:
            return x
        x2d = x.reshape(b * s, -1)
        flat = ids.reshape(-1)
        features_fn = self.features_fn or image_features
        feats, indicators = features_fn(
            self.vcfg, self.vparams, jnp.asarray(pixel_values, jnp.float32))
        feats = feats.reshape(-1, feats.shape[-1])
        idx = np.where(flat == self.image_token_id)[0]
        if len(idx) != feats.shape[0]:
            raise ValueError(
                f"{len(idx)} image tokens vs {feats.shape[0]} visual "
                f"embeddings (token id {self.image_token_id})")
        x2d = x2d.at[jnp.asarray(idx)].set(feats.astype(x2d.dtype))
        for i, tid in enumerate(self.visual_indicator_token_ids):
            pos = np.where(flat == tid)[0]
            if len(pos):
                x2d = x2d.at[jnp.asarray(pos)].set(
                    indicators[i].astype(x2d.dtype))
        return x2d.reshape(b, s, -1)

    # --------------------------------------------------------------- serving
    def forward_logits(self, input_ids: np.ndarray,
                       pixel_values: Optional[np.ndarray] = None
                       ) -> np.ndarray:
        """Full-sequence logits (no cache) — parity/eval hook."""
        x = self.embed_multimodal(input_ids, pixel_values)
        b, s, _ = x.shape
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        rope = rope_tables(self.cfg, positions)
        mask = causal_mask(s, s)
        for i, lp in enumerate(self.params["layers"]):
            x, _, _ = layer_forward(self.cfg, lp, x, mask, rope,
                                    backend=self.backend,
                                    window=self.cfg.layer_window(i))
        return np.asarray(unembed(self.cfg, self.params, x))

    def generate(self, input_ids: np.ndarray,
                 pixel_values: Optional[np.ndarray] = None,
                 max_new_tokens: int = 32, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, eos_id: int = -1,
                 seed: int = 0) -> np.ndarray:
        x = self.embed_multimodal(input_ids, pixel_values)
        b, s, _ = x.shape
        if s + max_new_tokens > self.max_seq:
            raise ValueError(
                f"sequence {s + max_new_tokens} exceeds max_seq {self.max_seq}")
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
        cos, sin = rope_tables(self.cfg, positions)
        cache = init_cache(self.cfg, b, self.max_seq)
        deltas = jnp.zeros((b, 1), jnp.int32)  # standard rope: position = cache pos
        out = generate_tokens_embeds(
            self.cfg, self.params, cache, x, cos, sin, deltas,
            jax.random.PRNGKey(seed), max_new_tokens, temperature, top_k,
            top_p, eos_id, self.backend)
        return np.asarray(out)


__all__ = ["Ovis2VLEngine", "vl_tokens_from_hf"]
