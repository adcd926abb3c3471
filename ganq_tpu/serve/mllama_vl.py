"""Mllama (Llama-3.2-Vision) multimodal serving: gated cross-attention.

The reference quantizes only mllama's self-attention decoder layers
(``gptqmodel/models/definitions/mllama.py`` — "we currently do not support
quantizing cross attention layer") and serves through HF ``generate`` with
the vision tower + cross-attention layers in full precision.  TPU-native
equivalent:

- the vision tower runs once per request (``models/mllama_vision``), its
  projected output becomes the cross-attention states;
- every cross layer's K/V over those states is computed ONCE at prefill
  (they are position-independent) and closed over for the whole decode —
  the cross half of the KV cache is static by construction, no per-step
  update;
- the text decoder walks the ORIGINAL layer order: self-attention layers
  run through the standard (quantized) ``layer_forward`` with the usual KV
  cache, cross layers run the tanh-gated cross-attention block in fp
  (oracle: ``MllamaCrossAttentionDecoderLayer``);
- the per-token cross-attention mask follows HF generation semantics: the
  prompt rows come from the processor's ``cross_attention_mask``, every
  decode step reuses the prompt's last row.

Prefill + greedy/sampled decode is one compiled program, like the text
engine (serve/engine.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mllama_vision import (MllamaVisionConfig, import_vision_params,
                                    project_cross_attention,
                                    vision_config_from_hf, vision_forward)
from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_tables, unembed)
from .engine import _sample, init_cache

_NEG = jnp.finfo(jnp.float32).min


# ------------------------------------------------------------- state extract

def extract_vl_state(state: Dict[str, Any],
                     hf_config: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """Pull the fp multimodal tensors out of an Mllama state dict: the vision
    tower, the projector, and the gated cross-attention decoder layers (the
    tensors the text-only import drops).  Keys are normalized to the legacy
    flat layout (``vision_model.* / multi_modal_projector.* /
    language_model.model.layers.{i}.*``) so checkpoint passthrough is
    layout-independent."""
    tc = hf_config.get("text_config") or hf_config
    cross = set(tc.get("cross_attention_layers") or ())
    out = {}
    for k, v in state.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("language_model.model."):
            k = "language_model." + k[len("language_model.model."):]
        if k.startswith("language_model.layers."):
            k = "language_model.model.layers." + k[len("language_model.layers."):]
        if k.startswith(("vision_model.", "multi_modal_projector.")):
            out[k] = v
        elif k.startswith("language_model.model.layers."):
            i = int(k.split(".")[3])
            if i in cross:
                out[k] = v
    return out or None


def _cross_layer_params(flat: Dict[str, Any], idx: int) -> Dict[str, Any]:
    pre = f"language_model.model.layers.{idx}."
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        if not k.startswith(pre):
            continue
        node = tree
        parts = k[len(pre):].split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(np.asarray(v), jnp.float32)
    if "cross_attn" not in tree:
        raise ValueError(f"layer {idx} is not a cross-attention layer")
    return tree


# ----------------------------------------------------------------- cross math

def _rms(x, w, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def cross_kv(cfg: ModelConfig, cp: Dict[str, Any],
             states: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cross-layer K/V over the vision states — computed once per
    request (position-independent), [B, KVH, Lv, hd] each."""
    B, Lv, _ = states.shape
    hd = cfg.head_dim
    kvh = cfg.num_key_value_heads
    ca = cp["cross_attn"]
    k = (states @ ca["k_proj"]["weight"].T).reshape(B, Lv, kvh, hd)
    v = (states @ ca["v_proj"]["weight"].T).reshape(B, Lv, kvh, hd)
    k = _rms(k, ca["k_norm"]["weight"], cfg.norm_eps)
    return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)


def cross_layer_forward(cfg: ModelConfig, cp: Dict[str, Any], x: jnp.ndarray,
                        k: jnp.ndarray, v: jnp.ndarray, mask: jnp.ndarray,
                        full_row: jnp.ndarray) -> jnp.ndarray:
    """One gated cross-attention decoder layer (oracle:
    ``MllamaCrossAttentionDecoderLayer.forward``). ``mask`` [B,1,S,Lv]
    additive (already full-row-zeroed), ``full_row`` [B,1,S,1]."""
    B, S, H = x.shape
    hd = cfg.head_dim
    heads = cfg.num_attention_heads
    g = heads // cfg.num_key_value_heads
    ca = cp["cross_attn"]

    h = _rms(x, cp["input_layernorm"]["weight"], cfg.norm_eps)
    q = (h @ ca["q_proj"]["weight"].T).reshape(B, S, heads, hd)
    q = _rms(q.transpose(0, 2, 1, 3), ca["q_norm"]["weight"], cfg.norm_eps)
    qg = q.reshape(B, cfg.num_key_value_heads, g, S, hd)
    logits = jnp.einsum("bkgsd,bkld->bkgsl", qg, k) * (hd ** -0.5)
    logits = logits + mask[:, :, None]
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bkgsl,bkld->bkgsd", w, v)
    o = o.reshape(B, heads, S, hd).transpose(0, 2, 1, 3).reshape(B, S, -1)
    o = o @ ca["o_proj"]["weight"].T
    x = x + jnp.tanh(cp["cross_attn_attn_gate"]) * o

    h = _rms(x, cp["post_attention_layernorm"]["weight"], cfg.norm_eps)
    m = cp["mlp"]
    h = (jax.nn.silu(h @ m["gate_proj"]["weight"].T)
         * (h @ m["up_proj"]["weight"].T)) @ m["down_proj"]["weight"].T
    h = full_row[:, 0] * h
    return x + jnp.tanh(cp["cross_attn_mlp_gate"]) * h


def prepare_cross_mask(cross_attention_mask: jnp.ndarray,
                       num_patches: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Processor mask [B, S, media, tiles] (1 = token attends to tile) ->
    (additive mask [B,1,S,Lv], full-text-row mask [B,1,S,1]); rows with no
    visible tile get an all-zero mask row and are suppressed through the
    full-row MLP multiply, exactly like the oracle
    (``modeling_mllama._prepare_cross_attention_mask``)."""
    B, S, M, T = cross_attention_mask.shape
    m = jnp.repeat(cross_attention_mask.astype(jnp.float32), num_patches,
                   axis=3).reshape(B, S, M * T * num_patches)[:, None]
    m = jnp.where(m == 0.0, _NEG, 0.0)
    full_row = (m != _NEG).any(axis=-1).astype(jnp.float32)[..., None]
    return m * full_row, full_row


# --------------------------------------------------------------------- engine

def _interleave_plan(cross_indices: Tuple[int, ...],
                     total_layers: int) -> Tuple[int, ...]:
    """Original-order walk: entry >= 0 is a (renumbered) self layer index,
    entry -1-k is cross layer k (in ``cross_indices`` order)."""
    cross = {c: k for k, c in enumerate(cross_indices)}
    plan, j = [], 0
    for i in range(total_layers):
        if i in cross:
            plan.append(-1 - cross[i])
        else:
            plan.append(j)
            j += 1
    return tuple(plan)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "plan", "backend", "max_new_tokens", "temperature", "top_k",
    "top_p", "eos_id"), donate_argnums=(3,))
def _generate(cfg: ModelConfig, plan: Tuple[int, ...], params, cache,
              cross_params: Tuple[Dict[str, Any], ...], ids: jnp.ndarray,
              crossK: Tuple[jnp.ndarray, ...], crossV: Tuple[jnp.ndarray, ...],
              cmask: jnp.ndarray, full_row: jnp.ndarray, key,
              max_new_tokens: int, temperature: float, top_k: int,
              top_p: float, eos_id: int, backend: str):
    b, s = ids.shape
    max_seq = (cache[0]["k"] if "k" in cache[0] else cache[0]["c"]).shape[1]
    positions = jnp.broadcast_to(jnp.arange(s), (b, s))
    x = embed(cfg, params, ids, positions)
    mask = causal_mask(s, max_seq)
    rope = rope_tables(cfg, positions)
    new_cache = list(cache)
    for step in plan:
        if step >= 0:
            x, new_cache[step], _ = layer_forward(
                cfg, params["layers"][step], x, mask, rope,
                cache=new_cache[step], cache_pos=0, backend=backend,
                window=cfg.layer_window(step))
        else:
            k = -1 - step
            x = cross_layer_forward(cfg, cross_params[k], x, crossK[k],
                                    crossV[k], cmask, full_row)
    cache = new_cache
    logits0 = unembed(cfg, params, x[:, -1:, :])[:, 0, :]
    key, k0 = jax.random.split(key)
    tok0 = _sample(logits0, k0, temperature, top_k, top_p)
    done0 = (tok0 == eos_id) if eos_id >= 0 else jnp.zeros((b,), bool)
    # decode-step cross mask = the prompt's last row, per HF generation
    cmask_d = cmask[:, :, -1:]
    full_row_d = full_row[:, :, -1:]

    def body(carry, _):
        cache, tok, pos, key, done = carry
        positions = jnp.broadcast_to(pos, (b, 1))
        h = embed(cfg, params, tok[:, None], positions)
        mask = (jnp.arange(max_seq) <= pos)[None, None, None, :]
        rope_d = rope_tables(cfg, positions)
        new_cache = list(cache)
        for step in plan:
            if step >= 0:
                h, new_cache[step], _ = layer_forward(
                    cfg, params["layers"][step], h, mask, rope_d,
                    cache=new_cache[step], cache_pos=pos, backend=backend,
                    window=cfg.layer_window(step))
            else:
                k = -1 - step
                h = cross_layer_forward(cfg, cross_params[k], h, crossK[k],
                                        crossV[k], cmask_d, full_row_d)
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
class MllamaVLEngine:
    """Image-conditioned generation over a (quantized) Mllama text decoder:
    fp vision tower + fp gated cross-attention layers around the standard
    self-attention serving path."""
    cfg: ModelConfig                 # text-only config (cross layers dropped)
    params: Dict[str, Any]           # standard (possibly quantized) params
    vcfg: MllamaVisionConfig
    vparams: Dict[str, Any]          # vision_model + multi_modal_projector
    cross_params: Tuple[Dict[str, Any], ...]
    cross_indices: Tuple[int, ...]   # original layer indices of cross layers
    backend: str = "reference"
    max_seq: int = 2048
    plan: Tuple[int, ...] = field(init=False)

    def __post_init__(self):
        self.plan = _interleave_plan(
            self.cross_indices,
            self.cfg.num_hidden_layers + len(self.cross_indices))

    @classmethod
    def build(cls, cfg: ModelConfig, params: Dict[str, Any],
              hf_config: Dict[str, Any], vl_state: Dict[str, Any],
              backend: str = "reference", max_seq: int = 2048
              ) -> "MllamaVLEngine":
        tc = hf_config.get("text_config") or hf_config
        cross_indices = tuple(sorted(tc["cross_attention_layers"]))
        flat = extract_vl_state(vl_state, hf_config)
        if flat is None:
            raise ValueError("state dict has no mllama vision/cross tensors")
        vcfg = vision_config_from_hf(hf_config)
        vparams = import_vision_params(flat)
        cross = tuple(_cross_layer_params(flat, i) for i in cross_indices)
        return cls(cfg, params, vcfg, vparams, cross, cross_indices,
                   backend=backend, max_seq=max_seq)

    def encode_images(self, pixel_values, aspect_ratio_ids,
                      aspect_ratio_mask) -> jnp.ndarray:
        """Vision tower + projector -> cross states [B, media*tiles*P, H]."""
        out = vision_forward(self.vcfg, self.vparams,
                             jnp.asarray(pixel_values, jnp.float32),
                             jnp.asarray(aspect_ratio_ids),
                             jnp.asarray(aspect_ratio_mask))
        return project_cross_attention(self.vparams, out)

    def _cross_inputs(self, states, cross_attention_mask):
        ks, vs = [], []
        for cp in self.cross_params:
            k, v = cross_kv(self.cfg, cp, states)
            ks.append(k)
            vs.append(v)
        cmask, full_row = prepare_cross_mask(
            jnp.asarray(cross_attention_mask), self.vcfg.num_patches)
        return tuple(ks), tuple(vs), cmask, full_row

    def forward_logits(self, input_ids, pixel_values, aspect_ratio_ids,
                       aspect_ratio_mask, cross_attention_mask) -> np.ndarray:
        """Full-sequence logits (no cache) — parity/eval hook."""
        ids = jnp.asarray(np.atleast_2d(np.asarray(input_ids, np.int32)))
        states = self.encode_images(pixel_values, aspect_ratio_ids,
                                    aspect_ratio_mask)
        crossK, crossV, cmask, full_row = self._cross_inputs(
            states, cross_attention_mask)
        b, s = ids.shape
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        x = embed(self.cfg, self.params, ids, positions)
        mask = causal_mask(s, s)
        rope = rope_tables(self.cfg, positions)
        for step in self.plan:
            if step >= 0:
                x, _, _ = layer_forward(
                    self.cfg, self.params["layers"][step], x, mask, rope,
                    backend=self.backend, window=self.cfg.layer_window(step))
            else:
                k = -1 - step
                x = cross_layer_forward(self.cfg, self.cross_params[k], x,
                                        crossK[k], crossV[k], cmask, full_row)
        return np.asarray(unembed(self.cfg, self.params, x))

    def generate(self, input_ids, pixel_values, aspect_ratio_ids,
                 aspect_ratio_mask, cross_attention_mask,
                 max_new_tokens: int = 32, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0, eos_id: int = -1,
                 seed: int = 0) -> np.ndarray:
        ids = np.atleast_2d(np.asarray(input_ids, np.int32))
        b, s = ids.shape
        if s + max_new_tokens > self.max_seq:
            raise ValueError(
                f"sequence {s + max_new_tokens} exceeds max_seq {self.max_seq}")
        states = self.encode_images(pixel_values, aspect_ratio_ids,
                                    aspect_ratio_mask)
        crossK, crossV, cmask, full_row = self._cross_inputs(
            states, cross_attention_mask)
        cache = init_cache(self.cfg, b, self.max_seq)
        out = _generate(self.cfg, self.plan, self.params, cache,
                        self.cross_params, jnp.asarray(ids), crossK, crossV,
                        cmask, full_row, jax.random.PRNGKey(seed),
                        max_new_tokens, temperature, top_k, top_p, eos_id,
                        self.backend)
        return np.asarray(out)


__all__ = ["MllamaVLEngine", "extract_vl_state", "prepare_cross_mask",
           "cross_layer_forward", "cross_kv"]
