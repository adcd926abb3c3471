"""Quantized inference engine: KV cache, jitted prefill/decode, generation.

Replaces the reference's delegation to HF ``model.generate`` + per-module
kernel swaps (``gptqmodel/models/base.py:1164-1177``; kernels selected in
``utils/importer.py``) with a TPU-native design: static-shape ring KV cache,
one jitted prefill program, and the whole decode loop as a single
``lax.scan`` program — essential here because per-dispatch overhead would
otherwise dominate each token.

The quantized-linear backend ("pallas" fused kernels vs "reference" XLA
dequant oracle) threads through the model functions; both produce identical
results within dequant tolerance (tests/test_engine.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import (ModelConfig, causal_mask, embed,
                                  layer_forward, rope_for_layer,
                                  rope_tables_all, unembed)


def init_cache(cfg: ModelConfig, batch: int, max_seq: int,
               dtype=jnp.bfloat16, mla_absorbed: bool = False) -> list:
    """Per-layer KV buffers [B, T, Hkv, D] (bf16 — the BASELINE KV policy).
    MLA models cache per-head k at nope+rope width and v at v_head_dim —
    or, with ``mla_absorbed``, only the compressed kv (kv_lora_rank) plus
    the shared rope key (qk_rope_head_dim) per token; layer_forward then
    decodes via absorbed matmuls (transformer.absorb_mla_params)."""
    if mla_absorbed and cfg.mla:
        return [
            {"c": jnp.zeros((batch, max_seq, cfg.kv_lora_rank), dtype),
             "kpe": jnp.zeros((batch, max_seq, cfg.qk_rope_head_dim), dtype)}
            for _ in range(cfg.num_hidden_layers)
        ]
    extra = {}
    if cfg.ssm_hybrid:
        # hymba: streaming SSM state rides the layer cache next to k/v
        # (f32 — the selective-scan recurrence accumulates there)
        Di = cfg.ssm_inner or cfg.q_dim
        extra = {
            "ssm": lambda: jnp.zeros((batch, Di, cfg.ssm_state),
                                     jnp.float32),
            "conv": lambda: jnp.zeros((batch, cfg.ssm_conv - 1, Di),
                                      jnp.float32),
        }
    return [
        {"k": jnp.zeros((batch, max_seq, cfg.layer_kv_heads(i),
                         cfg.k_cache_dim), dtype),
         "v": jnp.zeros((batch, max_seq, cfg.layer_kv_heads(i),
                         cfg.v_cache_dim), dtype),
         **{k: mk() for k, mk in extra.items()}}
        for i in range(cfg.num_hidden_layers)
    ]


def _cache_len(cache: list) -> int:
    c0 = cache[0]
    return (c0["k"] if "k" in c0 else c0["c"]).shape[1]


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def prefill(cfg: ModelConfig, params: Dict[str, Any], cache: list,
            input_ids: jax.Array, backend: str = "reference"):
    """Run the prompt through the model, filling the cache.

    input_ids: [B, S]. Returns (logits_last [B, vocab], cache).
    """
    b, s = input_ids.shape
    m = cfg.num_meta_tokens
    max_seq = _cache_len(cache)
    positions = jnp.broadcast_to(jnp.arange(s) + m, (b, s))
    x = embed(cfg, params, input_ids, positions)
    if m:  # hymba meta tokens: learnable prefix at cache rows [0, m)
        meta = params["meta_tokens"].astype(x.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(meta[None], (b, m, meta.shape[1])), x], axis=1)
        positions = jnp.broadcast_to(jnp.arange(s + m), (b, s + m))
    mask = causal_mask(s + m, max_seq)
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        ko = None
        if cfg.kv_reuse_map is not None and cfg.kv_reuse_map[i] != i:
            src = new_cache[cfg.kv_reuse_map[i]]
            ko = {"k": src["k"], "v": src["v"]}
        x, lc, _ = layer_forward(cfg, lp, x, mask,
                                 rope_for_layer(cfg, rope, i), cache=lc,
                                 cache_pos=0, backend=backend,
                                 window=cfg.layer_window(i), kv_override=ko)
        new_cache.append(lc)
    logits = unembed(cfg, params, x[:, -1:, :], backend)
    return logits[:, 0, :], new_cache


def _decode_one(cfg: ModelConfig, params, cache, token: jax.Array,
                pos: jax.Array, backend: str):
    """One decode step. token: [B], pos: scalar int32 (next position)."""
    b = token.shape[0]
    max_seq = _cache_len(cache)
    positions = jnp.broadcast_to(pos, (b, 1))
    x = embed(cfg, params, token[:, None], positions)
    mask = (jnp.arange(max_seq) <= pos)[None, None, None, :]
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        ko = None
        if cfg.kv_reuse_map is not None and cfg.kv_reuse_map[i] != i:
            src = new_cache[cfg.kv_reuse_map[i]]
            ko = {"k": src["k"], "v": src["v"]}
        x, lc, _ = layer_forward(cfg, lp, x, mask,
                                 rope_for_layer(cfg, rope, i), cache=lc,
                                 cache_pos=pos, backend=backend,
                                 window=cfg.layer_window(i), kv_override=ko)
        new_cache.append(lc)
    logits = unembed(cfg, params, x, backend)[:, 0, :]
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def decode_step(cfg: ModelConfig, params, cache, token, pos, backend="reference"):
    return _decode_one(cfg, params, cache, token, pos, backend)


def _sample(logits: jax.Array, key: jax.Array, temperature: float,
            top_k: int, top_p: float = 1.0) -> jax.Array:
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        # nucleus filter: keep the smallest prefix of sorted probs >= top_p
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # a token survives if the cumulative mass *before* it is < top_p
        keep_sorted = (cum - probs) < top_p
        min_keep = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                           axis=-1)[:, None]
        logits = jnp.where(logits < min_keep, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "backend", "max_new_tokens",
                                             "temperature", "top_k", "top_p",
                                             "eos_id"),
                   donate_argnums=(2,))
def generate_tokens(cfg: ModelConfig, params, cache, input_ids, key,
                    max_new_tokens: int, temperature: float = 0.0,
                    top_k: int = 0, top_p: float = 1.0, eos_id: int = -1,
                    backend: str = "reference"):
    """Prefill + scan-decode in one compiled program.

    input_ids [B, S] -> generated tokens [B, max_new_tokens] (eos-padded with
    eos_id once finished). The whole loop is on-device; one dispatch total.
    """
    b, s = input_ids.shape
    s = s + cfg.num_meta_tokens      # decode continues after the prefix
    logits0, cache = prefill(cfg, params, cache, input_ids, backend)
    key, k0 = jax.random.split(key)
    tok0 = _sample(logits0, k0, temperature, top_k, top_p)
    done0 = (tok0 == eos_id) if eos_id >= 0 else jnp.zeros((b,), bool)

    def body(carry, _):
        cache, tok, pos, key, done = carry
        logits, cache = _decode_one(cfg, params, cache, tok, pos, backend)
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, temperature, top_k, top_p)
        nxt = jnp.where(done, eos_id if eos_id >= 0 else 0, nxt)
        done = done | ((nxt == eos_id) if eos_id >= 0 else False)
        return (cache, nxt, pos + 1, key, done), tok

    (_, last, _, _, _), toks = jax.lax.scan(
        body, (cache, tok0, jnp.int32(s), key, done0), None,
        length=max_new_tokens - 1)
    toks = jnp.moveaxis(toks, 0, 1)                  # [B, steps]
    return jnp.concatenate([toks, last[:, None]], axis=1)


def _single_device(layers) -> bool:
    """True when every array leaf lives on at most one device — stacking
    sharded TP/PP parameters would silently gather them."""
    for leaf in jax.tree_util.tree_leaves(layers):
        sh = getattr(leaf, "sharding", None)
        if sh is not None and len(getattr(sh, "device_set", ())) > 1:
            return False
    return True


@dataclass
class Engine:
    """Convenience wrapper holding (cfg, params) with a chosen kernel backend.

    ``mla_absorb``: for MLA models (deepseek v2/v3, minicpm3), serve from
    the compressed kv cache via absorbed matmuls — ~heads*(nope+rope+v) /
    (rank+rope) less KV memory and decode HBM traffic. Prepared once at
    construction (kv_b dequantized into per-head absorb operands)."""
    cfg: ModelConfig
    params: Dict[str, Any]
    backend: str = "reference"
    max_seq: int = 2048
    mla_absorb: bool = True
    # "auto": serve homogeneous single-device models through the
    # stacked-layer scan (O(1) compile in depth, serve/stacked.py) and fall
    # back to the per-layer path otherwise; "perlayer"/"stacked" force.
    layout: str = "auto"

    def __post_init__(self):
        from ..models.transformer import absorb_mla_params
        self._absorbed = bool(self.mla_absorb and self.cfg.mla)
        if self._absorbed:
            self.params = absorb_mla_params(self.cfg, self.params)
        self._sp = None
        if (self.layout != "perlayer" and not self.cfg.mla
                and not self.cfg.ssm_hybrid
                and self.cfg.kv_heads_per_layer is None):
            layers = self.params.get("layers")
            # MoE models stay per-layer: the fused slot-steered expert
            # kernel (ops/moe_expert.py, engaged through _moe_combine)
            # lives there, and the scan cannot carry the per-layer
            # "mega" operand dicts
            if (isinstance(layers, list) and len(layers) > 1
                    and not any(isinstance(lp, dict) and "moe" in lp
                                for lp in layers)):
                tds = {jax.tree_util.tree_structure(lp) for lp in layers}
                if len(tds) == 1 and _single_device(layers):
                    from . import stacked as _stacked
                    try:
                        # certify affine-grid LUT codebooks onto the packed
                        # uniform fast path (lossless; free LUTs stay exact)
                        self._sp = _stacked.stack_layers(self.params,
                                                         recode="affine")
                        # one-time megakernel pre-pack (ops/megastep4.py)
                        self._sp = _stacked.prepack(
                            self.cfg, self._sp, self.backend, 1)
                    except ValueError:
                        self._sp = None  # mixed kinds/bits: per-layer path
        if self.layout == "stacked" and self._sp is None:
            raise ValueError("layout='stacked' requires homogeneous "
                             "single-device layer parameters")

    def _init_cache(self, batch: int):
        return init_cache(self.cfg, batch, self.max_seq,
                          mla_absorbed=self._absorbed)

    def generate(self, input_ids: np.ndarray, max_new_tokens: int = 32,
                 temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
                 eos_id: int = -1, seed: int = 0) -> np.ndarray:
        ids = jnp.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        total = ids.shape[1] + max_new_tokens + self.cfg.num_meta_tokens
        if total > self.max_seq:
            raise ValueError(f"sequence {total} exceeds max_seq {self.max_seq}")
        if self._sp is not None:
            from . import stacked as _stacked
            ck, cv = _stacked.init_cache(self.cfg, self.cfg.num_hidden_layers,
                                         int(ids.shape[0]), self.max_seq)
            out = _stacked.generate_tokens(
                self.cfg, self._sp, ck, cv, ids, jax.random.PRNGKey(seed),
                max_new_tokens, temperature, top_k, top_p, eos_id,
                self.backend)
            return np.asarray(out)
        cache = self._init_cache(ids.shape[0])
        out = generate_tokens(self.cfg, self.params, cache, ids,
                              jax.random.PRNGKey(seed), max_new_tokens,
                              temperature, top_k, top_p, eos_id, self.backend)
        return np.asarray(out)

    def stream(self, input_ids: np.ndarray, max_new_tokens: int = 32,
               temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
               eos_id: int = -1, seed: int = 0):
        """Token-by-token generator (for SSE streaming): yields one int per
        produced token; stops at eos. The host loop over the jitted
        ``decode_step`` trades the single-dispatch scan program of
        :func:`generate_tokens` for incremental delivery — the right trade
        only when a consumer is waiting on each token."""
        ids = jnp.asarray(input_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        if ids.shape[0] != 1:
            raise ValueError("stream() is single-sequence (batch=1)")
        total = ids.shape[1] + max_new_tokens + self.cfg.num_meta_tokens
        if total > self.max_seq:
            raise ValueError(f"sequence {total} exceeds max_seq {self.max_seq}")
        key = jax.random.PRNGKey(seed)
        pos = ids.shape[1] + self.cfg.num_meta_tokens
        if self._sp is not None:
            from . import stacked as _stacked
            ck, cv = _stacked.init_cache(self.cfg, self.cfg.num_hidden_layers,
                                         1, self.max_seq)
            logits, ck, cv = _stacked.prefill(self.cfg, self._sp, ck, cv,
                                              ids, self.backend)
            for _ in range(max_new_tokens):
                key, sub = jax.random.split(key)
                tok = _sample(logits, sub, temperature, top_k, top_p)
                t = int(tok[0])
                if eos_id >= 0 and t == eos_id:
                    return
                yield t
                logits, ck, cv = _stacked.decode_step(
                    self.cfg, self._sp, ck, cv, tok, jnp.int32(pos),
                    self.backend)
                pos += 1
            return
        cache = self._init_cache(1)
        logits, cache = prefill(self.cfg, self.params, cache, ids, self.backend)
        for _ in range(max_new_tokens):
            key, sub = jax.random.split(key)
            tok = _sample(logits, sub, temperature, top_k, top_p)
            t = int(tok[0])
            if eos_id >= 0 and t == eos_id:
                return
            yield t
            logits, cache = decode_step(self.cfg, self.params, cache, tok,
                                        jnp.int32(pos), self.backend)
            pos += 1


__all__ = ["Engine", "init_cache", "prefill", "decode_step", "generate_tokens"]
