"""Speculative decoding: a small draft model proposes, the target verifies.

Net-new vs the reference (its serving delegates to HF ``model.generate``,
``gptqmodel/models/base.py:1164-1177``). Greedy speculative decoding: the
draft autoregressively proposes ``gamma`` tokens; the target scores the
proposal in ONE multi-token extend (gamma+1 positions through the MXU instead
of gamma+1 serial decode dispatches — the whole win on TPU, where per-dispatch
overhead dominates decode); the longest agreeing prefix is accepted plus one
bonus token from the target's own distribution. Output is exactly the
target-only greedy continuation, by construction.

Cache discipline: both KV caches are append-only with a validity pointer.
Rejected positions leave stale entries behind, but every later step
re-writes them before its attention reads (dynamic_update precedes the
attention in layer_forward) and the position mask hides anything beyond the
pointer — so acceptance never needs a cache rewind.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import (ModelConfig, embed, layer_forward,
                                  rope_for_layer, rope_tables_all, unembed)
from .engine import decode_step, init_cache, prefill


@functools.partial(jax.jit, static_argnames=("cfg", "backend"))
def extend(cfg: ModelConfig, params, cache, tokens: jax.Array, pos: jax.Array,
           backend: str = "reference"):
    """Multi-token cached step: tokens [B, s] at positions pos..pos+s-1.
    Returns (logits [B, s, vocab], cache). The verification primitive."""
    b, s = tokens.shape
    max_seq = cache[0]["k"].shape[1]
    positions = jnp.broadcast_to(pos + jnp.arange(s), (b, s))
    x = embed(cfg, params, tokens, positions)
    # query i (absolute position pos+i) attends keys <= pos+i
    mask = (jnp.arange(max_seq)[None, :]
            <= (pos + jnp.arange(s))[:, None])[None, None]       # [1,1,s,T]
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        x, lc, _ = layer_forward(cfg, lp, x, mask,
                                 rope_for_layer(cfg, rope, i), cache=lc,
                                 cache_pos=pos, backend=backend,
                                 window=cfg.layer_window(i))
        new_cache.append(lc)
    return unembed(cfg, params, x), new_cache


@dataclass
class SpeculativeEngine:
    """Greedy speculative decoding (temperature 0). ``gamma`` draft tokens
    per round; single-sequence (the continuous-batching integration is the
    natural next step)."""
    cfg: ModelConfig
    params: Dict[str, Any]
    draft_cfg: ModelConfig
    draft_params: Dict[str, Any]
    backend: str = "reference"
    draft_backend: str = "reference"
    gamma: int = 4
    max_seq: int = 2048

    def generate(self, input_ids: np.ndarray, max_new_tokens: int = 32,
                 eos_id: int = -1, return_stats: bool = False):
        ids = np.asarray(input_ids, np.int32).reshape(1, -1)
        if ids.shape[1] + max_new_tokens > self.max_seq:
            raise ValueError("sequence exceeds max_seq")
        g = self.gamma
        cache_t = init_cache(self.cfg, 1, self.max_seq)
        cache_d = init_cache(self.draft_cfg, 1, self.max_seq)
        jids = jnp.asarray(ids)
        logits_t, cache_t = prefill(self.cfg, self.params, cache_t, jids,
                                    self.backend)
        logits_d, cache_d = prefill(self.draft_cfg, self.draft_params,
                                    cache_d, jids, self.draft_backend)
        pos = ids.shape[1]
        last = int(jnp.argmax(logits_t[0]))
        out = [last]
        proposed = accepted = 0
        while len(out) < max_new_tokens and (eos_id < 0 or last != eos_id):
            # draft proposes g continuations of `last`
            drafts = []
            tok = jnp.asarray([last], jnp.int32)
            for i in range(g):
                logits_d, cache_d = decode_step(
                    self.draft_cfg, self.draft_params, cache_d, tok,
                    jnp.int32(pos + i), self.draft_backend)
                tok = jnp.argmax(logits_d, axis=-1).astype(jnp.int32)
                drafts.append(int(tok[0]))
            # target scores [last, d_1..d_g] in one extend
            block = jnp.asarray([[last] + drafts], jnp.int32)
            logits, cache_t = extend(self.cfg, self.params, cache_t, block,
                                     jnp.int32(pos), self.backend)
            greedy = np.asarray(jnp.argmax(logits[0], axis=-1))  # [g+1]
            a = 0
            while a < g and drafts[a] == int(greedy[a]):
                a += 1
            new = drafts[:a] + [int(greedy[a])]     # accepted + bonus
            proposed += g
            accepted += a
            if eos_id >= 0:
                cut = next((i for i, t in enumerate(new) if t == eos_id),
                           None)
                if cut is not None:
                    new = new[:cut + 1]
            out.extend(new)
            # Invariant: pos = prompt_len + len(out) - 1 — both caches hold
            # every confirmed token except `last`. One shared pointer works
            # for both models: the draft's stale tail (rejected proposals)
            # sits at >= pos and is re-written before any later attention
            # reads it, exactly like the target's.
            pos += len(new)
            last = out[-1]
        out = out[:max_new_tokens]
        result = np.asarray(out, np.int32)[None, :]
        if return_stats:
            rate = accepted / proposed if proposed else 0.0
            return result, {"proposed": proposed, "accepted": accepted,
                            "acceptance_rate": rate}
        return result


__all__ = ["SpeculativeEngine", "extend"]
