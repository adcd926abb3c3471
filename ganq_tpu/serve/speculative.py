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


def _softmax(logits: np.ndarray, temperature: float) -> np.ndarray:
    z = logits.astype(np.float64) / temperature
    z -= z.max()
    e = np.exp(z)
    return e / e.sum()


def verify_rejection(p_targets: np.ndarray, p_drafts: np.ndarray,
                     drafts: list, rng: np.random.Generator):
    """Leviathan-style rejection verification. ``p_targets`` [g+1, V] are
    the target distributions at each proposal position (+ the bonus
    position); ``p_drafts`` [g, V] the draft distributions the proposals
    were sampled from. Returns (tokens, n_accepted): each proposal x is
    accepted with prob min(1, p_t(x)/p_d(x)); the first rejection is
    replaced by a sample from normalize(max(0, p_t - p_d)) and the round
    stops; a fully-accepted round appends a bonus sample from the target's
    own next distribution. The output sequence is distributed EXACTLY as
    target-only sampling."""
    g = len(drafts)
    toks: list = []
    for i, x in enumerate(drafts):
        pt, pd = p_targets[i], p_drafts[i]
        if rng.random() < min(1.0, float(pt[x]) / max(float(pd[x]), 1e-30)):
            toks.append(int(x))
            continue
        resid = np.clip(pt - pd, 0.0, None)
        tot = resid.sum()
        resid = resid / tot if tot > 0 else pt
        toks.append(int(rng.choice(len(resid), p=resid)))
        return toks, i
    toks.append(int(rng.choice(p_targets.shape[1], p=p_targets[g])))
    return toks, g


@dataclass
class SpeculativeEngine:
    """Speculative decoding: greedy (temperature 0, longest-agreeing-prefix
    verification) or sampled (temperature > 0, rejection-scheme verification
    — output distributed exactly as target-only sampling). ``gamma`` draft
    tokens per round; single-sequence (the continuous-batching integration
    is the natural next step)."""
    cfg: ModelConfig
    params: Dict[str, Any]
    draft_cfg: ModelConfig
    draft_params: Dict[str, Any]
    backend: str = "reference"
    draft_backend: str = "reference"
    gamma: int = 4
    max_seq: int = 2048

    def generate(self, input_ids: np.ndarray, max_new_tokens: int = 32,
                 eos_id: int = -1, return_stats: bool = False,
                 temperature: float = 0.0, seed: int = 0):
        ids = np.asarray(input_ids, np.int32).reshape(1, -1)
        if ids.shape[1] + max_new_tokens > self.max_seq:
            raise ValueError("sequence exceeds max_seq")
        g = self.gamma
        sampled = temperature > 0.0
        rng = np.random.default_rng(seed)
        cache_t = init_cache(self.cfg, 1, self.max_seq)
        cache_d = init_cache(self.draft_cfg, 1, self.max_seq)
        jids = jnp.asarray(ids)
        logits_t, cache_t = prefill(self.cfg, self.params, cache_t, jids,
                                    self.backend)
        logits_d, cache_d = prefill(self.draft_cfg, self.draft_params,
                                    cache_d, jids, self.draft_backend)
        pos = ids.shape[1]
        if sampled:
            p0 = _softmax(np.asarray(logits_t[0]), temperature)
            last = int(rng.choice(p0.shape[0], p=p0))
        else:
            last = int(jnp.argmax(logits_t[0]))
        out = [last]
        proposed = accepted = 0
        while len(out) < max_new_tokens and (eos_id < 0 or last != eos_id):
            # draft proposes g continuations of `last`
            drafts = []
            p_drafts = []
            tok = jnp.asarray([last], jnp.int32)
            for i in range(g):
                logits_d, cache_d = decode_step(
                    self.draft_cfg, self.draft_params, cache_d, tok,
                    jnp.int32(pos + i), self.draft_backend)
                if sampled:
                    pd = _softmax(np.asarray(logits_d[0]), temperature)
                    p_drafts.append(pd)
                    t = int(rng.choice(pd.shape[0], p=pd))
                    tok = jnp.asarray([t], jnp.int32)
                else:
                    tok = jnp.argmax(logits_d, axis=-1).astype(jnp.int32)
                drafts.append(int(tok[0]))
            # target scores [last, d_1..d_g] in one extend
            block = jnp.asarray([[last] + drafts], jnp.int32)
            logits, cache_t = extend(self.cfg, self.params, cache_t, block,
                                     jnp.int32(pos), self.backend)
            if sampled:
                p_targets = np.stack([
                    _softmax(np.asarray(logits[0, i]), temperature)
                    for i in range(g + 1)])
                new, a = verify_rejection(p_targets, np.stack(p_drafts),
                                          drafts, rng)
            else:
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


__all__ = ["SpeculativeEngine", "extend", "verify_rejection"]
