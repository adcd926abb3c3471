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


# --------------------------------------------------------------------------
# Speculative decoding inside continuous batching: every active slot runs a
# draft/verify round per engine step, at its own sequence position.
@functools.partial(jax.jit, static_argnames=("cfg", "backend"),
                   donate_argnums=(2,))
def extend_slots(cfg: ModelConfig, params, cache, tokens: jax.Array,
                 pos: jax.Array, backend: str = "reference"):
    """Batched multi-token cached step at *per-slot* positions: tokens
    [B, s] for slot b occupy positions pos_b..pos_b+s-1. The verification
    primitive for speculative rounds under continuous batching; one program
    scores every slot's proposal block through the MXU at once."""
    b, s = tokens.shape
    max_seq = next(iter(cache[0].values())).shape[1]
    positions = pos[:, None] + jnp.arange(s)[None, :]            # [b, s]
    x = embed(cfg, params, tokens, positions)
    # query i of slot b (absolute pos_b+i) sees keys <= pos_b+i -> [b,1,s,T]
    mask = (jnp.arange(max_seq)[None, None, :]
            <= positions[:, :, None])[:, None]
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        x, lc, _ = layer_forward(cfg, lp, x, mask,
                                 rope_for_layer(cfg, rope, i), cache=lc,
                                 cache_pos=pos, backend=backend,
                                 window=cfg.layer_window(i))
        new_cache.append(lc)
    return unembed(cfg, params, x), new_cache


class SpeculativeBatchingEngine:
    """Continuous batching with per-slot speculative rounds.

    Each step: the draft decodes ``gamma`` tokens for every active slot
    (batched, per-slot positions), the target verifies all proposal blocks
    in ONE ``extend_slots`` program, and each slot advances by its own
    accepted length. Greedy slots (temperature 0) use longest-agreeing-
    prefix verification; sampled slots use the rejection scheme (output
    distributed exactly as target-only sampling). Slots at different
    positions/acceptance rates interleave freely — the per-slot-position
    cache writes make the whole round position-vectorized.

    Cache discipline matches :class:`SpeculativeEngine`: append-only with a
    per-slot validity pointer; rejected positions leave stale entries that
    are masked and re-written before any later read.
    """

    def __init__(self, cfg: ModelConfig, params, draft_cfg: ModelConfig,
                 draft_params, backend: str = "reference",
                 draft_backend: str = "reference", slots: int = 4,
                 max_seq: int = 512, eos_id: int = -1, gamma: int = 4,
                 prompt_buckets=(32, 64, 128, 256, 512),
                 mla_absorb: bool = True, seed: int = 0):
        from .batching import BatchingEngine

        self.t = BatchingEngine(cfg, params, backend=backend, slots=slots,
                                max_seq=max_seq, eos_id=eos_id,
                                prompt_buckets=prompt_buckets,
                                mla_absorb=mla_absorb)
        self.d = BatchingEngine(draft_cfg, draft_params,
                                backend=draft_backend, slots=slots,
                                max_seq=max_seq, eos_id=eos_id,
                                prompt_buckets=prompt_buckets,
                                mla_absorb=mla_absorb)
        self.gamma = gamma
        self.eos_id = eos_id
        self.max_seq = max_seq
        self._rng = np.random.default_rng(seed)
        self.proposed = 0
        self.accepted = 0

    # ---------------------------------------------------------------- public
    def submit(self, prompt, max_new_tokens: int = 32,
               temperature: float = 0.0) -> int:
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if len(prompt) + max_new_tokens + self.gamma + 1 > self.max_seq:
            raise ValueError("request (+ speculative margin) exceeds max_seq")
        rid = self.t.submit(prompt, max_new_tokens, temperature)
        return rid

    def step(self):
        """Admit, then run one speculative round over all active slots.
        Returns {req_id: [tokens accepted this round]}."""
        from .batching import _decode_slots_impl

        out = {rid: [t] for rid, t in self._admit().items()}
        tgt, dft = self.t, self.d
        active = [i for i, r in enumerate(tgt.slot_req) if r is not None]
        if not active:
            return out
        g = self.gamma
        b = tgt.slots
        sampled = {i: tgt.slot_req[i].temperature for i in active}

        # --- draft proposes g tokens per slot (batched decode steps)
        drafts = np.zeros((b, g), np.int64)
        p_drafts: dict = {i: [] for i in active if sampled[i] > 0}
        tok = dft.tokens.copy()
        dpos = tgt.pos.copy()
        for j in range(g):
            logits, dft.cache = _decode_slots_impl(
                dft.cfg, dft.params, dft.cache,
                jnp.asarray(tok), jnp.asarray(dpos), dft.backend)
            logits = np.asarray(logits, np.float32)
            for i in active:
                if sampled[i] > 0:
                    pd = _softmax(logits[i], sampled[i])
                    p_drafts[i].append(pd)
                    t = int(self._rng.choice(pd.shape[0], p=pd))
                else:
                    t = int(np.argmax(logits[i]))
                drafts[i, j] = t
                tok[i] = t
            dpos = dpos + 1

        # --- target verifies every slot's [last, d_1..d_g] block at once
        block = np.concatenate([tgt.tokens[:, None], drafts], axis=1)
        logits, tgt.cache = extend_slots(
            tgt.cfg, tgt.params, tgt.cache,
            jnp.asarray(block, np.int32), jnp.asarray(tgt.pos), tgt.backend)
        logits = np.asarray(logits, np.float32)       # [b, g+1, V]

        out = {}
        for i in active:
            r = tgt.slot_req[i]
            di = [int(x) for x in drafts[i]]
            if sampled[i] > 0:
                p_t = np.stack([_softmax(logits[i, j], sampled[i])
                                for j in range(g + 1)])
                new, a = verify_rejection(p_t, np.stack(p_drafts[i]), di,
                                          self._rng)
            else:
                greedy = np.argmax(logits[i], axis=-1)
                a = 0
                while a < g and di[a] == int(greedy[a]):
                    a += 1
                new = di[:a] + [int(greedy[a])]
            self.proposed += g
            self.accepted += a
            if self.eos_id >= 0 and self.eos_id in new:
                new = new[:new.index(self.eos_id) + 1]
            room = r.max_new_tokens - len(r.generated)
            new = new[:room]
            r.generated.extend(new)
            out[r.req_id] = out.get(r.req_id, []) + new
            tgt.pos[i] += len(new)
            dft.pos[i] = tgt.pos[i]
            tgt.tokens[i] = dft.tokens[i] = new[-1]
            if (len(r.generated) >= r.max_new_tokens
                    or (self.eos_id >= 0 and new[-1] == self.eos_id)):
                r.done = True
                tgt.slot_req[i] = None
                dft.slot_req[i] = None
        return out

    def run_all(self, max_steps: int = 10_000):
        results = {}
        tracked = {r.req_id: r for r in self.t.queue}
        for _ in range(max_steps):
            if (not self.t.queue
                    and all(s is None for s in self.t.slot_req)):
                break
            for r in self.t.slot_req:
                if r is not None:
                    tracked.setdefault(r.req_id, r)
            self.step()
        return {rid: r.generated for rid, r in tracked.items()}

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0

    # --------------------------------------------------------------- private
    def _admit(self):
        """Admit queued requests into free slots, prefilling BOTH caches.
        Returns {req_id: first_token} for exact-bucket admissions (the
        base-engine contract, batching.py _admit)."""
        emitted = {}
        tgt, dft = self.t, self.d
        for i in range(tgt.slots):
            if tgt.slot_req[i] is not None or not tgt.queue:
                continue
            r = tgt.queue.pop(0)
            n = len(r.prompt)
            bucket = tgt._bucket(n)
            padded = np.zeros(bucket, np.int32)
            padded[:n] = r.prompt
            from .batching import prefill_into_slot
            logits, tgt.cache = prefill_into_slot(
                tgt.cfg, tgt.params, tgt.cache,
                jnp.asarray(padded[None, :]), i, tgt.backend)
            _, dft.cache = prefill_into_slot(
                dft.cfg, dft.params, dft.cache,
                jnp.asarray(padded[None, :]), i, dft.backend)
            if bucket == n:
                if r.temperature > 0:
                    p0 = _softmax(np.asarray(logits, np.float32),
                                  r.temperature)
                    first = int(self._rng.choice(p0.shape[0], p=p0))
                else:
                    first = int(np.argmax(np.asarray(logits)))
                r.generated.append(first)
                emitted[r.req_id] = first
                tgt.tokens[i] = dft.tokens[i] = first
                tgt.pos[i] = dft.pos[i] = n
                tgt.slot_req[i] = dft.slot_req[i] = r
                if ((self.eos_id >= 0 and first == self.eos_id)
                        or r.max_new_tokens <= 1):
                    r.done = True
                    tgt.slot_req[i] = dft.slot_req[i] = None
            else:
                # padded prefill: the round re-decodes token n-1 -> token n
                tgt.tokens[i] = dft.tokens[i] = int(r.prompt[-1])
                tgt.pos[i] = dft.pos[i] = n - 1
                tgt.slot_req[i] = dft.slot_req[i] = r
        return emitted


__all__ += ["SpeculativeBatchingEngine", "extend_slots"]
