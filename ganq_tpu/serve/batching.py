"""Continuous batching: slot-based KV cache + host scheduler.

Net-new vs the reference (whose serving path is one HF ``generate`` call per
request, ``utils/openai_server.py``): a fixed pool of B cache slots; incoming
requests prefill into a free slot (prompt right-padded to a length bucket so
jit signatures stay bounded); every engine step decodes all active slots in
one batched program with per-slot positions; finished slots retire and are
reused immediately. The chip never waits for the longest request in a batch.

All device work is three jit programs: slot prefill, batched decode, cache
slot clear — compile once per (bucket, batch) shape.
"""

from __future__ import annotations

import functools
import itertools
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import (ModelConfig, embed, layer_forward,
                                  rope_for_layer, rope_tables_all,
                                  unembed)
from ..utils.logger import get_logger
from .engine import init_cache

log = get_logger(__name__)


# ------------------------------------------------------------ device programs
@functools.partial(jax.jit, static_argnames=("cfg", "backend"),
                   donate_argnums=(2,))
def prefill_into_slot(cfg: ModelConfig, params, cache, ids, slot,
                      backend: str = "reference"):
    """Prefill ids [1, s] and write k/v (or MLA compressed c/kpe) into batch
    cache slot ``slot``. Returns (last logits [vocab], cache)."""
    b1, s = ids.shape
    m = cfg.num_meta_tokens
    positions = jnp.broadcast_to(jnp.arange(s) + m, (b1, s))
    x = embed(cfg, params, ids, positions)
    if m:  # hymba meta tokens: learnable prefix at cache rows [0, m)
        meta = params["meta_tokens"].astype(x.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(meta[None], (b1, m, meta.shape[1])), x],
            axis=1)
        positions = jnp.broadcast_to(jnp.arange(s + m), (b1, s + m))
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        # per-key batch-1 shapes: k/v are [1, T, ...] but hymba's ssm/conv
        # streaming states carry their own trailing dims
        slot_cache = {key: jnp.zeros((1, *lc[key].shape[1:]),
                                     lc[key].dtype) for key in lc}
        ko = None
        # hymba cross-layer KV reuse: the consumer attends over the
        # PRODUCER's freshly-prefilled slot rows
        if cfg.kv_reuse_map is not None and cfg.kv_reuse_map[i] != i:
            srcp = new_cache[cfg.kv_reuse_map[i]]
            ko = {"k": jax.lax.dynamic_slice_in_dim(srcp["k"], slot, 1, 0),
                  "v": jax.lax.dynamic_slice_in_dim(srcp["v"], slot, 1, 0)}
        x, sc, _ = layer_forward(cfg, lp, x, None,
                                 rope_for_layer(cfg, rope, i),
                                 cache=slot_cache,
                                 cache_pos=0, backend=backend,
                                 window=cfg.layer_window(i),
                                 kv_override=ko)
        new_cache.append({
            key: jax.lax.dynamic_update_slice(
                lc[key], sc[key].astype(lc[key].dtype),
                (slot,) + (0,) * (lc[key].ndim - 1))
            for key in lc})
    logits = unembed(cfg, params, x[:, -1:, :])
    return logits[0, 0, :], new_cache


@functools.partial(jax.jit, static_argnames=("cfg", "backend"),
                   donate_argnums=(2,))
def _decode_slots_impl(cfg: ModelConfig, params, cache, tokens, pos, backend):
    """One decode step over all slots at per-slot positions ``pos`` [b].

    Runs the full ``layer_forward`` (MoE, MLA absorbed decode, ALiBi,
    sliding windows, per-layer GQA) with a *vector* cache_pos — the
    scatter-at-position cache write lives in transformer._cache_write_vec."""
    # "k" (or MLA "c") explicitly — hymba caches carry conv/ssm states
    # whose dim-1 is NOT the sequence length
    lc0 = cache[0]
    max_seq = (lc0["k"] if "k" in lc0 else lc0["c"]).shape[1]
    positions = pos[:, None]
    x = embed(cfg, params, tokens[:, None], positions)
    mask = (jnp.arange(max_seq)[None, :] <= pos[:, None])[:, None, None, :]
    rope = rope_tables_all(cfg, positions) if cfg.pos == "rope" else None
    new_cache = []
    for i, (lp, lc) in enumerate(zip(params["layers"], cache)):
        ko = None
        # hymba cross-layer KV reuse at per-slot positions: the producer
        # layer has already scattered this step's k/v into its cache
        if cfg.kv_reuse_map is not None and cfg.kv_reuse_map[i] != i:
            src = new_cache[cfg.kv_reuse_map[i]]
            ko = {"k": src["k"], "v": src["v"]}
        x, lc, _ = layer_forward(cfg, lp, x, mask,
                                 rope_for_layer(cfg, rope, i), cache=lc,
                                 cache_pos=pos, backend=backend,
                                 window=cfg.layer_window(i),
                                 kv_override=ko)
        new_cache.append(lc)
    logits = unembed(cfg, params, x)[:, 0, :]
    return logits, new_cache


# ------------------------------------------------------- megastep fast path
@functools.partial(jax.jit, static_argnames=("cfg", "backend"),
                   donate_argnums=(3, 4))
def _mega_prefill_slot(cfg: ModelConfig, sp, ids, mk, mv, slot,
                       backend: str = "reference"):
    """Prefill ids [1, s] through the stacked path and write the slot's
    rows of the mega-layout cache [L, S*Hkv, T, d]."""
    from . import stacked as _stacked

    L = mk.shape[0]
    T = mk.shape[2]
    ck1, cv1 = _stacked.init_cache(cfg, L, 1, T)
    logits, ck1, cv1 = _stacked.prefill(cfg, sp, ck1, cv1, ids, backend)
    Hkv = ck1.shape[3]
    rows_k = ck1[:, 0].transpose(0, 2, 1, 3)     # [L, Hkv, T, d]
    rows_v = cv1[:, 0].transpose(0, 2, 1, 3)
    mk = jax.lax.dynamic_update_slice(mk, rows_k.astype(mk.dtype),
                                      (0, slot * Hkv, 0, 0))
    mv = jax.lax.dynamic_update_slice(mv, rows_v.astype(mv.dtype),
                                      (0, slot * Hkv, 0, 0))
    return logits[0], mk, mv        # stacked.prefill returns LAST logits


@functools.partial(jax.jit, static_argnames=("cfg", "variant"),
                   donate_argnums=(3, 4))
def _mega_decode_slots(cfg: ModelConfig, sp, mp, mk, mv, tokens, pos,
                       variant: str = "w4"):
    """One W4A8/W3A8/W2A8 megastep over all slots at per-slot positions (the
    continuous-batching analog of _decode_slots_impl): ONE kernel launch
    for the whole layer stack, per-row rope tables and history masks."""
    import math

    from ..models.transformer import (_fused_act_kind, rope_tables)
    from ..ops.megastep4 import megastep4_decode
    from ..ops.megastep_lowbit import megastep_lowbit_decode

    S = tokens.shape[0]
    L = mk.shape[0]
    d = cfg.head_dim
    kw = {}
    logits = None
    if variant == "w4":
        step_fn = megastep4_decode
        kv_dim = (mp["qkv_p4"].shape[1] * 2 - cfg.q_dim) // 2
    else:
        from ..ops.megastep_lowbit import mega_lm_operands
        from .stacked import _LB_BITS, _lb_kv_dim
        step_fn = megastep_lowbit_decode
        kw["bits"] = _LB_BITS[variant]
        if variant == "wl8":
            kw["walsh"] = 7          # exact 8-DOF codebook decode
        kv_dim = _lb_kv_dim(cfg, mp, kw["bits"])
        lm_ops = mega_lm_operands(cfg, sp)
        if lm_ops is not None:
            kw["lm"] = lm_ops
    Hkv = kv_dim // d
    positions = pos[:, None]
    x = embed(cfg, sp, tokens[:, None], positions)[:, 0, :]
    if variant != "w4":
        from .stacked import _mega_rope_kw
        rd, ch, sh, lb_kw = _mega_rope_kw(cfg, positions, S, L,
                                          mk.shape[2], vec=True)
        kw.update(lb_kw)
    else:
        from ..models.transformer import _rope_half_tables_vec
        rd, ch, sh = _rope_half_tables_vec(cfg, rope_tables(cfg, positions))
    scale = (cfg.attn_scale if cfg.attn_scale is not None
             else 1.0 / math.sqrt(d))
    out = step_fn(
        x, mp, mk, mv, pos, ch, sh,
        q_dim=cfg.q_dim, kv_dim=kv_dim, head_dim=d, rotary_dim=rd,
        interleaved=cfg.rope_interleaved, eps=cfg.norm_eps,
        rms_offset=cfg.rms_offset, scale=scale, act=_fused_act_kind(cfg),
        interpret=jax.default_backend() == "cpu", **kw)
    if len(out) == 4:                       # trailing-unembed fold engaged
        from .stacked import _fold_logit_epilogue
        y, kn, vn, logits = out
        logits = _fold_logit_epilogue(cfg, logits)
    else:
        y, kn, vn = out
    # per-slot scatter of the new k/v at each slot's own position
    T = mk.shape[2]
    mk5 = mk.reshape(L, S, Hkv, T, d)
    mv5 = mv.reshape(L, S, Hkv, T, d)
    kn5 = kn.reshape(L, S, Hkv, 1, d).astype(mk.dtype)
    vn5 = vn.reshape(L, S, Hkv, 1, d).astype(mv.dtype)
    upd = jax.vmap(
        lambda c, u, p: jax.lax.dynamic_update_slice(c, u, (0, 0, p, 0)),
        in_axes=(1, 1, 0), out_axes=1)
    mk = upd(mk5, kn5, pos).reshape(L, S * Hkv, T, d)
    mv = upd(mv5, vn5, pos).reshape(L, S * Hkv, T, d)
    if logits is None:
        logits = unembed(cfg, sp, y[:, None, :], "pallas" if jax.default_backend() != "cpu" else "reference")[:, 0, :]
    return logits, mk, mv


# --------------------------------------------------------------- host scheduler
@dataclass
class Request:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0
    generated: List[int] = field(default_factory=list)
    done: bool = False


class BatchingEngine:
    """Continuous-batching scheduler over a fixed slot pool."""

    def __init__(self, cfg: ModelConfig, params: Dict[str, Any],
                 backend: str = "reference", slots: int = 4,
                 max_seq: int = 512, eos_id: int = -1,
                 prompt_buckets=(32, 64, 128, 256, 512),
                 mla_absorb: bool = True):
        self.cfg = cfg
        self._absorbed = bool(mla_absorb and cfg.mla)
        if self._absorbed:
            from ..models.transformer import absorb_mla_params
            params = absorb_mla_params(cfg, params)
        self.params = params
        self.backend = backend
        self.slots = slots
        self.max_seq = max_seq
        self.eos_id = eos_id
        self.buckets = [b for b in prompt_buckets if b <= max_seq]
        # megastep fast path: homogeneous uniform-W4 models decode all
        # slots in ONE whole-stack kernel (serve/stacked.mega_enabled)
        self._sp = None
        self._mega_kv = None
        self._mega_variant = None
        from . import stacked as _stacked
        layers = params.get("layers")
        # cheap env/backend gate FIRST: stack_layers copies the whole
        # model on device, so only attempt it when the path could engage
        if (_stacked.mega_env_enabled(backend, slots) and not cfg.mla
                and not cfg.ssm_hybrid
                and cfg.kv_heads_per_layer is None
                and isinstance(layers, list) and len(layers) > 1
                and len({jax.tree_util.tree_structure(lp)
                         for lp in layers}) == 1):
            try:
                sp = _stacked.stack_layers(params, recode="affine")
            except ValueError:
                sp = None
            if sp is not None and os.environ.get(
                    "GANQ_W8_PLANE", "1") != "0":
                # int8 (w8-kind) recodes convert losslessly onto the plane
                # megastep before gating (serve/stacked.w8p_stacked), with
                # the GANQ_W8_PLANE opt-out prepack honors. Unlike the
                # static-batch path (which prefers the per-row w8 kernel
                # at batch <= 8, PERF.md r5), batching needs PER-SLOT
                # positions, which only the plane kernels support — so the
                # conversion applies at every slot count here.
                sp = _stacked.w8p_stacked(sp)
            variant = (None if sp is None
                       else _stacked.mega_enabled(cfg, sp, backend, slots))
            if variant in ("w4", "w4p", "w3", "w2", "w8p", "wl8"):
                self._mega_variant = variant
                self._sp = _stacked.prepack(cfg, sp, backend, slots)
                L = cfg.num_hidden_layers
                Hkv = cfg.num_key_value_heads
                self._mega_kv = (
                    jnp.zeros((L, slots * Hkv, max_seq, cfg.head_dim),
                              jnp.bfloat16),
                    jnp.zeros((L, slots * Hkv, max_seq, cfg.head_dim),
                              jnp.bfloat16))
                # every device program in mega mode reads self._sp only;
                # drop the per-layer param tree (it would otherwise keep
                # a second full copy of the weights resident)
                self.params = None
                params = None
                log.info("batching: %s megastep fast path active", variant)
        self.cache = (None if self._mega_kv is not None else
                      init_cache(cfg, slots, max_seq,
                                 mla_absorbed=self._absorbed))
        self.pos = np.zeros(slots, np.int32)           # next write position
        self.tokens = np.zeros(slots, np.int32)        # last sampled token
        self.slot_req: List[Optional[Request]] = [None] * slots
        self.queue: List[Request] = []
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(0)

    # ---------------------------------------------------------------- public
    def submit(self, prompt, max_new_tokens: int = 32,
               temperature: float = 0.0) -> int:
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        if (len(prompt) + max_new_tokens
                + self.cfg.num_meta_tokens > self.max_seq):
            raise ValueError("request exceeds max_seq")
        r = Request(next(self._ids), prompt, max_new_tokens, temperature)
        self.queue.append(r)
        return r.req_id

    def step(self) -> Dict[int, List[int]]:
        """Admit from queue, run one decode step; returns the tokens emitted
        THIS call per request — up to two for a request admitted this step
        (exact-bucket admission samples its first token during prefill)."""
        out: Dict[int, List[int]] = {rid: [t]
                                     for rid, t in self._admit().items()}
        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return out
        if self._mega_kv is not None:
            mk, mv = self._mega_kv
            mp_key = {"w4": "megapack4",
                      "wl8": "megapack_wl"}.get(self._mega_variant,
                                                "megapack_lb")
            logits, mk, mv = _mega_decode_slots(
                self.cfg, self._sp, self._sp[mp_key], mk, mv,
                jnp.asarray(self.tokens), jnp.asarray(self.pos),
                self._mega_variant)
            self._mega_kv = (mk, mv)
        else:
            logits, self.cache = _decode_slots_impl(
                self.cfg, self.params, self.cache,
                jnp.asarray(self.tokens), jnp.asarray(self.pos), self.backend)
        logits = np.asarray(logits, np.float32)
        for i in active:
            r = self.slot_req[i]
            tok = int(np.argmax(logits[i]))
            if r.temperature > 0:
                self._key, sub = jax.random.split(self._key)
                tok = int(jax.random.categorical(
                    sub, jnp.asarray(logits[i]) / r.temperature))
            r.generated.append(tok)
            out.setdefault(r.req_id, []).append(tok)
            self.pos[i] += 1
            self.tokens[i] = tok
            if ((self.eos_id >= 0 and tok == self.eos_id)
                    or len(r.generated) >= r.max_new_tokens
                    or self.pos[i] >= self.max_seq):
                r.done = True
                self.slot_req[i] = None
        return out

    def run_all(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Drive until queue and slots drain; returns {req_id: tokens}."""
        results: Dict[int, List[int]] = {}
        submitted = {r.req_id: r for r in self.queue}
        for _ in range(max_steps):
            if not self.queue and all(s is None for s in self.slot_req):
                break
            for i, r in enumerate(self.slot_req):
                if r is not None:
                    submitted.setdefault(r.req_id, r)
            self.step()
        return {rid: r.generated for rid, r in submitted.items()}

    # --------------------------------------------------------------- private
    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.max_seq

    def _sample_first(self, logits, temperature: float) -> int:
        """First-token sampling at admission — same policy as decode steps
        (deterministic PRNG chain, so multihost replicas stay lockstep)."""
        if temperature > 0:
            self._key, sub = jax.random.split(self._key)
            return int(jax.random.categorical(
                sub, jnp.asarray(logits, jnp.float32) / temperature))
        return int(np.argmax(np.asarray(logits)))

    def _admit_slot(self, i: int, r: Request) -> Optional[int]:
        """Prefill ``r`` into slot ``i``. Returns the first token when the
        prompt exactly fills its bucket (sampled from the prefill logits);
        padded prompts re-decode token n-1 on the next step instead."""
        n = len(r.prompt)
        # hybrid (SSM) models prefill at EXACT length: the selective-scan
        # and conv streaming states are recurrences over every prefilled
        # position, so bucket padding would fold pad tokens into the
        # state (attention masks them; the scan cannot). Costs one
        # compile per distinct prompt length instead of per bucket.
        bucket = n if self.cfg.ssm_hybrid else self._bucket(n)
        padded = np.zeros(bucket, np.int32)
        padded[:n] = r.prompt
        if self._mega_kv is not None:
            mk, mv = self._mega_kv
            logits, mk, mv = _mega_prefill_slot(
                self.cfg, self._sp, jnp.asarray(padded[None, :]), mk, mv,
                i, self.backend)
            self._mega_kv = (mk, mv)
        else:
            logits, self.cache = prefill_into_slot(
                self.cfg, self.params, self.cache,
                jnp.asarray(padded[None, :]), i, self.backend)
        m = self.cfg.num_meta_tokens  # hymba prefix rows [0, m) in cache
        if bucket == n:
            first = self._sample_first(logits, r.temperature)
            r.generated.append(first)
            self.tokens[i] = first
            self.pos[i] = n + m
            self.slot_req[i] = r
            if ((self.eos_id >= 0 and first == self.eos_id)
                    or r.max_new_tokens <= 1):
                r.done = True
                self.slot_req[i] = None
            return first
        # padded prefill: position n-1 logits are internal; set up so the
        # next decode step recomputes token n-1 -> samples token n
        self.tokens[i] = int(r.prompt[-1])
        self.pos[i] = n - 1 + m
        self.slot_req[i] = r
        return None

    def _admit(self) -> Dict[int, int]:
        """Fill free slots; returns first tokens sampled during admission."""
        emitted: Dict[int, int] = {}
        for i in range(self.slots):
            if self.slot_req[i] is not None or not self.queue:
                continue
            r = self.queue.pop(0)
            first = self._admit_slot(i, r)
            if first is not None:
                emitted[r.req_id] = first
        return emitted


class ThreadedBatcher:
    """Thread-safe front for :class:`BatchingEngine`: concurrent callers
    submit and block; one worker thread drives engine steps so independent
    requests share decode batches (what the OpenAI server uses with
    ``use_batching=True``)."""

    def __init__(self, cfg, params, backend: str = "reference", slots: int = 4,
                 max_seq: int = 512, eos_id: int = -1):
        import threading

        self.engine = BatchingEngine(cfg, params, backend=backend, slots=slots,
                                     max_seq=max_seq, eos_id=eos_id)
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._done: Dict[int, List[int]] = {}
        self._tracked: Dict[int, Request] = {}
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        import time as _time
        while not self._stop:
            with self._cv:
                has_work = (self.engine.queue
                            or any(s is not None for s in self.engine.slot_req))
            if not has_work:
                _time.sleep(0.005)
                continue
            with self._cv:
                for r in list(self.engine.queue):
                    self._tracked[r.req_id] = r
                for r in self.engine.slot_req:
                    if r is not None:
                        self._tracked[r.req_id] = r
                self.engine.step()
                finished = [rid for rid, r in self._tracked.items() if r.done]
                for rid in finished:
                    self._done[rid] = self._tracked.pop(rid).generated
                if finished:
                    self._cv.notify_all()

    def generate_ids(self, prompt_ids, max_new_tokens: int = 32,
                     temperature: float = 0.0, timeout: float = 600.0):
        with self._cv:
            rid = self.engine.submit(prompt_ids, max_new_tokens, temperature)
            ok = self._cv.wait_for(lambda: rid in self._done, timeout=timeout)
            if not ok:
                raise TimeoutError(f"request {rid} timed out")
            return self._done.pop(rid)

    def shutdown(self) -> None:
        self._stop = True
        self._thread.join(timeout=5)


__all__ = ["BatchingEngine", "Request", "ThreadedBatcher"]
