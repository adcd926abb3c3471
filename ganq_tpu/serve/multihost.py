"""Cross-host continuous batching: host0-coordinated control plane.

SURVEY.md §5.8 names this as net-new TPU design surface: "host-side RPC for
cross-host continuous batching control plane". In multi-host JAX every
process must execute the SAME jitted programs with the same shapes, but the
request queue only exists where the server binds (process 0). This module
keeps the slot scheduler deterministic across hosts:

- requests are submitted on the coordinator only (``distributed.
  coordinator_only`` is how the OpenAI server binds);
- each engine step, the coordinator PLANS admissions (which request enters
  which slot at which prompt bucket) and broadcasts a fixed-shape control
  record via ``multihost_utils.broadcast_one_to_all`` — the only cross-host
  host-level communication; everything else (prefill, batched decode,
  sampling) is the identical device program replayed on every process, so
  per-step state (tokens, positions, retirements) stays in lockstep without
  further messages. Sampling uses a shared jax PRNG key folded per step —
  deterministic everywhere.

Requires the serving layout where decode logits are addressable on every
process (tensor/model-parallel sharding, slots replicated across hosts) —
the standard multi-host TP serving topology. Sharding slots over hosts (DP)
would need a logits allgather and is future work.

Single-process runs degenerate exactly to :class:`BatchingEngine` semantics
(``broadcast_one_to_all`` is the identity), which is what the tests verify.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..utils.logger import get_logger
from ..parallel.distributed import is_coordinator
from .batching import BatchingEngine, Request

log = get_logger(__name__)


def _broadcast(tree):
    from jax.experimental import multihost_utils
    if jax.process_count() == 1:
        return tree
    return multihost_utils.broadcast_one_to_all(tree)


class MultiHostBatchingEngine(BatchingEngine):
    """Continuous batching whose scheduler decisions replicate across hosts.

    Control record per step (fixed shapes so the broadcast compiles once):
    ``meta [slots, 5]`` int32 rows ``(admit_flag, req_id, prompt_len,
    max_new_tokens, temperature_milli)`` and ``prompts [slots, max_seq]``
    int32. Slot index = row index.
    """

    def submit(self, prompt, max_new_tokens: int = 32,
               temperature: float = 0.0) -> int:
        if not is_coordinator():
            raise RuntimeError("submit() is coordinator-only: requests "
                               "enter on process 0 and admissions are "
                               "broadcast (SURVEY §5.8 control plane)")
        return super().submit(prompt, max_new_tokens, temperature)

    # ------------------------------------------------------------- admission
    def _plan(self) -> Dict[str, np.ndarray]:
        """Coordinator: pop queue into a fixed-shape admission plan."""
        meta = np.zeros((self.slots, 5), np.int32)
        prompts = np.zeros((self.slots, self.max_seq), np.int32)
        if is_coordinator():
            for i in range(self.slots):
                if self.slot_req[i] is not None or not self.queue:
                    continue
                r = self.queue.pop(0)
                self._planned[r.req_id] = r
                meta[i] = (1, r.req_id, len(r.prompt), r.max_new_tokens,
                           int(round(r.temperature * 1000)))
                prompts[i, :len(r.prompt)] = r.prompt
        return {"meta": meta, "prompts": prompts}

    def _admit(self) -> Dict[int, int]:
        if not hasattr(self, "_planned"):
            self._planned: Dict[int, Request] = {}
        plan = _broadcast(self._plan())
        meta = np.asarray(plan["meta"])
        prompts = np.asarray(plan["prompts"])
        emitted: Dict[int, int] = {}
        for i in range(self.slots):
            admit, req_id, n, mnt, temp_m = (int(v) for v in meta[i])
            if not admit:
                continue
            prompt = prompts[i, :n]
            # non-coordinators materialize a shadow Request so retirement
            # bookkeeping (done flags, generated tokens) stays in lockstep
            r = self._planned.pop(req_id, None) if is_coordinator() else None
            if r is None:
                r = Request(req_id, prompt.copy(), mnt, temp_m / 1000.0)
            # shared admission path (batching.py _admit_slot): first-token
            # sampling uses the deterministic PRNG chain -> lockstep replay
            first = self._admit_slot(i, r)
            if first is not None:
                emitted[r.req_id] = first
        return emitted


__all__ = ["MultiHostBatchingEngine"]
