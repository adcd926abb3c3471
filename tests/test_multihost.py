"""Multi-host continuous-batching control plane (serve/multihost.py).

Single-process tests: (1) the coordinator path degenerates exactly to the
plain BatchingEngine; (2) a simulated NON-coordinator replaying the
coordinator's broadcast control records reproduces the identical token
stream with shadow requests (the lockstep property the design rests on);
(3) submit() off-coordinator fails loudly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.models import hf_import  # noqa: E402
from ganq_tpu.serve.batching import BatchingEngine  # noqa: E402
from ganq_tpu.serve import multihost  # noqa: E402
from ganq_tpu.serve.multihost import MultiHostBatchingEngine  # noqa: E402


def tiny(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128)
    torch.manual_seed(seed)
    return hf_import.params_from_torch_model(
        transformers.LlamaForCausalLM(hf_cfg))


def test_coordinator_matches_plain_engine(rng):
    cfg, params = tiny(40)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (5, 9, 13, 7)]

    plain = BatchingEngine(cfg, params, slots=2, max_seq=64)
    mh = MultiHostBatchingEngine(cfg, params, slots=2, max_seq=64)
    for p in prompts:
        plain.submit(p, max_new_tokens=6)
        mh.submit(p, max_new_tokens=6)
    out_a = plain.run_all()
    out_b = mh.run_all()
    assert out_a == out_b


def test_noncoordinator_replays_broadcast_plans(rng, monkeypatch):
    """Capture the coordinator's control records, then drive a second engine
    pretending to be a non-coordinator whose _plan 'receives' them — the
    replayed engine must emit the identical {req_id: token} stream from
    shadow requests alone."""
    cfg, params = tiny(41)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (5, 9, 13)]

    coord = MultiHostBatchingEngine(cfg, params, slots=2, max_seq=64)
    plans = []
    orig_plan = MultiHostBatchingEngine._plan

    def record_plan(self):
        p = orig_plan(self)
        plans.append({k: v.copy() for k, v in p.items()})
        return p

    monkeypatch.setattr(MultiHostBatchingEngine, "_plan", record_plan)
    for p in prompts:
        coord.submit(p, max_new_tokens=5)
    coord_steps = []
    while any(s is not None for s in coord.slot_req) or coord.queue:
        coord_steps.append(coord.step())

    # ---- replay on a "remote" process: no queue, plans arrive by broadcast
    monkeypatch.setattr(multihost, "is_coordinator", lambda: False)
    it = iter(plans)
    monkeypatch.setattr(MultiHostBatchingEngine, "_plan",
                        lambda self: next(it))
    remote = MultiHostBatchingEngine(cfg, params, slots=2, max_seq=64)
    with pytest.raises(RuntimeError, match="coordinator-only"):
        remote.submit(prompts[0])
    remote_steps = [remote.step() for _ in coord_steps]
    assert remote_steps == coord_steps
    # shadow requests accumulated the same generations
    assert all(s is None for s in remote.slot_req)


def test_sampled_decode_is_deterministic_across_replays(rng, monkeypatch):
    """temperature>0 uses the engine's jax PRNG stream — identical on every
    process given identical control records (no host RNG)."""
    cfg, params = tiny(42)
    prompt = rng.integers(1, 128, size=(6,)).astype(np.int32)

    def run():
        eng = MultiHostBatchingEngine(cfg, params, slots=1, max_seq=64)
        eng.submit(prompt, max_new_tokens=6, temperature=0.9)
        return eng.run_all()

    assert run() == run()
