"""Speculative decoding: output must be EXACTLY the target-only greedy
continuation (the algorithm's correctness guarantee), for both a perfect
draft (the target itself) and a weak independent draft."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from ganq_tpu.models import hf_import  # noqa: E402
from ganq_tpu.serve import engine  # noqa: E402
from ganq_tpu.serve.speculative import SpeculativeEngine  # noqa: E402


def _model(seed, layers=2):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256)
    torch.manual_seed(seed)
    return hf_import.params_from_torch_model(
        transformers.LlamaForCausalLM(hf_cfg))


def test_self_draft_accepts_everything(rng):
    cfg, params = _model(30)
    prompt = rng.integers(0, 256, size=(1, 10)).astype(np.int32)
    ref = engine.Engine(cfg, params, max_seq=64).generate(
        prompt, max_new_tokens=12)
    spec = SpeculativeEngine(cfg, params, cfg, params, gamma=4, max_seq=64)
    out, stats = spec.generate(prompt, max_new_tokens=12, return_stats=True)
    np.testing.assert_array_equal(out, ref)
    # the draft IS the target, but random-init models have near-flat logits,
    # so the s=1 decode vs s=gamma+1 extend programs can flip argmax
    # near-ties; on a real checkpoint this sits near 1.0
    assert stats["acceptance_rate"] >= 0.5


def test_weak_draft_still_exact(rng):
    cfg, params = _model(31, layers=2)
    dcfg, dparams = _model(32, layers=1)  # independent random draft
    prompt = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    ref = engine.Engine(cfg, params, max_seq=64).generate(
        prompt, max_new_tokens=10)
    spec = SpeculativeEngine(cfg, params, dcfg, dparams, gamma=3, max_seq=64)
    out, stats = spec.generate(prompt, max_new_tokens=10, return_stats=True)
    np.testing.assert_array_equal(out, ref)
    # a random draft almost never agrees — the slow path must carry it
    assert stats["proposed"] > 0


def test_eos_stops_speculative(rng):
    cfg, params = _model(33)
    prompt = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    full = engine.Engine(cfg, params, max_seq=64).generate(
        prompt, max_new_tokens=16)
    eos = int(full[0, 3])  # force an eos hit mid-stream
    ref = engine.Engine(cfg, params, max_seq=64).generate(
        prompt, max_new_tokens=16, eos_id=eos)
    spec = SpeculativeEngine(cfg, params, cfg, params, gamma=4, max_seq=64)
    out = spec.generate(prompt, max_new_tokens=16, eos_id=eos)
    # both stop at the first eos; engine pads with eos to full length
    n = out.shape[1]
    np.testing.assert_array_equal(out[0], ref[0, :n])
    assert eos in out[0]


def test_rejection_kernel_preserves_target_distribution(rng):
    """The accept/reject math must reproduce the target distribution exactly
    regardless of the draft — checked empirically against analytic p_t."""
    from ganq_tpu.serve.speculative import verify_rejection

    nprng = np.random.default_rng(0)
    V = 6
    p_t = np.array([0.4, 0.25, 0.15, 0.1, 0.07, 0.03])
    p_d = np.array([0.05, 0.05, 0.2, 0.3, 0.2, 0.2])  # badly mismatched
    counts = np.zeros(V)
    trials = 40000
    for _ in range(trials):
        x = int(nprng.choice(V, p=p_d))
        toks, _ = verify_rejection(p_t[None, :].repeat(2, 0), p_d[None, :],
                                   [x], nprng)
        counts[toks[0]] += 1
    emp = counts / trials
    # ~3 sigma of a multinomial at 40k trials
    np.testing.assert_allclose(emp, p_t, atol=0.012)


def test_rejection_perfect_draft_accepts_all(rng):
    from ganq_tpu.serve.speculative import verify_rejection

    nprng = np.random.default_rng(1)
    p = np.array([0.5, 0.3, 0.2])
    toks, a = verify_rejection(np.stack([p, p, p]), np.stack([p, p]),
                               [0, 1], nprng)
    assert a == 2 and len(toks) == 3  # both accepted + bonus


def test_sampled_speculative_runs_and_matches_vocab(rng):
    """End-to-end sampled speculative decode: valid tokens, sane stats, and
    a self-draft accepts (p_t == p_d => accept prob 1)."""
    cfg, params = _model(34)
    prompt = rng.integers(0, 256, size=(1, 8)).astype(np.int32)
    spec = SpeculativeEngine(cfg, params, cfg, params, gamma=3, max_seq=64)
    out, stats = spec.generate(prompt, max_new_tokens=12, temperature=0.8,
                               return_stats=True, seed=3)
    assert out.shape == (1, 12)
    assert np.all((out >= 0) & (out < 256))
    # identical draft/target distributions accept every proposal
    assert stats["acceptance_rate"] == 1.0

    # weak independent draft still produces valid output
    dcfg, dparams = _model(35, layers=1)
    spec2 = SpeculativeEngine(cfg, params, dcfg, dparams, gamma=3, max_seq=64)
    out2, stats2 = spec2.generate(prompt, max_new_tokens=12, temperature=0.8,
                                  return_stats=True, seed=4)
    assert out2.shape == (1, 12)
    assert 0.0 <= stats2["acceptance_rate"] <= 1.0


# --------------------------------------------------------------------------
# Speculative rounds inside continuous batching
from ganq_tpu.serve.batching import BatchingEngine  # noqa: E402
from ganq_tpu.serve.speculative import SpeculativeBatchingEngine  # noqa: E402


def test_spec_batching_greedy_matches_plain_batching(rng):
    """Per-slot speculative rounds must reproduce the plain continuous-
    batching greedy output token-for-token, at mixed prompt lengths (the
    per-slot position vectors) and with more requests than slots."""
    cfg, params = _model(31)
    dcfg, dparams = _model(77, layers=1)      # weak independent draft
    prompts = [rng.integers(1, 256, size=(n,)).astype(np.int32)
               for n in (6, 9, 12, 8, 14)]

    plain = BatchingEngine(cfg, params, slots=2, max_seq=64,
                           prompt_buckets=(8, 16))
    ids_p = [plain.submit(p, max_new_tokens=6) for p in prompts]
    expected = plain.run_all()

    spec = SpeculativeBatchingEngine(cfg, params, dcfg, dparams, slots=2,
                                     max_seq=64, gamma=3,
                                     prompt_buckets=(8, 16))
    ids_s = [spec.submit(p, max_new_tokens=6) for p in prompts]
    got = spec.run_all()
    for rp, rs in zip(ids_p, ids_s):
        assert expected[rp] == got[rs], (expected[rp], got[rs])
    assert spec.proposed > 0


def test_spec_batching_self_draft_high_acceptance(rng):
    cfg, params = _model(32)
    prompts = [rng.integers(1, 256, size=(8,)).astype(np.int32)
               for _ in range(3)]
    spec = SpeculativeBatchingEngine(cfg, params, cfg, params, slots=3,
                                     max_seq=64, gamma=4,
                                     prompt_buckets=(8,))
    for p in prompts:
        spec.submit(p, max_new_tokens=8)
    out = spec.run_all()
    assert all(len(t) == 8 for t in out.values())
    # self-draft on near-flat random logits: >=0.5 (s=1 vs s=g+1 argmax
    # near-tie flips); near 1.0 on a real checkpoint
    assert spec.acceptance_rate >= 0.5


def test_spec_batching_sampled_runs_and_respects_budget(rng):
    cfg, params = _model(33)
    dcfg, dparams = _model(78, layers=1)
    spec = SpeculativeBatchingEngine(cfg, params, dcfg, dparams, slots=2,
                                     max_seq=64, gamma=3,
                                     prompt_buckets=(8,), seed=5)
    r1 = spec.submit(rng.integers(1, 256, size=(8,)).astype(np.int32),
                     max_new_tokens=7, temperature=0.8)
    r2 = spec.submit(rng.integers(1, 256, size=(6,)).astype(np.int32),
                     max_new_tokens=5, temperature=0.0)
    out = spec.run_all()
    assert len(out[r1]) == 7 and len(out[r2]) == 5
    assert all(0 <= t < 256 for t in out[r1] + out[r2])
