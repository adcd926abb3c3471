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
