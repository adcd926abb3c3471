"""Continuous batching: results must match single-request generation, slots
must be reused, mixed-length prompts must interleave correctly."""

import numpy as np
import pytest

from ganq_tpu.models import synthetic
from ganq_tpu.serve.batching import BatchingEngine
from ganq_tpu.serve.engine import Engine


@pytest.fixture(scope="module")
def model():
    cfg = synthetic.llama_config(hidden=64, inter=128, layers=2, heads=4,
                                 kv_heads=2, vocab=128, max_pos=128)
    params = synthetic.make_model(cfg, kind="dense", seed=3)
    return cfg, params


def test_batched_matches_single(model, rng):
    cfg, params = model
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (8, 8, 8)]

    single = Engine(cfg, params, max_seq=64)
    expected = {i: single.generate(p, max_new_tokens=6)[0].tolist()
                for i, p in enumerate(prompts)}

    eng = BatchingEngine(cfg, params, slots=2, max_seq=64,
                         prompt_buckets=(8, 16, 32))
    ids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    out = eng.run_all()
    for i, rid in enumerate(ids):
        assert out[rid] == expected[i], (i, out[rid], expected[i])


def test_mixed_lengths_and_bucketing(model, rng):
    cfg, params = model
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (5, 12, 26)]  # padded to buckets 8/16/32
    single = Engine(cfg, params, max_seq=64)
    expected = [single.generate(p, max_new_tokens=4)[0].tolist() for p in prompts]

    eng = BatchingEngine(cfg, params, slots=3, max_seq=64,
                         prompt_buckets=(8, 16, 32))
    ids = [eng.submit(p, max_new_tokens=4) for p in prompts]
    out = eng.run_all()
    for rid, exp in zip(ids, expected):
        assert out[rid] == exp


def test_slot_reuse_more_requests_than_slots(model, rng):
    cfg, params = model
    eng = BatchingEngine(cfg, params, slots=2, max_seq=64,
                         prompt_buckets=(8,))
    ids = [eng.submit(rng.integers(1, 128, size=(8,)).astype(np.int32),
                      max_new_tokens=3) for _ in range(5)]
    out = eng.run_all()
    assert len(out) == 5
    assert all(len(toks) == 3 for toks in out.values())


def test_eos_retires_slot(model, rng):
    cfg, params = model
    p = rng.integers(1, 128, size=(8,)).astype(np.int32)
    probe = BatchingEngine(cfg, params, slots=1, max_seq=64, prompt_buckets=(8,))
    probe.submit(p, max_new_tokens=5)
    toks = list(probe.run_all().values())[0]
    eos = toks[1]
    eng = BatchingEngine(cfg, params, slots=1, max_seq=64, eos_id=eos,
                         prompt_buckets=(8,))
    rid = eng.submit(p, max_new_tokens=5)
    out = eng.run_all()[rid]
    assert out[-1] == eos and len(out) <= 2


def test_threaded_batcher_concurrent(model, rng):
    import threading
    from ganq_tpu.serve.batching import ThreadedBatcher
    from ganq_tpu.serve.engine import Engine

    cfg, params = model
    tb = ThreadedBatcher(cfg, params, slots=2, max_seq=64)
    single = Engine(cfg, params, max_seq=64)
    prompts = [rng.integers(1, 128, size=(8,)).astype(np.int32)
               for _ in range(4)]
    expected = [single.generate(p, max_new_tokens=4)[0].tolist()
                for p in prompts]

    results = [None] * 4

    def worker(i):
        results[i] = tb.generate_ids(prompts[i], max_new_tokens=4)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    tb.shutdown()
    assert results == expected


def test_openai_server_with_batching(model, rng):
    import json
    import urllib.request
    from tests.test_api import CharTokenizer, tiny_model
    from ganq_tpu import GanqModel

    m = GanqModel.from_torch_model(tiny_model(4), tokenizer=CharTokenizer())
    from ganq_tpu.serve.openai_server import OpenAIServer
    srv = OpenAIServer(m, port=0, use_batching=True, slots=2, max_seq=64).start()
    try:
        srv.wait_until_ready()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": "hello", "max_tokens": 4}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["text"]
    finally:
        srv.shutdown()


# --------------------------------------------------------------------------
# Full-arch continuous batching: the slot decode runs the real layer_forward
# with vector cache positions, so MoE routing, MLA absorbed decode, ALiBi and
# sliding windows must all match the single-request engine bit-for-bit.
def _parity_vs_engine(cfg, params, rng, vocab, lens=(6, 9, 12), new=5,
                      engine_kwargs=None, batching_kwargs=None):
    import jax.numpy as jnp
    prompts = [rng.integers(1, vocab, size=(n,)).astype(np.int32)
               for n in lens]
    single = Engine(cfg, params, max_seq=64, **(engine_kwargs or {}))
    expected = [single.generate(p, max_new_tokens=new)[0].tolist()
                for p in prompts]
    eng = BatchingEngine(cfg, params, slots=2, max_seq=64,
                         prompt_buckets=(8, 16), **(batching_kwargs or {}))
    ids = [eng.submit(p, max_new_tokens=new) for p in prompts]
    out = eng.run_all()
    for rid, exp in zip(ids, expected):
        assert out[rid] == exp, (out[rid], exp)


def test_batching_moe_mixtral(rng):
    import torch
    import transformers
    from ganq_tpu.models import hf_import

    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128)
    torch.manual_seed(21)
    cfg, params = hf_import.params_from_torch_model(
        transformers.MixtralForCausalLM(hf_cfg))
    _parity_vs_engine(cfg, params, rng, 128)


def test_batching_mla_deepseek_absorbed(rng):
    """MLA continuous batching on the compressed (absorbed-matmul) KV cache:
    per-slot c/kpe scatter writes + absorbed decode attention."""
    import torch
    import transformers
    from ganq_tpu.models import hf_import

    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=12, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="greedy", first_k_dense_replace=0,
        max_position_embeddings=64)
    torch.manual_seed(22)
    cfg, params = hf_import.params_from_torch_model(
        transformers.DeepseekV2ForCausalLM(hf_cfg))
    assert cfg.mla
    _parity_vs_engine(cfg, params, rng, 128,
                      engine_kwargs={"mla_absorb": True},
                      batching_kwargs={"mla_absorb": True})
    _parity_vs_engine(cfg, params, rng, 128,
                      engine_kwargs={"mla_absorb": False},
                      batching_kwargs={"mla_absorb": False})


def test_batching_sliding_window_gemma2(rng):
    import torch
    import transformers
    from ganq_tpu.models import hf_import

    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64, query_pre_attn_scalar=16,
        sliding_window=8)
    torch.manual_seed(23)
    cfg, params = hf_import.params_from_torch_model(
        transformers.Gemma2ForCausalLM(hf_cfg))
    # prompts longer than the window so the per-slot window overlay matters
    _parity_vs_engine(cfg, params, rng, 128, lens=(10, 13, 16), new=6)


def test_batching_alibi_bloom(rng):
    import torch
    import transformers
    from ganq_tpu.models import hf_import

    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=32, n_layer=2, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(24)
    cfg, params = hf_import.params_from_torch_model(
        transformers.BloomForCausalLM(hf_cfg))
    assert cfg.pos == "alibi"
    _parity_vs_engine(cfg, params, rng, 128)


def test_batching_fuzz_random_schedules(model, rng):
    """Property fuzz: under randomized request lengths, generation budgets,
    slot pressure and STAGGERED arrivals (new submissions interleaved with
    decode steps), every request's greedy tokens must equal the
    single-sequence engine's output."""
    cfg, params = model
    single = Engine(cfg, params, max_seq=96)

    for trial in range(4):
        trng = np.random.default_rng(1000 + trial)
        n_req = int(trng.integers(3, 9))
        prompts = [trng.integers(1, 128, size=(int(trng.integers(3, 30)),)
                                 ).astype(np.int32) for _ in range(n_req)]
        budgets = [int(trng.integers(1, 9)) for _ in range(n_req)]
        expected = [single.generate(p, max_new_tokens=b)[0].tolist()
                    for p, b in zip(prompts, budgets)]

        eng = BatchingEngine(cfg, params, slots=int(trng.integers(1, 4)),
                             max_seq=96, prompt_buckets=(8, 16, 32, 64))
        rid_to_idx = {}
        got = {}
        pending = list(range(n_req))
        trng.shuffle(pending)
        for _ in range(10_000):
            # staggered arrivals: a random number of submissions per tick
            while pending and trng.random() < 0.6:
                i = pending.pop()
                rid = eng.submit(prompts[i], max_new_tokens=budgets[i])
                rid_to_idx[rid] = i
                got[rid] = []
            for rid, toks in eng.step().items():
                got[rid].extend(toks)
            if (not pending and not eng.queue
                    and all(s is None for s in eng.slot_req)):
                break
        assert len(got) == n_req
        for rid, idx in rid_to_idx.items():
            assert got[rid] == expected[idx], (trial, idx, got[rid],
                                               expected[idx])


def test_submit_validation_and_sampled_admission(model, rng):
    cfg, params = model
    eng = BatchingEngine(cfg, params, slots=1, max_seq=64,
                         prompt_buckets=(8, 16))
    with pytest.raises(ValueError):
        eng.submit(rng.integers(1, 128, size=(4,)).astype(np.int32),
                   max_new_tokens=0)
    # exact-bucket admission with temperature: first token is SAMPLED via
    # the same PRNG chain as decode (was always argmax before)
    p = rng.integers(1, 128, size=(8,)).astype(np.int32)
    rid = eng.submit(p, max_new_tokens=3, temperature=1.5)
    got = []
    for _ in range(20):
        for r, toks in eng.step().items():
            if r == rid:
                got.extend(toks)
        if all(s is None for s in eng.slot_req) and not eng.queue:
            break
    assert len(got) == 3


def test_batching_w4_megastep_fast_path(rng, monkeypatch):
    """Continuous batching through the W4 megastep (per-slot positions in
    ONE whole-stack kernel): emitted tokens match the per-layer path for
    mixed-length concurrent requests."""
    from ganq_tpu.models import synthetic

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=2,
                                 kv_heads=1, vocab=512, max_pos=128)
    params = synthetic.make_model(cfg, kind="uniform", seed=6)
    prompts = [rng.integers(1, 512, size=(n,)) for n in (5, 9, 17)]

    eng = BatchingEngine(cfg, params, backend="reference", slots=4,
                         max_seq=64, prompt_buckets=(8, 16, 32))
    assert eng._mega_kv is not None, "mega fast path did not engage"
    for p in prompts:
        eng.submit(p, max_new_tokens=6)
    got = eng.run_all()

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    eng2 = BatchingEngine(cfg, params, backend="reference", slots=4,
                          max_seq=64, prompt_buckets=(8, 16, 32))
    assert eng2._mega_kv is None
    for p in prompts:
        eng2.submit(p, max_new_tokens=6)
    ref = eng2.run_all()

    assert set(got) == set(ref)
    n_tok = sum(len(v) for v in ref.values())
    n_agree = sum((np.asarray(got[k]) == np.asarray(ref[k])).sum()
                  for k in ref)
    assert n_agree >= 0.9 * n_tok, (got, ref)
