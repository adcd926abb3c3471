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
