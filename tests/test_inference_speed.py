"""Decode-throughput regression guard against recorded best-known numbers
(tests/perf_baseline.json), mirroring the reference's absolute per-backend
tok/s pins (reference tests/test_inference_speed.py:43-53).

This environment's tunneled chip varies up to +-70% run-to-run (PERF.md),
so the primary guard is *same-process ratios* vs the recorded ratios
(min-of-N, identical program structure, shared warm runtime), with loose
absolute floors that only catch total collapses. Runs only on the real
chip (GANQ_TPU_TEST_TPU=1); skipped on CPU.
"""

import json
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("GANQ_TPU_TEST_TPU"),
    reason="throughput regression guard needs the real chip")

BASELINE = json.load(open(os.path.join(os.path.dirname(__file__),
                                       "perf_baseline.json")))
RATIO_FLOOR = 0.5      # measured ratio must stay >= 50% of recorded ratio
ABS_FLOOR = 0.25       # absolute tok/s must stay >= 25% of recorded


def _cfg():
    from ganq_tpu.models import synthetic
    return synthetic.llama_config(hidden=1024, inter=2816, layers=4,
                                  heads=8, kv_heads=8, vocab=8192,
                                  max_pos=256)


def measure(cfg, kind, backend, steps=32, batch=8, reps=3):
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    sp = synthetic.make_stacked_model(
        cfg, kind=kind, seed=0,
        lm_head_kind=None if kind == "dense" else "w8")
    sp = stacked.prepack(cfg, sp, backend, batch)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, 32)),
                      jnp.int32)

    def run():
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, batch, 128)
        return stacked.greedy_decode(cfg, sp, ck, cv, ids, steps, backend)

    np.asarray(run())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def test_decode_throughput_not_regressed():
    cfg = _cfg()
    tps = {
        "bf16": measure(cfg, "dense", "reference"),
        "w4a8": measure(cfg, "uniform", "pallas_a8"),
        "w8a8": measure(cfg, "w8", "pallas_a8"),
        "lut": measure(cfg, "lut", "pallas"),
    }
    rec_abs = BASELINE["tokens_per_s"]
    rec_ratio = BASELINE["ratios_vs_bf16"]

    # absolute collapse floors (very loose: tunneled-runtime variance)
    for path, v in tps.items():
        assert v > ABS_FLOOR * rec_abs[path], (
            f"{path} collapsed: {v:.1f} vs recorded {rec_abs[path]}")

    # same-process ratios vs recorded ratios (the real guard)
    for path in ("w4a8", "w8a8", "lut"):
        ratio = tps[path] / tps["bf16"]
        floor = RATIO_FLOOR * rec_ratio[path]
        assert ratio > floor, (
            f"{path}/bf16 ratio regressed: {ratio:.3f} < {floor:.3f} "
            f"(recorded {rec_ratio[path]:.3f}; tps={tps})")

    # the quantized fast paths must not lose to bf16 at this shape
    assert tps["w4a8"] > tps["bf16"] * 0.55, tps
    assert tps["w8a8"] > tps["bf16"] * 0.55, tps
