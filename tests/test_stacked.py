"""Stacked-layer (lax.scan) serving path must match the unrolled engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from ganq_tpu.models import synthetic, transformer
from ganq_tpu.serve import engine, stacked


def test_stacked_greedy_matches_unrolled(rng):
    cfg = synthetic.llama_config(hidden=64, inter=128, layers=3, heads=4,
                                 kv_heads=2, vocab=256, max_pos=64)
    params = synthetic.make_model(cfg, kind="dense", seed=1)
    prompt = rng.integers(0, 256, size=(2, 8)).astype(np.int32)

    ref = engine.Engine(cfg, params, max_seq=32).generate(prompt, max_new_tokens=6)

    sp = stacked.stack_layers(params)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, 2, 32)
    out = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv,
                                           jnp.asarray(prompt), 6))
    np.testing.assert_array_equal(out, ref)


def test_stacked_lut_runs(rng):
    cfg = synthetic.llama_config(hidden=64, inter=128, layers=2, heads=4,
                                 kv_heads=2, vocab=128, max_pos=64)
    params = synthetic.make_model(cfg, kind="lut", seed=2)
    sp = stacked.stack_layers(params)
    ck, cv = stacked.init_cache(cfg, 2, 1, 32)
    out = stacked.greedy_decode(cfg, sp, ck, cv,
                                jnp.asarray(rng.integers(0, 128, size=(1, 8))), 4)
    assert out.shape == (1, 4)
    assert np.all(np.asarray(out) >= 0)


def test_stacked_sliding_window_matches_unrolled(rng):
    """Per-layer windows ride the layer scan as data; the stacked program
    must match the unrolled engine exactly (window < seq so it bites)."""
    import dataclasses

    cfg = synthetic.llama_config(hidden=64, inter=128, layers=3, heads=4,
                                 kv_heads=2, vocab=256, max_pos=64)
    cfg = dataclasses.replace(
        cfg, sliding_window=6,
        layer_types=("sliding_attention", "full_attention",
                     "sliding_attention"))
    params = synthetic.make_model(cfg, kind="dense", seed=3)
    prompt = rng.integers(0, 256, size=(2, 10)).astype(np.int32)

    ref = engine.Engine(cfg, params, max_seq=32).generate(prompt,
                                                          max_new_tokens=8)
    sp = stacked.stack_layers(params)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, 2, 32)
    out = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv,
                                           jnp.asarray(prompt), 8))
    np.testing.assert_array_equal(out, ref)

    # and the window must actually matter: a full-attention twin differs
    full = dataclasses.replace(cfg, sliding_window=None, layer_types=None)
    ref_full = engine.Engine(full, params, max_seq=32).generate(
        prompt, max_new_tokens=8)
    assert not np.array_equal(ref, ref_full)
