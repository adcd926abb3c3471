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


def test_stacked_lut_affine_certifies_to_uniform(rng):
    """An affine-grid LUT stacked model (what a ganq_codebook="affine"
    solve emits) certifies onto the packed uniform path with the code
    planes passing through zero-copy, and the recode is lossless up to
    the bf16 codebook storage rounding (<= 2^-7 relative)."""
    from ganq_tpu.ops.qlinear import dequantize_weight

    cfg = synthetic.llama_config(hidden=128, inter=256, layers=2, heads=1,
                                 kv_heads=1, vocab=256, max_pos=64)
    sp = synthetic.make_stacked_model(cfg, kind="lut_affine", seed=4)
    cert = stacked.certify_stacked(sp)
    for path in (("attn", "qkv"), ("attn", "o"), ("mlp", "gateup"),
                 ("mlp", "down")):
        lut_m = sp["layers_stacked"][path[0]][path[1]]
        uni_m = cert["layers_stacked"][path[0]][path[1]]
        assert lut_m.kind == "lut" and uni_m.kind == "uniform"
        # zero-copy: the packed code plane is the SAME buffer
        assert uni_m["qweight"] is lut_m["idx_packed"]
        for i in range(cfg.num_hidden_layers):
            wl = np.asarray(dequantize_weight(
                type(lut_m)(lut_m.kind,
                            {k: v[i] for k, v in lut_m.arrays.items()},
                            lut_m.bits, lut_m.in_features)), np.float32)
            wu = np.asarray(dequantize_weight(
                type(uni_m)(uni_m.kind,
                            {k: v[i] for k, v in uni_m.arrays.items()},
                            uni_m.bits, uni_m.in_features)), np.float32)
            scale = np.abs(wl).max() + 1e-30
            assert np.abs(wl - wu).max() / scale < 2.0 ** -7


def test_stacked_lut_affine_decode_rides_megastep(rng, monkeypatch):
    """prepack on a lut_affine_sym model (a ganq_codebook="affine_sym"
    artifact) certifies in place and the decode routes through a W4
    megastep variant; tokens agree with the exact-LUT reference decode
    (GANQ_LUT_AFFINE=0). Asymmetric affine grids certify too (see above)
    but carry zeros, which the sym-only megastep gate rejects."""
    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=2,
                                 kv_heads=1, vocab=512, max_pos=128)
    B, prompt_len, steps, T = 2, 8, 4, 64
    sp = synthetic.make_stacked_model(cfg, kind="lut_affine_sym", seed=5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt_len)),
                      jnp.int32)

    spp = stacked.prepack(cfg, sp, "reference", B)
    assert stacked.mega_enabled(cfg, spp, "reference", B) in ("w4", "w4p")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, spp, ck, cv, ids, steps,
                                            "reference"))

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    monkeypatch.setenv("GANQ_LUT_AFFINE", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"


def test_stacked_gemma3_shape_decode_rides_megastep(rng, monkeypatch):
    """A gemma3-shaped model (sandwich norms, sliding/full alternation,
    dual local/global rope, qk-norm, rms_offset=1) greedy-decodes through
    the plane megastep (VERDICT r3 #6): _decode_one_mega threads windows /
    rope_sel / sandwich operands; tokens match the per-layer path."""
    import dataclasses

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = dataclasses.replace(
        synthetic.llama_config(hidden=256, inter=512, layers=2, heads=2,
                               kv_heads=1, vocab=512, max_pos=128),
        sandwich_norm=True, sliding_window=24, qk_norm=True,
        layer_types=("sliding_attention", "full_attention"),
        act="gelu_tanh", rms_offset=1.0, rope_local_theta=10000.0)
    B, prompt_len, steps, T = 2, 8, 4, 64
    sp = synthetic.make_stacked_model(cfg, kind="uniform", seed=9)
    L, H, d = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    ls = sp["layers_stacked"]
    ls["post_attn_norm"] = {"weight": jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(L, H)).astype(np.float32))}
    ls["post_mlp_norm"] = {"weight": jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(L, H)).astype(np.float32))}
    ls["attn"]["q_norm"] = {"weight": jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(L, d)).astype(np.float32))}
    ls["attn"]["k_norm"] = {"weight": jnp.asarray(
        rng.uniform(-0.2, 0.2, size=(L, d)).astype(np.float32))}
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt_len)),
                      jnp.int32)

    spp = stacked.prepack(cfg, sp, "reference", B)
    assert stacked.mega_enabled(cfg, spp, "reference", B) == "w4p"
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, spp, ck, cv, ids, steps,
                                            "reference"))

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"


def test_stacked_w8_decode_rides_w8p_megastep(rng, monkeypatch):
    """A per-row-scale int8 ("w8") model — the free-codebook GANQ recode —
    prepacks onto the plane megastep via the LOSSLESS uniform8 conversion
    (serve.stacked.w8p_stacked / ops/qlinear.w8_to_uniform8), at a batch
    the old per-row w8 kernel refuses (> 8). Greedy tokens match the
    per-layer w8 reference decode (VERDICT r3 #2a)."""
    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=2,
                                 kv_heads=1, vocab=512, max_pos=128)
    B, prompt_len, steps, T = 12, 8, 4, 64
    sp = synthetic.make_stacked_model(cfg, kind="w8", seed=7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, prompt_len)),
                      jnp.int32)

    spp = stacked.prepack(cfg, sp, "reference", B)
    assert stacked.mega_enabled(cfg, spp, "reference", B) == "w8p"
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    toks = np.asarray(stacked.greedy_decode(cfg, spp, ck, cv, ids, steps,
                                            "reference"))

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, B, T)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, steps,
                                           "reference"))
    agree = (toks == ref).mean()
    assert agree >= 0.9, f"token agreement {agree:.2f}\n{toks}\n{ref}"
