"""Fused attention-half decode kernels vs pure-jnp oracles (the reference's
kernel-testing pattern: slow-but-obvious impl vs fused kernel,
tests/test_ganq_solve_s_kernel.py style)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.ops.fused_attention import (
    fused_qkv_rope_reference, fused_qkv_rope_w8a8,
    flash_decode_attention, flash_decode_reference)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _ctx():
    return (pltpu.force_tpu_interpret_mode()
            if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())


def _mk_qkv(rng, B, H, q_dim, kv_dim):
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    D = q_dim + 2 * kv_dim
    w8 = jnp.asarray(rng.integers(-127, 128, size=(D, H)), jnp.int8)
    ws = jnp.asarray(rng.uniform(1e-4, 4e-4, size=(D, 1)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(H,)).astype(np.float32))
    return x, w8, ws, nw


@pytest.mark.parametrize("interleaved", [False, True])
def test_fused_qkv_rope_matches_reference(rng, interleaved):
    B, H, hd = 8, 256, 64
    q_dim, kv_dim = 256, 128
    x, w8, ws, nw = _mk_qkv(rng, B, H, q_dim, kv_dim)
    half = hd // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    ref = fused_qkv_rope_reference(x, nw, w8, ws, None, cos, sin,
                                   q_dim, kv_dim, hd, rotary_dim=hd,
                                   interleaved=interleaved)
    with _ctx():
        out = fused_qkv_rope_w8a8(x, nw, w8, ws, None, cos, sin,
                                  q_dim, kv_dim, hd, rotary_dim=hd,
                                  interleaved=interleaved)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_qkv_partial_rotary_and_bias(rng):
    """Partial rotary (gpt-neox style rotary_dim < head_dim) rides the same
    kernel: identity lanes have cos=1/sin=0 and zero R rows. Bias adds."""
    B, H, hd, rd = 4, 128, 64, 32
    q_dim, kv_dim = 256, 128
    x, w8, ws, nw = _mk_qkv(rng, B, H, q_dim, kv_dim)
    D = q_dim + 2 * kv_dim
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01)
    half = rd // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    ref = fused_qkv_rope_reference(x, nw, w8, ws, bias, cos, sin,
                                   q_dim, kv_dim, hd, rotary_dim=rd)
    with _ctx():
        out = fused_qkv_rope_w8a8(x, nw, w8, ws, bias, cos, sin,
                                  q_dim, kv_dim, hd, rotary_dim=rd)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_qkv_no_rope(rng):
    B, H, hd = 4, 128, 64
    q_dim, kv_dim = 256, 128
    x, w8, ws, nw = _mk_qkv(rng, B, H, q_dim, kv_dim)
    z = jnp.zeros((0,), jnp.float32)
    ref = fused_qkv_rope_reference(x, nw, w8, ws, None, z, z,
                                   q_dim, kv_dim, hd, rotary_dim=0)
    with _ctx():
        out = fused_qkv_rope_w8a8(x, nw, w8, ws, None, z, z,
                                  q_dim, kv_dim, hd, rotary_dim=0)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("pos,T", [(0, 256), (17, 256), (255, 256),
                                   (100, 512)])
def test_flash_decode_matches_masked_softmax(rng, pos, T):
    B, Hq, Hkv, d = 4, 8, 4, 64
    q = jnp.asarray(rng.normal(size=(B, Hq, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, Hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, Hkv, d)).astype(np.float32),
                    jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    ref = flash_decode_reference(q, k, v, pos, scale)
    with _ctx():
        out = flash_decode_attention(q, k, v, jnp.int32(pos), scale,
                                     block_t=128)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_flash_decode_mqa_and_big_heads(rng):
    """MQA (Hkv=1) and a 24-head llama-3B-like shape."""
    for (Hq, Hkv, d) in ((8, 1, 64), (24, 8, 128)):
        B, T = 2, 256
        q = jnp.asarray(rng.normal(size=(B, Hq, d)).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, T, Hkv, d)).astype(np.float32),
                        jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, T, Hkv, d)).astype(np.float32),
                        jnp.bfloat16)
        ref = flash_decode_reference(q, k, v, 77, 0.1)
        with _ctx():
            out = flash_decode_attention(q, k, v, jnp.int32(77), 0.1,
                                         block_t=128)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_engine_decode_with_fused_attention_path(rng, monkeypatch):
    """layer_forward's fused attention-half fast path (pallas_a8 + w8 fused
    qkv + scalar-pos decode) must reproduce the reference decode logits.
    The fused qkv kernel is opt-in (perf-neutral on the tunneled chip);
    flash decode must be forced on CPU (off by default off-TPU)."""
    monkeypatch.setenv("GANQ_FUSED_QKV", "1")
    monkeypatch.setenv("GANQ_FLASH_DECODE", "1")
    import functools
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import engine
    from ganq_tpu.serve.stacked import fuse_layer

    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=4,
                                 kv_heads=2, vocab=512, max_pos=64)
    params = synthetic.make_model(cfg, kind="w8", seed=11)
    params = {**params, "layers": [fuse_layer(lp) for lp in params["layers"]]}
    assert params["layers"][0]["attn"]["qkv"].kind == "w8"

    prompt = jnp.asarray(rng.integers(1, 512, size=(2, 9)), jnp.int32)
    cache_r = engine.init_cache(cfg, 2, 32)
    logits_r, cache_r = engine.prefill(cfg, params, cache_r, prompt,
                                       "reference")
    tok = jnp.argmax(logits_r, axis=-1).astype(jnp.int32)
    ref_logits, _ = engine.decode_step(cfg, params, cache_r, tok,
                                       jnp.int32(9), "reference")

    with _ctx():
        cache_f = engine.init_cache(cfg, 2, 32)
        logits_f, cache_f = engine.prefill(cfg, params, cache_f, prompt,
                                           "pallas_a8")
        fused_logits, _ = engine.decode_step(cfg, params, cache_f, tok,
                                             jnp.int32(9), "pallas_a8")
    np.testing.assert_allclose(np.asarray(fused_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               atol=0.15, rtol=0.1)
    agree = (np.argmax(np.asarray(fused_logits), -1)
             == np.argmax(np.asarray(ref_logits), -1)).mean()
    assert agree == 1.0


def test_stacked_greedy_decode_fused_path(rng, monkeypatch):
    """The stacked-scan serving path (what bench.py runs) activates the
    flash-decode kernel (and, opt-in, the fused qkv kernel) inside the
    layer scan and stays greedy-consistent."""
    monkeypatch.setenv("GANQ_FUSED_QKV", "1")
    monkeypatch.setenv("GANQ_FLASH_DECODE", "1")
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=4,
                                 kv_heads=2, vocab=512, max_pos=64)
    sp = synthetic.make_stacked_model(cfg, kind="w8", seed=12)
    ids = jnp.asarray(rng.integers(1, 512, size=(2, 8)), jnp.int32)

    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, 2, 32)
    ref = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, 6,
                                           "reference"))
    with _ctx():
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, 2, 32)
        out = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, 6,
                                               "pallas_a8"))
    # near-flat random logits can flip ties between compute orders; demand
    # strong agreement, not bitwise equality (memory: compare argmax)
    assert (out == ref).mean() >= 0.8, (out, ref)
