"""Attention-half decode megakernel (ops/fused_layer.py) vs pure-jnp oracle,
plus end-to-end greedy-decode parity of the fully-fused layer path against
the composable path (the reference's kernel-testing pattern, SURVEY.md §4)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.ops.fused_layer import (attn_half_decode_reference,
                                      attn_half_decode_w8a8)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _ctx():
    return (pltpu.force_tpu_interpret_mode()
            if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())


def _mk(rng, B, H, q_dim, kv_dim, d, T, pos):
    Hkv = kv_dim // d
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    D = q_dim + 2 * kv_dim
    qw = jnp.asarray(rng.integers(-127, 128, size=(D, H)), jnp.int8)
    qs = jnp.asarray(rng.uniform(1e-4, 4e-4, size=(D, 1)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(H,)).astype(np.float32))
    owt = jnp.asarray(rng.integers(-127, 128, size=(q_dim, H)), jnp.int8)
    osr = jnp.asarray(rng.uniform(1e-4, 4e-4, size=(1, H)).astype(np.float32))
    kc = jnp.zeros((B, T, Hkv, d), jnp.bfloat16)
    vc = jnp.zeros((B, T, Hkv, d), jnp.bfloat16)
    hist = jnp.asarray(rng.normal(size=(B, pos, Hkv, d)).astype(np.float32),
                       jnp.bfloat16)
    vist = jnp.asarray(rng.normal(size=(B, pos, Hkv, d)).astype(np.float32),
                       jnp.bfloat16)
    kc = kc.at[:, :pos].set(hist)
    vc = vc.at[:, :pos].set(vist)
    # garbage beyond pos must be masked out by the kernel
    kc = kc.at[:, pos:].set(37.0)
    vc = vc.at[:, pos:].set(-11.0)
    half = d // 2
    ang = rng.uniform(0, 2 * np.pi, size=(half,)).astype(np.float32)
    return (x, qw, qs, nw, owt, osr, kc, vc,
            jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang)))


@pytest.mark.parametrize("B,pos", [(8, 200), (8, 3), (1, 77)])
def test_megakernel_matches_reference(rng, B, pos):
    H, d = 512, 128
    q_dim, kv_dim, T = 768, 256, 256
    x, qw, qs, nw, owt, osr, kc, vc, cos, sin = _mk(
        rng, B, H, q_dim, kv_dim, d, T, pos)
    scale = 1.0 / np.sqrt(d)
    kw = dict(q_dim=q_dim, kv_dim=kv_dim, head_dim=d, rotary_dim=d,
              eps=1e-5, scale=float(scale))
    ref_y, ref_k, ref_v = attn_half_decode_reference(
        x, nw, qw, qs, None, owt, osr, cos, sin, kc, vc, pos, **kw)
    with _ctx():
        y, kn, vn = attn_half_decode_w8a8(
            x, nw, qw, qs, None, owt, osr, cos, sin, kc, vc,
            jnp.int32(pos), **kw)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(ref_k, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vn, np.float32),
                               np.asarray(ref_v, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_megakernel_multi_cache_blocks(rng):
    # T spans several 256-blocks; dead blocks hold garbage
    B, H, d = 8, 512, 128
    q_dim, kv_dim, T, pos = 512, 256, 1024, 300
    x, qw, qs, nw, owt, osr, kc, vc, cos, sin = _mk(
        rng, B, H, q_dim, kv_dim, d, T, pos)
    kw = dict(q_dim=q_dim, kv_dim=kv_dim, head_dim=d, rotary_dim=d,
              eps=1e-5, scale=float(1 / np.sqrt(d)))
    ref_y, _, _ = attn_half_decode_reference(
        x, nw, qw, qs, None, owt, osr, cos, sin, kc, vc, pos, **kw)
    with _ctx():
        y, _, _ = attn_half_decode_w8a8(
            x, nw, qw, qs, None, owt, osr, cos, sin, kc, vc,
            jnp.int32(pos), **kw)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref_y, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_reference_matches_composable_ops(rng):
    """The oracle itself must agree with the unfused serving math
    (w8a8 qkv matmul + rope + masked softmax + w8a8 o matmul)."""
    from ganq_tpu.ops import w8_matmul
    from ganq_tpu.ops.fused_attention import flash_decode_reference

    B, H, d = 4, 512, 128
    q_dim, kv_dim, T, pos = 512, 256, 256, 100
    x, qw, qs, nw, owt, osr, kc, vc, cos, sin = _mk(
        rng, B, H, q_dim, kv_dim, d, T, pos)
    scale = float(1 / np.sqrt(d))
    y, kn, vn = attn_half_decode_reference(
        x, nw, qw, qs, None, owt, osr, cos, sin, kc, vc, pos,
        q_dim=q_dim, kv_dim=kv_dim, head_dim=d, rotary_dim=d, eps=1e-5,
        scale=scale)

    # composable: norm -> w8a8 qkv -> rope -> cache write -> masked softmax
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    h = (xf * jax.lax.rsqrt(var + 1e-5) * nw).astype(jnp.bfloat16)
    with _ctx():
        qkv = w8_matmul.w8a8_matmul(h, qw, qs).astype(jnp.float32)
    Hq, Hkv = q_dim // d, kv_dim // d
    q3 = qkv[:, :q_dim].reshape(B, Hq, d)
    k3 = qkv[:, q_dim:q_dim + kv_dim].reshape(B, Hkv, d)
    v3 = qkv[:, q_dim + kv_dim:].reshape(B, Hkv, d)
    half = d // 2
    cc = jnp.concatenate([cos, cos]).astype(jnp.float32)
    ss = jnp.concatenate([sin, sin]).astype(jnp.float32)

    def rope3(a):
        rh = jnp.concatenate([-a[..., half:], a[..., :half]], axis=-1)
        return a * cc + rh * ss

    q3, k3 = rope3(q3), rope3(k3)
    kc2 = kc.at[:, pos].set(k3.astype(kc.dtype))
    vc2 = vc.at[:, pos].set(v3.astype(vc.dtype))
    attn = flash_decode_reference(q3.astype(jnp.bfloat16), kc2, vc2, pos,
                                  scale).astype(jnp.float32)
    a = attn.reshape(B, q_dim)
    sa = jnp.maximum(jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0,
                     1e-12)
    a8 = jnp.clip(jnp.round(a / sa), -127, 127)
    o = (a8 @ owt.astype(jnp.float32)) * sa * osr
    y2 = xf + o

    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y2, np.float32),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(kn, np.float32),
                               np.asarray(k3, np.float32), atol=2e-2,
                               rtol=2e-2)


def test_fully_fused_decode_parity(rng, monkeypatch):
    """Greedy decode through the fully-fused layer path (megakernel +
    fused MLP, GANQ_FUSED_LAYER=1 in interpret mode) matches the
    composable w8a8 path token-for-token."""
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2,
                                 heads=4, kv_heads=2, vocab=512, max_pos=64)
    sp = synthetic.make_stacked_model(cfg, kind="w8", seed=3)
    assert "o_t_w8" in sp["layers_stacked"]["attn"]
    ids = jnp.asarray(rng.integers(0, 512, size=(8, 12)), jnp.int32)

    monkeypatch.setenv("GANQ_FUSED_LAYER", "0")
    with pltpu.force_tpu_interpret_mode():
        ck, cv = stacked.init_cache(cfg, 2, 8, 64)
        base = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, 6,
                                                "pallas_a8"))

    monkeypatch.setenv("GANQ_FUSED_LAYER", "1")
    with pltpu.force_tpu_interpret_mode():
        ck, cv = stacked.init_cache(cfg, 2, 8, 64)
        fused = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids, 6,
                                                 "pallas_a8"))
    # identical quantization points; only flash-vs-softmax and bf16 dot
    # ordering differ -> rare argmax near-ties allowed
    assert np.mean(base == fused) >= 0.9
