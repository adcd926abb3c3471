"""Attention kernel parity: flash path (when eligible) vs masked reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganq_tpu.ops.attention import flash_attention, reference_attention


def make_qkv(rng, b, s, hq, hkv, d, dtype=np.float32):
    q = rng.normal(size=(b, s, hq, d)).astype(dtype)
    k = rng.normal(size=(b, s, hkv, d)).astype(dtype)
    v = rng.normal(size=(b, s, hkv, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_flash_wrapper_matches_reference(rng, hq, hkv):
    q, k, v = make_qkv(rng, 2, 256, hq, hkv, 64)
    scale = 0.125
    qi = jnp.arange(256)[:, None]
    ki = jnp.arange(256)[None, :]
    mask = (ki <= qi)[None, None]
    ref = reference_attention(q, k, v, mask, scale)
    out = flash_attention(q, k, v, scale, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_decode_shapes_use_reference(rng):
    # s=1 decode against t=64 keys: not flash-eligible, must still be exact
    q = jnp.asarray(rng.normal(size=(2, 1, 4, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 64, 4, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 64, 4, 32)).astype(np.float32))
    pos = 10
    mask = (jnp.arange(64) <= pos)[None, None, None, :]
    ref = reference_attention(q, k, v, mask, 0.2)
    assert ref.shape == (2, 1, 4, 32)
    # softmax over masked positions only
    probs_implied = np.asarray(ref)
    assert np.all(np.isfinite(probs_implied))
