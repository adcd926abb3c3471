"""Fused MLP megakernel parity vs the unfused w8a8 path."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.ops.fused_mlp import fused_mlp_w8a8


def make_weights(rng, H=256, I=512):
    gu8 = rng.integers(-127, 128, size=(2 * I, H)).astype(np.int8)
    gus = (rng.random(size=(2 * I, 1)).astype(np.float32) + 0.5) * 1e-3
    dw8 = rng.integers(-127, 128, size=(H, I)).astype(np.int8)
    dws = (rng.random(size=(H, 1)).astype(np.float32) + 0.5) * 1e-3
    return jnp.asarray(gu8), jnp.asarray(gus), jnp.asarray(dw8), jnp.asarray(dws)


def unfused_ref(x, gu8, gus, dw8, dws, I):
    import jax
    gw = gu8.astype(jnp.float32) * gus
    g = jnp.dot(x, gw[:I].T)
    u = jnp.dot(x, gw[I:].T)
    a = jax.nn.silu(g) * u
    return jnp.dot(a, (dw8.astype(jnp.float32) * dws).T)


@pytest.mark.parametrize("B", [8, 3])
def test_fused_mlp_matches_unfused(rng, B):
    import os
    H, I = 256, 512
    gu8, gus, dw8, dws = make_weights(rng, H, I)
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    ref = np.asarray(unfused_ref(x, gu8, gus, dw8, dws, I))
    ctx = (pltpu.force_tpu_interpret_mode()
           if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())
    with ctx:
        out = np.asarray(fused_mlp_w8a8(x, gu8, gus, dw8, dws))
    # two dynamic int8 quantizations (x and the intermediate) add noise;
    # synthetic full-range int8 weights are the worst case
    denom = np.abs(ref).max() + 1e-9
    assert np.abs(out - ref).max() / denom < 0.06
    assert np.abs(out - ref).mean() / denom < 0.01


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_fused_mlp_in_layer_forward(rng):
    """pallas_a8 decode through a w8-recoded stacked layer uses the megakernel
    and stays close to the reference backend."""
    from ganq_tpu.models import synthetic, transformer
    from ganq_tpu.serve import stacked
    import jax

    cfg = synthetic.llama_config(hidden=128, inter=512, layers=2, heads=4,
                                 kv_heads=2, vocab=128, max_pos=64)
    params = synthetic.make_model(cfg, kind="lut", seed=5)
    sp = stacked.stack_layers(params, recode="w8")
    ck, cv = stacked.init_cache(cfg, 2, 2, 32)
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 8)))
    with pltpu.force_tpu_interpret_mode():
        out_a8 = np.asarray(stacked.greedy_decode(
            cfg, sp, ck, cv, ids, 4, "pallas_a8"))
    ck, cv = stacked.init_cache(cfg, 2, 2, 32)
    out_ref = np.asarray(stacked.greedy_decode(
        cfg, sp, ck, cv, ids, 4, "reference"))
    assert np.mean(out_a8 == out_ref) >= 0.75


def test_fused_mlp_norm_residual_folding(rng):
    """norm_w path: output must equal residual + mlp(rmsnorm(x)*w)."""
    import jax
    import os
    H, I = 256, 512
    gu8, gus, dw8, dws = make_weights(rng, H, I)
    x = jnp.asarray(rng.normal(size=(8, H)).astype(np.float32))
    nw = jnp.asarray(rng.random(size=(H,)).astype(np.float32) + 0.5)

    var = jnp.mean(x * x, axis=1, keepdims=True)
    h = x * jax.lax.rsqrt(var + 1e-5) * nw
    ctx = (pltpu.force_tpu_interpret_mode()
           if not os.environ.get("GANQ_TPU_TEST_TPU") else _null())
    with ctx:
        ref = x + fused_mlp_w8a8(h, gu8, gus, dw8, dws)
        out = fused_mlp_w8a8(x, gu8, gus, dw8, dws, norm_w=nw, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
