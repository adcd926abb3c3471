"""int8-recode fast path: accuracy bound and kernel parity."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ganq_tpu.ops import qlinear
from ganq_tpu.ops.w8_matmul import w8_matmul


def make_lut_linear(rng, M=64, K=128):
    lut = np.sort(rng.normal(size=(M, 16)).astype(np.float32) * 0.02, axis=1)
    idx = rng.integers(0, 16, size=(M, K)).astype(np.int32)
    return qlinear.lut_linear(jnp.asarray(lut), jnp.asarray(idx), 4)


def test_recode_error_bound(rng):
    ql = make_lut_linear(rng)
    w_exact = np.asarray(qlinear.dequantize_weight(ql))
    w8l = qlinear.recode_w8(ql)
    assert w8l.kind == "w8"
    w_rec = np.asarray(qlinear.dequantize_weight(w8l))
    # error bounded by scale/2 per element
    bound = np.asarray(w8l["scale"])[:, 0] / 2 + 1e-7
    assert np.all(np.abs(w_rec - w_exact) <= bound[:, None] * 1.01)
    # relative error tiny vs weight magnitude
    rel = np.abs(w_rec - w_exact).max() / (np.abs(w_exact).max() + 1e-12)
    assert rel < 0.01


def test_w8_matmul_parity(rng):
    ql = qlinear.recode_w8(make_lut_linear(rng, M=128, K=256))
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    ref = np.asarray(jnp.dot(x, qlinear.dequantize_weight(ql).T))
    import os
    ctx = pltpu.force_tpu_interpret_mode() if not os.environ.get("GANQ_TPU_TEST_TPU") else _null()
    with ctx:
        out = np.asarray(w8_matmul(x, ql["w8"], ql["scale"]))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-3)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_recode_passthrough_non_lut(rng):
    w = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    d = qlinear.dense_linear(w)
    assert qlinear.recode_w8(d) is d


def test_w8a8_matmul_parity(rng):
    from ganq_tpu.ops.w8_matmul import w8a8_matmul
    ql = qlinear.recode_w8(make_lut_linear(rng, M=128, K=256))
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    ref = np.asarray(jnp.dot(x, qlinear.dequantize_weight(ql).T))
    import os
    ctx = pltpu.force_tpu_interpret_mode() if not os.environ.get("GANQ_TPU_TEST_TPU") else _null()
    with ctx:
        out = np.asarray(w8a8_matmul(x, ql["w8"], ql["scale"]))
    # activation int8 adds ~0.4% relative error per row
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 0.02


def test_recode_uniform_to_w8(rng):
    """optimize()-path recode for GPTQ-format checkpoints: uniform -> per-row
    int8, error bounded by rowrange/254 per element."""
    from ganq_tpu.ops import qlinear
    from ganq_tpu.ops.packing import pack_int_rows

    M, K, gs = 64, 256, 32
    qidx = jnp.asarray(rng.integers(0, 16, size=(M, K)), jnp.int32)
    scales = jnp.asarray(rng.uniform(0.01, 0.1, size=(M, K // gs)).astype(np.float32))
    zeros = jnp.asarray(rng.integers(0, 16, size=(M, K // gs)).astype(np.float32))
    g_idx = jnp.arange(K, dtype=jnp.int32) // gs
    p = qlinear.uniform_linear(qidx, scales, zeros, g_idx, 4)
    w_exact = np.asarray(qlinear.dequantize_weight(p))

    p8 = qlinear.recode_w8(p)
    assert p8.kind == "w8" and p8["w8"].dtype == jnp.int8
    w_rec = np.asarray(p8["w8"], np.float32) * np.asarray(p8["scale"])
    bound = (np.abs(w_exact).max(axis=1) / 127.0) * 0.51
    assert np.all(np.abs(w_rec - w_exact).max(axis=1) <= bound + 1e-7)

    x = jnp.asarray(rng.normal(size=(4, K)).astype(np.float32))
    y_exact = np.asarray(qlinear.apply(p, x))
    y_rec = np.asarray(qlinear.apply(p8, x))
    rms = float(np.sqrt(np.mean(y_exact ** 2)))
    assert np.max(np.abs(y_rec - y_exact)) / rms < 0.02
