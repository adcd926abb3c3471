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


def test_w8_to_uniform8_lossless(rng):
    """w8 -> uniform bits=8 is an exact re-encoding: code + 128, per-row
    scale broadcast over 128-column groups (the w8p megastep feed)."""
    ql = qlinear.recode_w8(make_lut_linear(rng, M=64, K=256))
    u8 = qlinear.w8_to_uniform8(ql)
    assert u8.kind == "uniform" and u8.bits == 8
    assert "zeros" not in u8.arrays          # sym stays structural
    np.testing.assert_array_equal(
        np.asarray(qlinear.dequantize_weight(u8)),
        np.asarray(qlinear.dequantize_weight(ql)))
    # odd width: conversion declines, artifact unchanged
    ql2 = qlinear.recode_w8(make_lut_linear(rng, M=8, K=64))
    assert qlinear.w8_to_uniform8(ql2) is ql2


def make_lut3_linear(rng, M=64, K=256):
    lut = np.sort(rng.normal(size=(M, 8)).astype(np.float32) * 0.02, axis=1)
    idx = rng.integers(0, 8, size=(M, K)).astype(np.int32)
    return qlinear.lut_linear(jnp.asarray(lut), jnp.asarray(idx), 3)


def test_recode_uniform4_snap(rng):
    """bits=3 LUT -> uniform bits=4 snap (round 5): assignments preserved,
    per-weight error bounded by the 16-level grid quantum (rowrange/30),
    and the artifact rides the asym (zeros) megastep layout."""
    ql = make_lut3_linear(rng)
    w_exact = np.asarray(qlinear.dequantize_weight(ql), np.float32)
    u4 = qlinear.recode_uniform4(ql)
    assert u4.kind == "uniform" and u4.bits == 4
    assert u4["zeros"].shape == u4["scales"].shape
    w_u4 = np.asarray(qlinear.dequantize_weight(u4), np.float32)
    lut = np.asarray(ql["lut"], np.float32)
    rowrange = (lut.max(axis=1) - lut.min(axis=1))[:, None]
    assert np.all(np.abs(w_u4 - w_exact) <= rowrange / 30.0 + 1e-6)
    # non-bits-3 kinds pass through unchanged
    ql4 = make_lut_linear(rng)
    assert qlinear.recode_uniform4(ql4) is ql4


def test_recode_uniform8_tighter_than_w8(rng):
    """Per-group int8 recode error <= the per-row recode's (group max-abs
    <= row max-abs), and both reconstruct the LUT weight closely."""
    ql = make_lut_linear(rng, M=64, K=256)
    w_exact = np.asarray(qlinear.dequantize_weight(ql), np.float32)
    u8 = qlinear.recode_uniform8(ql)
    assert u8.kind == "uniform" and u8.bits == 8
    assert u8["scales"].shape == (64, 2)
    w_u8 = np.asarray(qlinear.dequantize_weight(u8), np.float32)
    w_row = np.asarray(qlinear.dequantize_weight(qlinear.recode_w8(ql)),
                       np.float32)
    err_u8 = np.abs(w_u8 - w_exact).max()
    err_row = np.abs(w_row - w_exact).max()
    assert err_u8 <= err_row + 1e-7
    bound = np.asarray(u8["scales"]).max() / 2 + 1e-7
    assert err_u8 <= bound * 1.01


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
