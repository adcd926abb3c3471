"""Uniform quantizer parity vs an independent NumPy oracle of the reference
semantics (gptqmodel/quantization/quantizer.py:79-168)."""

import numpy as np

from ganq_tpu.quant.quantizer import find_params, quantize_affine


def numpy_find_params(x, bits, sym, mse=0.0, grid=100, maxshrink=0.8):
    x = np.asarray(x, np.float32)
    maxq = 2**bits - 1
    xmin = np.minimum(x.min(axis=1), 0)
    xmax = np.maximum(x.max(axis=1), 0)
    if sym:
        xmax = np.maximum(np.abs(xmin), xmax)
        xmin = np.where(xmin < 0, -xmax, xmin)
    deg = (xmin == 0) & (xmax == 0)
    xmin[deg], xmax[deg] = -1, 1
    scale = (xmax - xmin) / maxq
    zero = np.full_like(scale, (maxq + 1) / 2) if sym else np.round(-xmin / scale)

    if mse > 0:
        best = np.full(x.shape[0], np.inf)
        bscale, bzero = scale.copy(), zero.copy()
        for i in range(int(maxshrink * grid)):
            p = 1 - i / grid
            xmin1, xmax1 = p * xmin, p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = zero if sym else np.round(-xmin1 / scale1)
            q = scale1[:, None] * (np.clip(np.round(x / scale1[:, None]) + zero1[:, None], 0, maxq) - zero1[:, None])
            err = np.sum(np.abs(q - x) ** mse, axis=1)
            better = err < best
            best[better] = err[better]
            bscale[better] = scale1[better]
            bzero[better] = zero1[better]
        scale, zero = bscale, bzero
    return scale, zero


def test_find_params_asym(rng):
    x = rng.normal(size=(64, 256)).astype(np.float32)
    p = find_params(x, bits=4, sym=False)
    s, z = numpy_find_params(x, 4, False)
    np.testing.assert_allclose(np.asarray(p.scale)[:, 0], s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p.zero)[:, 0], z, rtol=0, atol=0)


def test_find_params_sym(rng):
    x = rng.normal(size=(32, 128)).astype(np.float32)
    p = find_params(x, bits=3, sym=True)
    s, z = numpy_find_params(x, 3, True)
    np.testing.assert_allclose(np.asarray(p.scale)[:, 0], s, rtol=1e-6)
    assert np.all(np.asarray(p.zero)[:, 0] == (2**3) / 2)


def test_find_params_mse(rng):
    x = rng.normal(size=(16, 512)).astype(np.float32)
    p = find_params(x, bits=4, sym=False, mse=2.4)
    s, z = numpy_find_params(x, 4, False, mse=2.4)
    np.testing.assert_allclose(np.asarray(p.scale)[:, 0], s, rtol=1e-5)


def test_degenerate_rows():
    x = np.zeros((4, 32), np.float32)
    p = find_params(x, bits=4, sym=False)
    # all-zero rows get the [-1, 1] guard range
    np.testing.assert_allclose(np.asarray(p.scale)[:, 0], 2.0 / 15, rtol=1e-6)


def test_quantize_roundtrip(rng):
    x = rng.normal(size=(8, 64)).astype(np.float32)
    p = find_params(x, bits=8, sym=False)
    q = quantize_affine(x, p.scale, p.zero, p.maxq)
    assert np.max(np.abs(np.asarray(q) - x)) < np.max(np.asarray(p.scale))
