"""GANQ constrained-codebook modes (VERDICT r2 #1b): the solve-time
certified affine/int8-grid codebooks and their lossless fast-serving
recodes.

- t_step split-bf16 default is loss-identical to the strict f32 path (the
  quantization-speed fix that replaces the demoted single-pass bf16 mode);
- t_step_affine matches a per-row numpy 2x2 weighted-LS oracle;
- codebook="affine"/"affine_sym" artifacts are exactly grid-representable,
  report quad_loss_free, and certify onto the uniform packed-4-bit path
  with dequant parity;
- codebook="lut8" codebooks round-trip the int8 recode losslessly.

Reference semantics being constrained: gptqmodel/quantization/ganq.py:576-616.
"""

import numpy as np
import pytest

from ganq_tpu.core.config import QuantizeConfig
from ganq_tpu.ops.qlinear import (apply, certify_uniform, dequantize_weight,
                                  lut_linear, recode_w8)
from ganq_tpu.quant.ganq import (ganq_quantize, quad_loss, snap_lut8, t_step,
                                 t_step_affine)
from tests.test_ganq import random_chol
from tests.test_gptq import make_problem


def test_t_step_split_matches_strict(rng):
    """Default (split-bf16) contraction is loss-identical to the 6-pass
    HIGHEST f32 oracle: full f32 mantissa rides the 3-term H split."""
    m, n, k = 32, 96, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H, _ = random_chol(rng, n)
    Q = rng.integers(0, k, size=(m, n)).astype(np.int32)
    WH = W @ H
    T_strict = np.asarray(t_step(WH, H, Q, k, fast="strict"))
    T_split = np.asarray(t_step(WH, H, Q, k, fast=False))
    denom = np.abs(T_strict).max() + 1e-9
    # far tighter than the single-pass bf16 mode's 5% envelope
    assert np.abs(T_split - T_strict).max() / denom < 2e-4
    loss_strict = float(quad_loss(W, np.take_along_axis(T_strict, Q, axis=1), H))
    loss_split = float(quad_loss(W, np.take_along_axis(T_split, Q, axis=1), H))
    assert abs(loss_split - loss_strict) < 1e-3 * abs(loss_strict) + 1e-6


@pytest.mark.parametrize("sym", [False, True])
def test_t_step_affine_matches_numpy_oracle(rng, sym):
    m, n, k = 16, 64, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H, _ = random_chol(rng, n)
    Q = rng.integers(0, k, size=(m, n)).astype(np.int32)
    WH = W @ H
    T = np.asarray(t_step_affine(WH, H, Q, k, fast="strict", sym=sym))
    u = np.arange(k, dtype=np.float64) - k // 2
    for i in range(m):
        S = np.zeros((k, n), np.float64)
        S[Q[i], np.arange(n)] = 1
        A = S @ H.astype(np.float64) @ S.T
        y = S @ WH[i].astype(np.float64)
        if sym:
            b = (u @ y) / (u @ A @ u)
            ref = b * u
        else:
            G = np.array([[A.sum(), (A @ u).sum()],
                          [(A @ u).sum(), u @ A @ u]])
            rhs = np.array([y.sum(), u @ y])
            ab = np.linalg.solve(G, rhs)
            ref = ab[0] + ab[1] * u
        np.testing.assert_allclose(T[i], ref, rtol=2e-3, atol=2e-3)


def test_t_step_affine_is_hessian_optimal_affine(rng):
    """The 2x2 solve beats any other affine codebook under tr(E H E^T) for
    the same assignments — in particular the naive LS projection of the
    free codebook."""
    m, n, k = 24, 64, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H, _ = random_chol(rng, n)
    Q = rng.integers(0, k, size=(m, n)).astype(np.int32)
    WH = W @ H
    T_aff = np.asarray(t_step_affine(WH, H, Q, k, fast="strict"))
    T_free = np.asarray(t_step(WH, H, Q, k, fast="strict"))
    # unweighted affine projection of the free codebook
    u = np.arange(k, dtype=np.float32) - k // 2
    a = T_free.mean(axis=1, keepdims=True)
    b = ((T_free - a) @ u / (u @ u))[:, None]
    T_proj = a + b * u[None, :]
    loss_aff = float(quad_loss(W, np.take_along_axis(T_aff, Q, axis=1), H))
    loss_proj = float(quad_loss(W, np.take_along_axis(T_proj, Q, axis=1), H))
    assert loss_aff <= loss_proj * (1 + 1e-5)


@pytest.mark.parametrize("mode", ["affine", "affine_sym"])
def test_ganq_affine_artifact_is_grid_and_reports_free_loss(rng, mode):
    W, H, nsamples = make_problem(rng, m=96, n=128, p=512)
    outliers = (rng.random(size=W.shape) < 0.02) * rng.normal(size=W.shape) * 8.0
    W = (W + outliers).astype(np.float32)
    cfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=5,
                         act_sort="asc", l_damp_style="ganq", dead="mean",
                         ganq_codebook=mode)
    res = ganq_quantize(W, H, cfg, nsamples)
    lut = np.asarray(res.lut, np.float64)
    if mode == "affine":
        uc = np.arange(16, dtype=np.float64) - 7.5     # centered LS basis
        a = lut.mean(axis=1, keepdims=True)
    else:
        uc = np.arange(16, dtype=np.float64) - 8.0     # sym basis, a = 0
        a = 0.0
    b = ((lut - a) @ uc / (uc @ uc))[:, None]
    resid = np.abs(lut - a - b * uc[None, :]).max()
    assert resid <= 1e-5 * (np.abs(lut).max() + 1e-12), resid
    # the constraint's price is reported and is a real constraint
    assert res.quad_loss_free is not None
    assert res.quad_loss_free <= res.quad_loss * (1 + 1e-6)

    # affine GANQ must still beat per-row uniform GPTQ on the Hessian
    # metric (the alternating assignment/backsolve does the work)
    from ganq_tpu.quant.gptq import gptq_quantize
    gq = QuantizeConfig(bits=4, group_size=-1, sym=mode == "affine_sym",
                        act_sort="none", desc_act=False)
    res_g = gptq_quantize(W, H, gq, nsamples)

    def hess_err(Wq):
        E = W - np.asarray(Wq)
        return float(np.sum((E @ H) * E))

    assert hess_err(res.Q) < hess_err(res_g.Q), (
        hess_err(res.Q), hess_err(res_g.Q))


@pytest.mark.parametrize("mode", ["affine", "affine_sym"])
def test_certify_uniform_roundtrip(rng, mode):
    """lut artifact from an affine solve -> certify -> uniform linear with
    matching dequant and matmul; sym mode lands on the structural-sym
    (zeros-free) layout the megastep gate requires."""
    W, H, nsamples = make_problem(rng, m=64, n=128, p=512)
    cfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=3,
                         act_sort="asc", l_damp_style="ganq", dead="mean",
                         ganq_codebook=mode)
    res = ganq_quantize(W, H, cfg, nsamples)
    p = lut_linear(res.lut, res.idx, bits=4)
    q = certify_uniform(p)
    assert q is not None and q.kind == "uniform" and q.bits == 4
    if mode == "affine_sym":
        assert "zeros" not in q.arrays        # structural sym
    w_lut = np.asarray(dequantize_weight(p))
    w_uni = np.asarray(dequantize_weight(q))
    span = np.abs(w_lut).max() + 1e-12
    # bounded by the lut artifact's own bf16 codeword storage granularity
    assert np.abs(w_uni - w_lut).max() / span < 2.0 ** -6
    x = rng.normal(size=(3, p.in_features)).astype(np.float32)
    y_lut = np.asarray(apply(p, x))
    y_uni = np.asarray(apply(q, x))
    np.testing.assert_allclose(y_uni, y_lut, rtol=2e-2, atol=2e-2 * span)


def test_certify_uniform_rejects_free_codebooks(rng):
    W, H, nsamples = make_problem(rng, m=48, n=128, p=512)
    outliers = (rng.random(size=W.shape) < 0.05) * rng.normal(size=W.shape) * 8.0
    W = (W + outliers).astype(np.float32)
    cfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=3,
                         act_sort="asc", l_damp_style="ganq", dead="mean")
    res = ganq_quantize(W, H, cfg, nsamples)
    p = lut_linear(res.lut, res.idx, bits=4)
    assert certify_uniform(p) is None


def test_lut8_snap_and_recode_roundtrip(rng):
    """codebook="lut8": the solved codebook sits on a per-row int8 grid, so
    the w8 recode serves the artifact with at most one int8 step of error
    on the extreme codewords (bf16 lut storage), and the solver's S-step
    already optimized assignments against the snapped values."""
    T = rng.normal(size=(32, 16)).astype(np.float32) * 3.0
    Ts = np.asarray(snap_lut8(T))
    b = np.abs(Ts).max(axis=1, keepdims=True) / 127.0
    codes = Ts / np.maximum(b, 1e-30)
    np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)

    W, H, nsamples = make_problem(rng, m=64, n=128, p=512)
    cfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=3,
                         act_sort="asc", l_damp_style="ganq", dead="mean",
                         ganq_codebook="lut8")
    res = ganq_quantize(W, H, cfg, nsamples)
    assert res.quad_loss_free is not None
    # snapping is nearly free: within a few percent of the free codebook
    assert res.quad_loss <= res.quad_loss_free * 1.05
    p = lut_linear(res.lut, res.idx, bits=4)
    w8 = recode_w8(p)
    w_lut = np.asarray(dequantize_weight(p))
    w_rec = np.asarray(dequantize_weight(w8))
    span = np.abs(w_lut).max(axis=1, keepdims=True) + 1e-12
    assert (np.abs(w_rec - w_lut) / span).max() <= 1.5 / 127.0


def test_optimize_auto_prefers_certify(rng):
    """optimize(recode="auto"): affine LUTs certify to uniform (lossless,
    bits=4); free LUTs recode to the per-128-group uniform8 artifact
    (round 4: recode_uniform8 -> the w8p plane megastep; measured +0.03
    ppl over the exact LUT, PERF.md r4)."""
    from ganq_tpu.ops.qlinear import QLinear

    W, H, nsamples = make_problem(rng, m=64, n=128, p=512)
    cfg_a = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=2,
                           act_sort="asc", l_damp_style="ganq", dead="mean",
                           ganq_codebook="affine_sym")
    res_a = ganq_quantize(W, H, cfg_a, nsamples)
    p_aff = lut_linear(res_a.lut, res_a.idx, bits=4)

    outliers = (rng.random(size=W.shape) < 0.05) * rng.normal(size=W.shape) * 8.0
    cfg_f = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=2,
                           act_sort="asc", l_damp_style="ganq", dead="mean")
    res_f = ganq_quantize((W + outliers).astype(np.float32), H, cfg_f, nsamples)
    p_free = lut_linear(res_f.lut, res_f.idx, bits=4)

    class FakeModel:
        params = {"layers": [{"attn": {"q": p_aff, "o": p_free}}]}
        backend = "reference"

    from ganq_tpu.api import GanqModel
    m = FakeModel()
    GanqModel.optimize(m, recode="auto")
    q = m.params["layers"][0]["attn"]["q"]
    o = m.params["layers"][0]["attn"]["o"]
    assert q.kind == "uniform" and q.bits == 4          # certified, lossless
    assert o.kind == "uniform" and o.bits == 8          # per-group recode
    assert o["scales"].shape == (64, 1)                 # n=128 -> one group
