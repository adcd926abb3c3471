"""GANQ solver tests: S-step exact parity vs the slow reference loop, T-step
vs numpy lstsq, full-solver quality (loss decreases; beats uniform GPTQ under
the calibration-Hessian metric — the property behind the reference's ppl wins).

Models the reference's kernel test strategy (tests/test_ganq_solve_s_kernel.py:
fused kernel vs obvious loop, exact index equality)."""

import numpy as np
import pytest

from ganq_tpu.core.config import QuantizeConfig
from ganq_tpu.quant.ganq import (ganq_quantize, quad_loss, s_step,
                                 s_step_reference, t_step)
from ganq_tpu.quant.gptq import gptq_quantize
from tests.test_gptq import make_problem


def random_chol(rng, n):
    A = rng.normal(size=(n, n)).astype(np.float32)
    H = A @ A.T / n + np.eye(n, dtype=np.float32)
    return H, np.linalg.cholesky(H).astype(np.float32)


def test_s_step_matches_reference_loop(rng):
    m, n, k = 48, 96, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    _, L = random_chol(rng, n)
    T = np.sort(rng.normal(size=(m, k)).astype(np.float32), axis=1)

    Q, Werr = s_step(W, L, T)
    Qref = s_step_reference(W, L, T)
    # exact index equality (fp32 both sides, same op order semantics)
    agree = np.mean(np.asarray(Q) == Qref)
    assert agree > 0.999, f"S-step index agreement {agree}"
    # Werr consistency: Werr = W - T[Q]
    Wq = np.take_along_axis(T, np.asarray(Q), axis=1)
    np.testing.assert_allclose(np.asarray(Werr), W - Wq, rtol=1e-5, atol=1e-5)


def test_t_step_matches_numpy_lstsq(rng):
    m, n, k = 24, 64, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H, _ = random_chol(rng, n)
    Q = rng.integers(0, k, size=(m, n)).astype(np.int32)
    WH = W @ H

    T = np.asarray(t_step(WH, H, Q, k))

    # reference math: T[i] = lstsq(S H S^T, S (W H)^T) (ganq.py:578-591)
    for i in range(m):
        S = np.zeros((k, n), np.float64)
        S[Q[i], np.arange(n)] = 1
        A = S @ H.astype(np.float64) @ S.T
        b = S @ WH[i].astype(np.float64)
        ref, *_ = np.linalg.lstsq(A, b, rcond=None)
        used = np.isin(np.arange(k), Q[i])
        np.testing.assert_allclose(T[i][used], ref[used], rtol=2e-3, atol=2e-3)
        # unused codewords -> 0 (min-norm), matching gelsd
        np.testing.assert_allclose(T[i][~used], 0.0, atol=2e-3)


def test_t_step_reduces_quad_loss(rng):
    """One (S, T) alternation must not increase tr(E H E^T) given fixed Q."""
    m, n, k = 32, 80, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H, L = random_chol(rng, n)
    T0 = np.sort(rng.normal(size=(m, k)).astype(np.float32), axis=1)
    Q, _ = s_step(W, L, T0)
    Q = np.asarray(Q)
    Wq0 = np.take_along_axis(T0, Q, axis=1)
    loss0 = float(quad_loss(W, Wq0, H))
    T1 = np.asarray(t_step(W @ H, H, Q, k))
    Wq1 = np.take_along_axis(T1, Q, axis=1)
    loss1 = float(quad_loss(W, Wq1, H))
    assert loss1 <= loss0 * (1 + 1e-5), (loss0, loss1)


def test_ganq_full_beats_gptq_on_hessian_metric(rng):
    """The accuracy contract in miniature: GANQ W4 error under the calibration
    Hessian must be well below uniform GPTQ g-1 (SURVEY.md §6 ppl deltas).

    Heavy-tailed rows (Gaussian + sparse outliers — the realistic LLM weight
    shape) are where the non-uniform per-row codebook wins over any uniform
    grid; iid Gaussian would not discriminate."""
    W, H, nsamples = make_problem(rng, m=96, n=128, p=512)
    outliers = (rng.random(size=W.shape) < 0.02) * rng.normal(size=W.shape) * 8.0
    W = (W + outliers).astype(np.float32)
    gq = QuantizeConfig(bits=4, group_size=-1, sym=False, act_sort="none", desc_act=False)
    ganq_cfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=5,
                              act_sort="asc", l_damp_style="ganq", dead="mean")

    res_g = gptq_quantize(W, H, gq, nsamples)
    res_n = ganq_quantize(W, H, ganq_cfg, nsamples)

    def hess_err(Wq):
        E = W - np.asarray(Wq)
        return float(np.sum((E @ H) * E))

    e_gptq = hess_err(res_g.Q)
    e_ganq = hess_err(res_n.Q)
    assert e_ganq < e_gptq * 0.7, (e_ganq, e_gptq)

    # artifact invariants: Wq == lut[idx] (up to permutation restore)
    lut = np.asarray(res_n.lut)
    idx = np.asarray(res_n.idx)
    np.testing.assert_allclose(
        np.take_along_axis(lut, idx, axis=1), np.asarray(res_n.Q), rtol=1e-6)
    assert idx.min() >= 0 and idx.max() < 16


def test_ganq_iterations_do_not_diverge(rng):
    """Best-(T,Q) tracking guards against divergence (ganq.py:621-626)."""
    W, H, nsamples = make_problem(rng, m=64, n=96, p=384)
    cfg1 = QuantizeConfig(quant_method="ganq", ganq_iterations=1,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    cfg5 = QuantizeConfig(quant_method="ganq", ganq_iterations=5,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    r1 = ganq_quantize(W, H, cfg1, nsamples)
    r5 = ganq_quantize(W, H, cfg5, nsamples)
    assert r5.quad_loss <= r1.quad_loss * (1 + 1e-6)


def test_ganq_gptq_l_damp_style(rng):
    """l_damp_style=gptq path: S-step L is the damped Cholesky factor."""
    W, H, nsamples = make_problem(rng, m=32, n=64, p=256)
    cfg = QuantizeConfig(quant_method="ganq", ganq_iterations=2,
                         act_sort="asc", l_damp_style="gptq", dead="mean")
    res = ganq_quantize(W, H, cfg, nsamples)
    assert np.isfinite(res.quad_loss)
    assert np.all(np.isfinite(np.asarray(res.Q)))


def test_s_step_pallas_matches_scan(rng):
    """Fused Pallas S-step vs the lax.scan implementation: exact index
    parity (the reference's kernel-vs-loop test discipline,
    tests/test_ganq_solve_s_kernel.py)."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from ganq_tpu.ops.ganq_solver import s_step_pallas, s_step_fits

    m, n = 128, 256
    W = rng.normal(size=(m, n)).astype(np.float32)
    _, L = random_chol(rng, n)
    T = np.sort(rng.normal(size=(m, 16)).astype(np.float32), axis=1)
    assert s_step_fits(m, n)

    Qref, Werr_ref = s_step(W, L, T)
    if os.environ.get("GANQ_TPU_TEST_TPU"):
        Q, Werr = s_step_pallas(W, L, T)
    else:
        with pltpu.force_tpu_interpret_mode():
            Q, Werr = s_step_pallas(W, L, T)
    agree = np.mean(np.asarray(Q) == np.asarray(Qref))
    assert agree > 0.999, f"pallas S-step agreement {agree}"
    np.testing.assert_allclose(np.asarray(Werr), np.asarray(Werr_ref),
                               rtol=1e-4, atol=1e-4)


def test_t_step_fast_close_to_exact(rng):
    """bf16-contraction T-step (hessian_dtype='bfloat16') must track the f32
    path closely: the one-hot factor is exact, only H rounds."""
    m, n, k = 32, 96, 16
    W = rng.normal(size=(m, n)).astype(np.float32)
    H, _ = random_chol(rng, n)
    Q = rng.integers(0, k, size=(m, n)).astype(np.int32)
    WH = W @ H
    T_exact = np.asarray(t_step(WH, H, Q, k))
    T_fast = np.asarray(t_step(WH, H, Q, k, fast=True))
    denom = np.abs(T_exact).max() + 1e-9
    assert np.abs(T_fast - T_exact).max() / denom < 0.05


def test_ganq_fast_hessian_dtype(rng):
    W, H, nsamples = make_problem(rng, m=64, n=96, p=384)
    cfg = QuantizeConfig(quant_method="ganq", ganq_iterations=3,
                         act_sort="asc", l_damp_style="ganq", dead="mean",
                         hessian_dtype="bfloat16")
    res = ganq_quantize(W, H, cfg, nsamples)
    cfg32 = QuantizeConfig(quant_method="ganq", ganq_iterations=3,
                           act_sort="asc", l_damp_style="ganq", dead="mean")
    res32 = ganq_quantize(W, H, cfg32, nsamples)
    # fast path stays within a few percent of the exact quad loss
    assert res.quad_loss < res32.quad_loss * 1.1


def test_s_step_blocked_pallas_matches_scan(rng):
    """Blocked-pipeline Pallas S-step (the round-3 production kernel,
    ops/ganq_solver.s_step_blocked_pallas) vs the lax.scan implementation:
    exact index parity across several tiled shapes."""
    import os
    from jax.experimental.pallas import tpu as pltpu
    from ganq_tpu.ops.ganq_solver import (s_step_blocked_fits,
                                          s_step_blocked_pallas)

    # V = 16/8/4: bits 4/3/2 codebook widths (the r5 walsh flagship is
    # bits=3 -> 8-entry; the kernel row-pads sub-8 codebooks)
    for (m, n, V) in [(128, 256, 16), (256, 512, 16), (384, 256, 16),
                      (128, 256, 8), (256, 512, 8), (128, 256, 4)]:
        W = rng.normal(size=(m, n)).astype(np.float32)
        _, L = random_chol(rng, n)
        T = np.sort(rng.normal(size=(m, V)).astype(np.float32), axis=1)
        assert s_step_blocked_fits(m, n)

        Qref, Werr_ref = s_step(W, L, T)
        if os.environ.get("GANQ_TPU_TEST_TPU"):
            Q, Werr = s_step_blocked_pallas(W, L, T)
        else:
            with pltpu.force_tpu_interpret_mode():
                Q, Werr = s_step_blocked_pallas(W, L, T)
        agree = np.mean(np.asarray(Q) == np.asarray(Qref))
        assert agree > 0.999, \
            f"blocked S-step agreement {agree} ({m},{n},V={V})"
        np.testing.assert_allclose(np.asarray(Werr), np.asarray(Werr_ref),
                                   rtol=1e-4, atol=1e-4)
