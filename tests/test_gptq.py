"""GPTQ solver parity vs an independent NumPy oracle of the reference loop
(gptqmodel/quantization/gptq.py:164-236, 239-375)."""

import numpy as np
import pytest

from ganq_tpu.core.config import QuantizeConfig
from ganq_tpu.quant.gptq import gptq_quantize
from tests.test_quantizer import numpy_find_params


def numpy_gptq(W, H, cfg: QuantizeConfig, blocksize=128):
    """Faithful NumPy port of the reference quantize() semantics (fp64 for
    an independent error bar)."""
    W = np.asarray(W, np.float64).copy()
    H = np.asarray(H, np.float64).copy()
    m, n = W.shape
    maxq = 2**cfg.bits - 1

    # gs=-1 quantizer params from raw W (reference gptq.py:265)
    if cfg.group_size == -1:
        g_scale, g_zero = numpy_find_params(W, cfg.bits, cfg.sym, cfg.mse)
    static_groups = getattr(cfg, "static_groups", False)

    dead = np.diag(H) == 0
    H[dead, dead] = 1
    if cfg.dead == "zero":
        W[:, dead] = 0
    else:
        W[:, dead] = W[:, ~dead].mean(axis=1, keepdims=True)

    act_sort = cfg.resolved_act_sort()
    perm = invperm = None
    if act_sort != "none":
        order = np.argsort(np.diag(H), kind="stable")
        perm = order[::-1] if act_sort == "desc" else order
        W = W[:, perm]
        H = H[perm][:, perm]
        invperm = np.argsort(perm)

    # static groups: per-group params from the POST-PERM W before the loop,
    # looked up by the ORIGINAL column index when desc_act (exactly the
    # reference's semantics: _perform_quantization_loop receives the
    # permuted W and indexes groups[perm[idx] // gs], gptq.py:174-213)
    sg_scales, sg_zeros = [], []
    if static_groups and cfg.group_size != -1:
        for i in range(0, n, cfg.group_size):
            ss, zz = numpy_find_params(W[:, i:i + cfg.group_size], cfg.bits,
                                       cfg.sym, cfg.mse)
            sg_scales.append(ss)
            sg_zeros.append(zz)

    damp = cfg.damp_percent * np.mean(np.diag(H))
    H[np.arange(n), np.arange(n)] += damp
    Linv = np.linalg.inv(np.linalg.cholesky(H))
    Hinv = np.linalg.cholesky(Linv.T @ Linv).T  # upper factor of H^-1

    Q = np.zeros_like(W)
    Losses = np.zeros_like(W)
    gs = cfg.group_size if cfg.group_size != -1 else n
    scales, zeros = [], []

    cur_s = g_scale if cfg.group_size == -1 else None
    cur_z = g_zero if cfg.group_size == -1 else None

    for i1 in range(0, n, blocksize):
        i2 = min(i1 + blocksize, n)
        W1 = W[:, i1:i2].copy()
        Err1 = np.zeros_like(W1)
        for i in range(i2 - i1):
            col = i1 + i
            if cfg.group_size != -1 and static_groups:
                idx = perm[col] if (cfg.desc_act and perm is not None) else col
                cur_s, cur_z = sg_scales[idx // gs], sg_zeros[idx // gs]
            elif cfg.group_size != -1 and col % gs == 0:
                cur_s, cur_z = numpy_find_params(W[:, col:col + gs], cfg.bits, cfg.sym, cfg.mse)
                scales.append(cur_s)
                zeros.append(cur_z)
            w = W1[:, i]
            d = Hinv[col, col]
            q = cur_s * (np.clip(np.round(w / cur_s) + cur_z, 0, maxq) - cur_z)
            Q[:, col] = q
            Losses[:, col] = (w - q) ** 2 / d**2 / 2
            err = (w - q) / d
            W1[:, i:] -= err[:, None] * Hinv[col, i1:i2][i:][None, :]
            Err1[:, i] = err
        W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]
        W[:, i1:i2] = W1

    if invperm is not None:
        Q = Q[:, invperm]
    return Q, Losses


def make_problem(rng, m=96, n=160, p=640):
    W = rng.normal(size=(m, n)).astype(np.float32)
    X = rng.normal(size=(n, p)).astype(np.float32)
    nsamples = 4
    H = (2.0 / nsamples) * (X @ X.T) * (nsamples / p)  # scaled like 4 seqs of p/4 tokens
    return W, H.astype(np.float32), nsamples


@pytest.mark.parametrize("group_size,sym,act_sort", [
    (-1, True, "none"),
    (-1, False, "none"),
    (32, False, "none"),
    (32, False, "desc"),
    (64, True, "asc"),
])
def test_gptq_matches_numpy_oracle(rng, group_size, sym, act_sort):
    W, H, nsamples = make_problem(rng)
    cfg = QuantizeConfig(bits=4, group_size=group_size, sym=sym,
                         act_sort=act_sort, desc_act=False)
    _run_oracle_case(rng, W, H, nsamples, cfg)


@pytest.mark.parametrize("desc_act", [False, True])
def test_gptq_static_groups_matches_oracle(rng, desc_act):
    """static_groups (+ desc_act permutation lookup) vs the oracle — the
    reference computes group params from the PERMUTED W and indexes them by
    the original column (gptq.py:174-213); parity is with that behavior."""
    W, H, nsamples = make_problem(rng)
    cfg = QuantizeConfig(bits=4, group_size=32, sym=False,
                         static_groups=True, desc_act=desc_act,
                         act_sort="desc" if desc_act else "none")
    _run_oracle_case(rng, W, H, nsamples, cfg)


def _run_oracle_case(rng, W, H, nsamples, cfg):
    res = gptq_quantize(W, H, cfg, nsamples)
    Qref, Lref = numpy_gptq(W, H, cfg)

    Q = np.asarray(res.Q, np.float64)
    # fp32-vs-fp64 pipelines: tiny fraction of columns may round to the
    # adjacent grid point near ties; require near-exact agreement.
    mismatch = np.mean(~np.isclose(Q, Qref, rtol=1e-4, atol=1e-5))
    assert mismatch < 0.02, f"grid mismatch fraction {mismatch}"
    # losses agree in aggregate
    assert np.isfinite(res.avg_loss)
    ref_avg = Lref.sum() / nsamples
    assert abs(res.avg_loss - ref_avg) / max(ref_avg, 1e-9) < 0.05


def test_gptq_reduces_hessian_weighted_error(rng):
    """GPTQ must beat round-to-nearest under the calibration Hessian metric."""
    W, H, nsamples = make_problem(rng, m=128, n=256)
    cfg = QuantizeConfig(bits=4, group_size=-1, sym=False, act_sort="none", desc_act=False)
    res = gptq_quantize(W, H, cfg, nsamples)

    s, z = numpy_find_params(W, 4, False)
    rtn = s[:, None] * (np.clip(np.round(W / s[:, None]) + z[:, None], 0, 15) - z[:, None])

    def hess_err(Wq):
        E = W - Wq
        return float(np.sum((E @ H) * E))

    assert hess_err(np.asarray(res.Q)) < hess_err(rtn) * 0.9


def test_gptq_dead_columns(rng):
    W = rng.normal(size=(32, 64)).astype(np.float32)
    X = rng.normal(size=(64, 256)).astype(np.float32)
    X[10] = 0.0  # dead input feature
    H = 2.0 * (X @ X.T) / 256
    cfg = QuantizeConfig(bits=4, group_size=-1, dead="mean", act_sort="none", desc_act=False)
    res = gptq_quantize(W, H.astype(np.float32), cfg, 1)
    assert np.all(np.isfinite(np.asarray(res.Q)))


def test_gptq_g_idx_desc_act(rng):
    W, H, nsamples = make_problem(rng, m=32, n=128)
    cfg = QuantizeConfig(bits=4, group_size=32, desc_act=True)  # act_sort auto->desc
    res = gptq_quantize(W, H, cfg, nsamples)
    g = np.asarray(res.g_idx)
    assert g.shape == (128,)
    assert set(np.unique(g)) == {0, 1, 2, 3}
