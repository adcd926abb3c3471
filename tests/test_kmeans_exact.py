"""Native exact weighted 1-D k-means: optimality vs brute force, parity with
the Lloyd init quality, batched API."""

import itertools

import numpy as np
import pytest

from ganq_tpu.ops.kmeans_exact import kmeans1d, kmeans_rows_exact


def brute_force_cost(x, w, k):
    """Optimal contiguous-partition cost by enumerating all split points."""
    order = np.argsort(x)
    xs, ws = x[order], w[order]
    n = len(xs)

    def seg_cost(a, b):
        sw = ws[a:b].sum()
        if sw == 0:
            return 0.0
        mu = (ws[a:b] * xs[a:b]).sum() / sw
        return float((ws[a:b] * (xs[a:b] - mu) ** 2).sum())

    best = np.inf
    for splits in itertools.combinations(range(1, n), k - 1):
        bounds = [0, *splits, n]
        cost = sum(seg_cost(bounds[i], bounds[i + 1]) for i in range(k))
        best = min(best, cost)
    return best


@pytest.mark.parametrize("n,k", [(8, 2), (10, 3), (12, 4)])
def test_exact_optimality_small(rng, n, k):
    for trial in range(5):
        x = rng.normal(size=n)
        w = rng.random(size=n) + 0.1
        cents, assign = kmeans1d(x, k, weights=w)
        cost = sum(w[i] * (x[i] - cents[assign[i]]) ** 2 for i in range(n))
        ref = brute_force_cost(x, w, k)
        assert cost <= ref * (1 + 1e-9) + 1e-12, (cost, ref)


def test_centroids_sorted_and_assignment_consistent(rng):
    x = rng.normal(size=200)
    w = rng.random(size=200) + 0.01
    cents, assign = kmeans1d(x, 16, weights=w)
    assert np.all(np.diff(cents) >= -1e-12)
    # each point maps to its nearest-or-segment centroid; check objective is
    # no worse than nearest-centroid reassignment (exactness implies equality)
    d = np.abs(x[:, None] - cents[None, :])
    nearest = d.argmin(axis=1)
    cost_assign = np.sum(w * (x - cents[assign]) ** 2)
    cost_nearest = np.sum(w * (x - cents[nearest]) ** 2)
    assert cost_assign <= cost_nearest * (1 + 1e-6) + 1e-9


def test_rows_batched_matches_single(rng):
    X = rng.normal(size=(6, 64))
    w = rng.random(size=64) + 0.1
    out = kmeans_rows_exact(X, w, 8, n_threads=2)
    for r in range(6):
        cents, _ = kmeans1d(X[r], 8, weights=w)
        np.testing.assert_allclose(out[r], cents, atol=1e-10)


def test_exact_beats_or_matches_lloyd(rng):
    import jax.numpy as jnp
    from ganq_tpu.ops.kmeans import weighted_kmeans_1d

    X = rng.normal(size=(16, 256)) + (rng.random(size=(16, 256)) < 0.05) * 4.0
    w = rng.random(size=256) + 0.1
    exact = kmeans_rows_exact(X, w, 16)
    lloyd = np.asarray(weighted_kmeans_1d(jnp.asarray(X, jnp.float32),
                                          jnp.asarray(w, jnp.float32), k=16))

    def cost(X, C):
        d = np.abs(X[:, :, None] - C[:, None, :])
        a = d.argmin(axis=2)
        vals = np.take_along_axis(C, a, axis=1)
        return np.sum(w[None, :] * (X - vals) ** 2, axis=1)

    ce, cl = cost(X, exact), cost(X, lloyd)
    assert np.all(ce <= cl * (1 + 1e-5))
    # On heavy-tailed rows exact DP beats Lloyd by 2-4x — this is why
    # codebook_init defaults to "kmeans_exact" (the reference also uses the
    # exact kmeans1d package, ganq.py:423-438)


def test_ganq_with_exact_codebook(rng):
    from ganq_tpu.core.config import QuantizeConfig
    from ganq_tpu.quant.ganq import ganq_quantize
    from tests.test_gptq import make_problem

    W, H, ns = make_problem(rng, m=48, n=96, p=384)
    cfg = QuantizeConfig(quant_method="ganq", ganq_iterations=2,
                         act_sort="asc", l_damp_style="ganq", dead="mean",
                         codebook_init="kmeans_exact")
    res = ganq_quantize(W, H, cfg, ns)
    assert np.isfinite(res.quad_loss)
