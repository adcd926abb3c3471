"""Selective-scan (Mamba S6) ops vs a float64 numpy oracle, plus the
streaming contract: prefill-then-decode must equal one long prefill (the
same handoff guarantee the attention KV cache has)."""

import numpy as np
import jax
import jax.numpy as jnp

from ganq_tpu.ops.ssm import causal_conv1d, mamba_mix, selective_scan


def _np_selective_scan(x, dt, A_log, Bc, Cc, D, z=None, h0=None):
    B, T, Di = x.shape
    N = A_log.shape[1]
    A = -np.exp(A_log.astype(np.float64))
    h = (np.zeros((B, Di, N)) if h0 is None else h0.astype(np.float64))
    ys = np.zeros((B, T, Di))
    for t in range(T):
        dA = np.exp(dt[:, t, :, None] * A[None])
        h = h * dA + (dt[:, t] * x[:, t])[..., None] * Bc[:, t, None, :]
        ys[:, t] = np.einsum("bdn,bn->bd", h, Cc[:, t])
    y = ys + D[None, None, :] * x
    if z is not None:
        y = y * (z / (1 + np.exp(-z)))
    return y, h


def _rand_scan_inputs(rng, B=2, T=9, Di=8, N=4):
    x = rng.normal(size=(B, T, Di)).astype(np.float32)
    dt = rng.uniform(0.01, 0.3, size=(B, T, Di)).astype(np.float32)
    A_log = rng.uniform(-1.0, 1.0, size=(Di, N)).astype(np.float32)
    Bc = rng.normal(size=(B, T, N)).astype(np.float32)
    Cc = rng.normal(size=(B, T, N)).astype(np.float32)
    D = rng.normal(size=(Di,)).astype(np.float32)
    z = rng.normal(size=(B, T, Di)).astype(np.float32)
    return x, dt, A_log, Bc, Cc, D, z


def test_selective_scan_matches_f64_oracle(rng):
    x, dt, A_log, Bc, Cc, D, z = _rand_scan_inputs(rng)
    want_y, want_h = _np_selective_scan(
        x.astype(np.float64), dt.astype(np.float64),
        A_log, Bc.astype(np.float64), Cc.astype(np.float64),
        D.astype(np.float64), z.astype(np.float64))
    y, hT = selective_scan(*map(jnp.asarray, (x, dt, A_log, Bc, Cc, D, z)))
    np.testing.assert_allclose(np.asarray(y, np.float64), want_y,
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hT, np.float64), want_h,
                               atol=1e-4, rtol=1e-4)


def test_selective_scan_streaming_state(rng):
    """scan(T) == scan(first half) then scan(second half, h0=handoff)."""
    x, dt, A_log, Bc, Cc, D, z = _rand_scan_inputs(rng, T=10)
    full_y, full_h = selective_scan(
        *map(jnp.asarray, (x, dt, A_log, Bc, Cc, D, z)))
    cut = 6
    y1, h1 = selective_scan(*[jnp.asarray(a[:, :cut]) for a in (x, dt)],
                            jnp.asarray(A_log),
                            *[jnp.asarray(a[:, :cut]) for a in (Bc, Cc)],
                            jnp.asarray(D), z=jnp.asarray(z[:, :cut]))
    y2, h2 = selective_scan(*[jnp.asarray(a[:, cut:]) for a in (x, dt)],
                            jnp.asarray(A_log),
                            *[jnp.asarray(a[:, cut:]) for a in (Bc, Cc)],
                            jnp.asarray(D), z=jnp.asarray(z[:, cut:]),
                            h0=h1)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], 1)),
                               np.asarray(full_y), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full_h),
                               atol=1e-5, rtol=1e-5)


def test_causal_conv1d_oracle_and_streaming(rng):
    B, T, Di, K = 2, 11, 6, 4
    x = rng.normal(size=(B, T, Di)).astype(np.float32)
    w = rng.normal(size=(K, Di)).astype(np.float32)
    b = rng.normal(size=(Di,)).astype(np.float32)
    # oracle: y_t = b + sum_k w[k] * x_{t-K+1+k} (zeros left-pad)
    pad = np.concatenate([np.zeros((B, K - 1, Di), np.float32), x], axis=1)
    want = b + sum(w[k] * pad[:, k:k + T] for k in range(K))
    y, st = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(st), x[:, T - K + 1:])
    # streaming: segment at 7, carry conv state
    y1, s1 = causal_conv1d(jnp.asarray(x[:, :7]), jnp.asarray(w),
                           jnp.asarray(b))
    y2, _ = causal_conv1d(jnp.asarray(x[:, 7:]), jnp.asarray(w),
                          jnp.asarray(b), state=s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), want, atol=1e-5, rtol=1e-5)


def _rand_mamba_params(rng, H=16, Di=32, N=4, dt_rank=4, K=4):
    g = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    return {
        "in_proj": {"weight": g(2 * Di, H)},
        "conv_w": g(K, Di), "conv_b": g(Di),
        "x_proj": {"weight": g(dt_rank + 2 * N, Di)},
        "dt_proj": {"weight": g(Di, dt_rank),
                    "bias": jnp.asarray(
                        rng.uniform(-4, -2, size=(Di,)).astype(np.float32))},
        "A_log": g(Di, N), "D": g(Di),
        "out_proj": {"weight": g(H, Di)},
    }


def test_mamba_mix_prefill_equals_stepwise_decode(rng):
    """The full mixer's streaming contract: prefill T tokens == prefill
    T0 then decode one token at a time carrying {conv, ssm} state."""
    B, T, H = 2, 8, 16
    mp = _rand_mamba_params(rng, H=H)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32) * 0.5)
    full, _, taps = mamba_mix(mp, x, want_taps=True)
    assert taps["mamba.in_proj"].shape == (B, T, H)
    T0 = 3
    y, st, _ = mamba_mix(mp, x[:, :T0])
    outs = [y]
    for t in range(T0, T):
        y, st, _ = mamba_mix(mp, x[:, t:t + 1], state=st)
        outs.append(y)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_mamba_mix_quantized_projections(rng):
    """in_proj/out_proj as QLinear nodes (the reference's quantization
    targets, hymba.py layer_modules) serve through the same mixer."""
    from ganq_tpu.ops.qlinear import dense_linear

    B, T, H = 1, 5, 16
    mp = _rand_mamba_params(rng, H=H)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32) * 0.5)
    want, _, _ = mamba_mix(mp, x)
    mp2 = dict(mp)
    mp2["in_proj"] = dense_linear(mp["in_proj"]["weight"])
    mp2["out_proj"] = dense_linear(mp["out_proj"]["weight"])
    got, _, _ = mamba_mix(mp2, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
