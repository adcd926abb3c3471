"""Batched weighted 1-D k-means for LUT codebook initialization.

The reference initializes each row's 16-entry codebook with *exact* weighted
1-D k-means (the ``kmeans1d`` C++ SMAWK package) on a host thread pool, with
LeanQuant weights ``diag(Hinv)^-exp`` (``gptqmodel/quantization/ganq.py:423-438``).

TPU-native default: all ``m`` rows solved in parallel on-device with weighted
Lloyd iterations from a weighted-quantile init — O(iters * m * n * k) on the
VPU/MXU instead of a serial host loop. An exact SMAWK/D&C implementation is
available as the native host op (``ganq_tpu/native/kmeans1d.cpp``) behind
``codebook_init="kmeans_exact"``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _weighted_quantile_init(x: jax.Array, w: jax.Array, k: int) -> jax.Array:
    """Per-row weighted quantiles as initial centers. x: [m, n], w: [n] -> [m, k]."""
    order = jnp.argsort(x, axis=1)
    xs = jnp.take_along_axis(x, order, axis=1)
    ws = w[order]                                  # [m, n]
    cumw = jnp.cumsum(ws, axis=1)
    total = cumw[:, -1:]
    targets = (jnp.arange(k, dtype=x.dtype) + 0.5) / k * total  # [m, k]
    idx = jax.vmap(jnp.searchsorted)(cumw, targets)             # [m, k]
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    return jnp.take_along_axis(xs, idx, axis=1)


@partial(jax.jit, static_argnames=("k", "iters", "row_chunk"))
def weighted_kmeans_1d(x: jax.Array, w: jax.Array, k: int = 16,
                       iters: int = 25, row_chunk: int = 1024) -> jax.Array:
    """Weighted Lloyd k-means per row. x: [m, n] fp32, w: [n] fp32 -> [m, k].

    Rows are processed in chunks via ``lax.map`` to bound the [chunk, n, k]
    distance tensor in memory. Empty clusters keep their previous center.
    Centers are returned sorted ascending (canonical LUT order).
    """
    m, n = x.shape
    x = x.astype(jnp.float32)
    w = w.astype(jnp.float32)

    pad = (-m) % row_chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))

    def solve_chunk(xc):
        c = _weighted_quantile_init(xc, w, k)  # [rc, k]

        def step(_, c):
            d = jnp.abs(xc[:, :, None] - c[:, None, :])       # [rc, n, k]
            a = jnp.argmin(d, axis=2)                          # [rc, n]
            onehot = jax.nn.one_hot(a, k, dtype=jnp.float32)   # [rc, n, k]
            wx = (w[None, :] * xc)                             # [rc, n]
            num = jnp.einsum("rn,rnk->rk", wx, onehot)
            den = jnp.einsum("n,rnk->rk", w, onehot)
            c_new = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), c)
            return c_new

        c = jax.lax.fori_loop(0, iters, step, c)
        return jnp.sort(c, axis=1)

    chunks = xp.reshape(-1, row_chunk, n)
    out = jax.lax.map(solve_chunk, chunks).reshape(-1, k)
    return out[:m]


def leanquant_weights(hinv_diag: jax.Array, exp: float = 4.0) -> jax.Array:
    """LeanQuant weighting: diag(Hinv)^-exp (reference ganq.py:427-429)."""
    return jnp.asarray(hinv_diag, jnp.float32) ** (-exp)


__all__ = ["weighted_kmeans_1d", "leanquant_weights"]
