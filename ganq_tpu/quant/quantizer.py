"""Uniform affine quantization parameter search (JAX).

Semantics match the reference ``gptqmodel/quantization/quantizer.py:40-168``:
per-channel min/max affine parameters, symmetric handling, and the optional
MSE grid-shrink search — but fully vectorized/jittable (the reference's
``for i in range(maxshrink*grid)`` loop becomes one batched grid evaluation).

Convention: weights are quantized per *output row* over a slice of input
columns (a "group"); ``find_params`` takes ``x`` of shape ``[rows, cols]``
and returns per-row ``scale``/``zero`` of shape ``[rows, 1]``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class UniformParams(NamedTuple):
    scale: jax.Array  # [rows, 1] float32
    zero: jax.Array   # [rows, 1] float32 (integer-valued zero point)
    maxq: int


def quantize_affine(x: jax.Array, scale: jax.Array, zero: jax.Array, maxq: int) -> jax.Array:
    """Fake-quantize x with affine params (reference quantizer.py:24-37)."""
    q = jnp.clip(jnp.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def quantize_affine_idx(x: jax.Array, scale: jax.Array, zero: jax.Array, maxq: int) -> jax.Array:
    """Integer codes in [0, maxq]."""
    return jnp.clip(jnp.round(x / scale) + zero, 0, maxq).astype(jnp.int32)


@partial(jax.jit, static_argnames=("bits", "sym", "mse", "grid", "maxshrink"))
def find_params(
    x: jax.Array,
    *,
    bits: int,
    sym: bool,
    mse: float = 0.0,
    grid: int = 100,
    maxshrink: float = 0.8,
) -> UniformParams:
    """Per-row affine params for a [rows, cols] weight slice.

    Mirrors reference ``find_params(x, weight=True)`` with perchannel=True:
    min/max clamped through 0, sym mirroring, zero-range guard, optional MSE
    grid search shrinking the range by p = 1 - i/grid.
    """
    x = x.astype(jnp.float32)
    maxq = 2**bits - 1

    xmin = jnp.minimum(jnp.min(x, axis=1), 0.0)  # [rows]
    xmax = jnp.maximum(jnp.max(x, axis=1), 0.0)

    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)

    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)

    if mse > 0.0:
        # Vectorized grid-shrink search over p = 1 - i/grid, i in [0, maxshrink*grid)
        steps = int(maxshrink * grid)
        ps = 1.0 - jnp.arange(steps, dtype=jnp.float32) / grid  # [steps]
        xmin1 = ps[:, None] * xmin[None, :]                     # [steps, rows]
        xmax1 = ps[:, None] * xmax[None, :]
        scale1 = (xmax1 - xmin1) / maxq
        if sym:
            zero1 = jnp.broadcast_to(zero[None, :], scale1.shape)
        else:
            zero1 = jnp.round(-xmin1 / scale1)
        q = quantize_affine(x[None, :, :], scale1[:, :, None], zero1[:, :, None], maxq)
        err = jnp.sum(jnp.abs(q - x[None, :, :]) ** mse, axis=2)  # [steps, rows]
        # include the unshrunk (i=0 gives p=1.0 which equals base) — argmin over steps
        best = jnp.argmin(err, axis=0)                            # [rows]
        rows = jnp.arange(x.shape[0])
        base_err = jnp.sum(jnp.abs(quantize_affine(x, scale[:, None], zero[:, None], maxq) - x) ** mse, axis=1)
        improved = err[best, rows] < base_err
        scale = jnp.where(improved, scale1[best, rows], scale)
        zero = jnp.where(improved, zero1[best, rows], zero)

    return UniformParams(scale[:, None], zero[:, None], maxq)


__all__ = ["UniformParams", "find_params", "quantize_affine", "quantize_affine_idx"]
