"""Kernel micro-benchmark harness.

The TPU in this environment sits behind a dispatch tunnel with ~0.7 ms
per-call overhead, so wall-clocking individual dispatches measures the tunnel,
not the kernel. ``time_fn`` therefore iterates *inside* one compiled program
(a ``lax.fori_loop`` whose carry injects a negligible data dependency between
iterations to defeat DCE/CSE) and divides by the iteration count.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_fn(fn: Callable, *args, iters: int = 100, warmup: int = 1) -> float:
    """Average seconds per call of ``fn(*args)`` measured in-graph."""

    @jax.jit
    def looped(*args):
        x0 = args[0]

        def body(i, carry):
            x, acc = carry
            y = fn(x, *args[1:])
            # fold a negligible scalar of y back into x: data dependency
            # between iterations without changing the math
            eps = jnp.sum(y).astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
            return x + eps, acc + eps.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0)))
        return acc

    # note: on this environment's tunneled TPU platform block_until_ready
    # can return before execution completes; fetching the scalar result to
    # the host is the only reliable completion barrier
    float(looped(*args))  # compile + warm
    t0 = time.perf_counter()
    out = float(looped(*args))
    return (time.perf_counter() - t0) / iters


__all__ = ["time_fn"]
