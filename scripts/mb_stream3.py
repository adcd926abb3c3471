"""Isolate the megastep's ~520 GB/s effective-DMA ceiling: same total
traffic (~2.8 GB) through (a) ONE input with big blocks on a sequential
grid, (b) FIVE inputs with megastep-like mixed block shapes and clamped
index maps. If (a) ~matches (b), the ceiling is the platform's sequential
-grid pipeline; if (a) is much faster, the multi-input structure is the
bottleneck and the megastep should pack its weights into one blob."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, P = 28, 10
H = 3072


def run_single(total_bytes):
    rows = total_bytes // (L * P * H)
    A = jnp.zeros((L, P * rows, H), jnp.int8)

    def kernel(a_ref, o_ref, acc):
        p = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (p == 0))
        def _():
            acc[:] = jnp.zeros_like(acc)
        acc[:] += jnp.sum(a_ref[0, :8, :].astype(jnp.float32), axis=0,
                          keepdims=True)

        @pl.when((pl.program_id(0) == L - 1) & (p == P - 1))
        def _():
            o_ref[:] = acc[:]

    f = pl.pallas_call(
        kernel,
        grid=(L, P),
        in_specs=[pl.BlockSpec((1, rows, H), lambda l, p: (l, p, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H), lambda l, p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
    )
    g = jax.jit(lambda A: f(A))
    np.asarray(g(A))
    t0 = time.perf_counter()
    np.asarray(g(A))
    dt = time.perf_counter() - t0
    return total_bytes / dt / 1e9


def run_multi(total_bytes):
    # five inputs shaped like the megastep's weights, each visited in a
    # subset of phases with clamped index maps
    per = total_bytes // (L * 5)
    nblk = [2, 1, 3, 3, 1]   # phases each input advances through
    # rows must be a sublane multiple per block
    shapes = [((per // H) // (8 * nb) * (8 * nb), H) for nb in nblk]
    arrs = [jnp.zeros((L, s[0], H), jnp.int8) for s in shapes]

    def kernel(*refs):
        o_ref = refs[5]
        acc = refs[6]
        p = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (p == 0))
        def _():
            acc[:] = jnp.zeros_like(acc)
        for r in refs[:5]:
            acc[:] += jnp.sum(r[0, :8, :].astype(jnp.float32), axis=0,
                              keepdims=True)

        @pl.when((pl.program_id(0) == L - 1) & (p == P - 1))
        def _():
            o_ref[:] = acc[:]

    specs = []
    off = 0
    for i, s in enumerate(shapes):
        nb = nblk[i]
        blk = s[0] // nb
        lo, hi = off, off + nb
        off = hi

        def im(l, p, lo=lo, hi=hi, nb=nb):
            return (l, jnp.clip(p - lo, 0, nb - 1), 0)
        specs.append(pl.BlockSpec((1, blk, H), im, memory_space=pltpu.VMEM))

    f = pl.pallas_call(
        kernel,
        grid=(L, P),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, H), lambda l, p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
    )
    g = jax.jit(lambda *a: f(*a))
    np.asarray(g(*arrs))
    t0 = time.perf_counter()
    np.asarray(g(*arrs))
    dt = time.perf_counter() - t0
    real = sum(a.nbytes for a in arrs)
    return real / dt / 1e9


if __name__ == "__main__":
    tb = 28 * 10 * H * 9984   # ~2.8 GB
    tb = (tb // (L * P * H)) * L * P * H
    print(f"single-input: {run_single(tb):.0f} GB/s", flush=True)
    print(f"multi-input (megastep-like): {run_multi(tb):.0f} GB/s",
          flush=True)
