"""Microbench 2: what limits sequential-grid stream bandwidth?

Variants over the baseline (int8 dot, one input, arbitrary semantics):
parallel semantics, no-compute (reduce-only), two concurrent input streams,
bf16 data, deeper x-partitioning of one matmul (the megakernel shape).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOTAL_GB = 6


def timeit(fn, reps=5):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, t, gb):
    print(f"{name:42s} {t*1e3:8.2f} ms  {gb/t:7.1f} GB/s", flush=True)


@functools.partial(jax.jit, static_argnames=("nt", "kt", "ntile", "reps",
                                             "sem", "mode"))
def stream(w, x8, *, nt, kt, ntile, reps, sem="arbitrary", mode="dot"):
    def kernel(w_ref, x_ref, o_ref, acc_s):
        t = pl.program_id(1)
        r = pl.program_id(0)

        @pl.when((t == 0) & (r == 0))
        def _():
            acc_s[:] = jnp.zeros_like(acc_s)

        if mode == "dot":
            acc_s[:] += jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        elif mode == "reduce":
            acc_s[:] += jnp.sum(w_ref[:].astype(jnp.int32), axis=0,
                                keepdims=True)[:8, :]
        elif mode == "none":
            @pl.when((t == 0) & (r == 0))
            def _():
                acc_s[:] += w_ref[:8, :].astype(jnp.int32)

        @pl.when((t == nt - 1) & (r == reps - 1))
        def _():
            o_ref[:] = acc_s[:]

    return pl.pallas_call(
        kernel,
        grid=(reps, nt),
        in_specs=[
            pl.BlockSpec((kt, ntile), lambda r, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kt), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, ntile), lambda r, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, ntile), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, ntile), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(sem, sem),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w.reshape(nt * kt, ntile), x8)


@functools.partial(jax.jit, static_argnames=("nt", "kt", "ntile", "reps"))
def stream2(w1, w2, x8, *, nt, kt, ntile, reps):
    """Two inputs streamed concurrently (two pipeline buffers/DMA queues)."""
    def kernel(w1_ref, w2_ref, x_ref, o_ref, acc_s):
        t = pl.program_id(1)
        r = pl.program_id(0)

        @pl.when((t == 0) & (r == 0))
        def _():
            acc_s[:] = jnp.zeros_like(acc_s)

        acc_s[:] += jax.lax.dot_general(
            x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_s[:] += jax.lax.dot_general(
            x_ref[:], w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

        @pl.when((t == nt - 1) & (r == reps - 1))
        def _():
            o_ref[:] = acc_s[:]

    return pl.pallas_call(
        kernel,
        grid=(reps, nt),
        in_specs=[
            pl.BlockSpec((kt, ntile), lambda r, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, ntile), lambda r, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kt), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, ntile), lambda r, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, ntile), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, ntile), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w1.reshape(nt * kt, ntile), w2.reshape(nt * kt, ntile), x8)


@functools.partial(jax.jit, static_argnames=("nt", "kt", "ntile", "reps"))
def stream_bf16(w, x, *, nt, kt, ntile, reps):
    def kernel(w_ref, x_ref, o_ref, acc_s):
        t = pl.program_id(1)
        r = pl.program_id(0)

        @pl.when((t == 0) & (r == 0))
        def _():
            acc_s[:] = jnp.zeros_like(acc_s)

        acc_s[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when((t == nt - 1) & (r == reps - 1))
        def _():
            o_ref[:] = acc_s[:]

    return pl.pallas_call(
        kernel,
        grid=(reps, nt),
        in_specs=[
            pl.BlockSpec((kt, ntile), lambda r, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kt), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, ntile), lambda r, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, ntile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, ntile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w.reshape(nt * kt, ntile), x)


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    kt, ntile = 2048, 2048
    tile_mb = kt * ntile / 1e6
    nt = 48  # ~200 MB resident
    reps = max(1, int(TOTAL_GB * 1e9 / (nt * kt * ntile)))
    gb = reps * nt * kt * ntile / 1e9

    w = jax.jit(lambda k: jax.random.randint(
        k, (nt, kt, ntile), -127, 127, jnp.int8))(key)
    x8 = jax.jit(lambda k: jax.random.randint(
        k, (8, kt), -127, 127, jnp.int8))(key)
    jax.block_until_ready((w, x8))

    for sem in ("arbitrary", "parallel"):
        for mode in ("dot", "reduce", "none"):
            t = timeit(functools.partial(stream, w, x8, nt=nt, kt=kt,
                                         ntile=ntile, reps=reps, sem=sem,
                                         mode=mode))
            report(f"1-stream {tile_mb:.0f}MB {sem}/{mode}", t, gb)

    w2 = jax.jit(lambda k: jax.random.randint(
        k, (nt, kt, ntile), -127, 127, jnp.int8))(jax.random.PRNGKey(1))
    jax.block_until_ready(w2)
    t = timeit(functools.partial(stream2, w, w2, x8, nt=nt, kt=kt,
                                 ntile=ntile, reps=max(1, reps // 2)))
    report("2-stream dot", t, 2 * max(1, reps // 2) * nt * kt * ntile / 1e9)

    wb = jax.jit(lambda k: jax.random.normal(
        k, (nt, kt, ntile // 2), jnp.bfloat16))(key)
    xb = jax.jit(lambda k: jax.random.normal(k, (8, kt), jnp.bfloat16))(key)
    jax.block_until_ready((wb, xb))
    t = timeit(functools.partial(stream_bf16, wb, xb, nt=nt, kt=kt,
                                 ntile=ntile // 2, reps=reps))
    report("1-stream bf16 dot", t, gb)


if __name__ == "__main__":
    main()
