"""Microbench: sequential-grid weight streaming on the real TPU chip.

Answers the three design questions for the whole-decode-step megakernel
(PERF.md round-2): (1) effective HBM->VMEM stream bandwidth of a Pallas
sequential ("arbitrary") grid as a function of block size, (2) the fixed
per-grid-step cost, (3) how much VMEM a kernel may actually use
(vmem_limit_bytes ceiling).

Run on the chip: python scripts/mb_stream.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit,
                   static_argnames=("nt", "kt", "ntile", "vmem_mb", "reps"))
def stream_dot(w, x8, *, nt, kt, ntile, vmem_mb, reps=1):
    """Sequential grid over reps x nt tiles: acc += x8[:, slice] @ w_tile.
    reps > 1 re-streams the same HBM data to amortize the per-call floor."""

    def kernel(w_ref, x_ref, o_ref, acc_s):
        t = pl.program_id(1)
        r = pl.program_id(0)

        @pl.when((t == 0) & (r == 0))
        def _():
            acc_s[:] = jnp.zeros_like(acc_s)

        acc_s[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
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
            pl.BlockSpec((8, kt), lambda r, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, ntile), lambda r, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, ntile), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, ntile), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(w.reshape(nt * kt, ntile), x8)


@functools.partial(jax.jit, static_argnames=("nsteps",))
def empty_grid(nsteps):
    """Per-grid-step floor: no DMA (all index maps constant), trivial body."""

    def kernel(x_ref, o_ref):
        t = pl.program_id(0)

        @pl.when(t == nsteps - 1)
        def _():
            o_ref[:] = x_ref[:] + 1

    x = jnp.zeros((8, 128), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x)


def timeit(fn, reps=5):
    np.asarray(fn())  # compile + warm, host fetch as barrier
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    total_mb = 192

    # 2) per-step floor
    for nsteps in (4096, 65536, 262144):
        t = timeit(functools.partial(empty_grid, nsteps))
        print(f"empty grid {nsteps:6d} steps: {t*1e3:8.3f} ms "
              f"({t/nsteps*1e6:6.2f} us/step)", flush=True)

    # 1) stream BW vs block size
    key = jax.random.PRNGKey(0)
    for kt, ntile in ((512, 2048), (1024, 2048), (2048, 2048), (3072, 2048),
                      (3072, 4096), (8192, 2048)):
        tile_bytes = kt * ntile
        nt = max(2, (total_mb * 1024 * 1024) // tile_bytes)
        w = jax.jit(lambda k: jax.random.randint(
            k, (nt, kt, ntile), -127, 127, jnp.int8))(key)
        x8 = jax.jit(lambda k: jax.random.randint(
            k, (8, kt), -127, 127, jnp.int8))(key)
        jax.block_until_ready((w, x8))
        reps = max(1, (8 * 1024) // total_mb)  # ~8 GB total traffic
        for vmem_mb in (64, 100):
            try:
                fn = functools.partial(stream_dot, w, x8, nt=nt, kt=kt,
                                       ntile=ntile, vmem_mb=vmem_mb,
                                       reps=reps)
                t = timeit(fn)
                gb = reps * nt * tile_bytes / 1e9
                print(f"tile {kt}x{ntile} ({tile_bytes/1e6:5.1f} MB) x{nt:4d} "
                      f"vmem={vmem_mb}MB: {t*1e3:8.2f} ms  "
                      f"{gb/t:7.1f} GB/s  ({t/nt*1e6:6.2f} us/step)",
                      flush=True)
            except Exception as e:
                print(f"tile {kt}x{ntile} vmem={vmem_mb}MB: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}")
            break  # one vmem setting unless the first fails


if __name__ == "__main__":
    main()
