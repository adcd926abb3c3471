"""Isolate the GANQ Pallas S-step cost: stripped kernel variants.

Variants (same grid/layout as ops/ganq_solver._sstep_kernel):
  full        : the real kernel
  no_dot      : residual Rblk dot removed (r = 0) — select chain + band only
  no_select   : 16-way select chain replaced by a copy — dot + band only
  no_band     : band corrections removed — dot + select only
  dot_only    : only the Rblk dots
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(variant: str, n: int, blk: int):
    def kern(wt_ref, tt_ref, diag_ref, bandpad_ref, ltpad_hbm,
             qt_ref, werrt_ref, lbuf, sem):
        tm = wt_ref.shape[1]
        qt_ref[:] = jnp.zeros_like(qt_ref)
        werrt_ref[:] = jnp.zeros_like(werrt_ref)
        T = tt_ref[:]

        def outer(bo, r):
            bi = (n // blk) - 1 - bo
            base = bi * blk
            dma = pltpu.make_async_copy(
                ltpad_hbm.at[pl.ds(base, blk + 8), :], lbuf, sem)
            dma.start()
            wblk = wt_ref[pl.ds(base, blk), :]
            dblk = diag_ref[pl.ds(base, blk), :]
            bandblk = bandpad_ref[pl.ds(base, blk + 8), :]
            werr_rows = [None] * blk
            code_rows = [None] * blk
            dma.wait()
            if variant == "no_dot":
                Rblk = jnp.zeros((blk, tm), jnp.float32)
            else:
                Rblk = jax.lax.dot_general(
                    lbuf[7:7 + blk, :], werrt_ref[:],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            for t in range(blk - 1, -1, -1):
                eff = wblk[t:t + 1, :] + r / dblk[t:t + 1, :]
                if variant in ("no_select", "dot_only"):
                    val = eff
                    code = jnp.zeros((1, tm), jnp.float32)
                else:
                    dmin = jnp.abs(eff - T[0:1, :])
                    val = T[0:1, :]
                    code = jnp.zeros((1, tm), jnp.float32)
                    for s in range(1, 16):
                        d = jnp.abs(eff - T[s:s + 1, :])
                        better = (d < dmin).astype(jnp.float32)
                        dmin = dmin + better * (d - dmin)
                        val = val + better * (T[s:s + 1, :] - val)
                        code = code + better * (s - code)
                werr_rows[t] = wblk[t:t + 1, :] - val
                code_rows[t] = code
                r = Rblk[t:t + 1, :]
                if variant not in ("no_band", "dot_only"):
                    for tp in range(t, blk):
                        coef = bandblk[t + 7, tp - t + 1]
                        r = r + coef * werr_rows[tp]
            werrt_ref[pl.ds(base, blk), :] = jnp.concatenate(werr_rows, axis=0)
            qt_ref[pl.ds(base, blk), :] = jnp.concatenate(
                code_rows, axis=0).astype(jnp.int32)
            return r

        jax.lax.fori_loop(0, n // blk, outer,
                          jnp.zeros((1, wt_ref.shape[1]), jnp.float32))

    return kern


@functools.partial(jax.jit, static_argnames=("variant", "tm", "blk"))
def run(W, L, T, variant="full", tm=256, blk=8):
    m, n = W.shape
    Lf = L.astype(jnp.float32)
    LTpad = jnp.concatenate([jnp.zeros((8, n), jnp.float32), Lf.T], axis=0)
    diag = jnp.diagonal(Lf).reshape(n, 1)
    bw = blk + 8
    band = jnp.stack(
        [jnp.pad(jnp.diagonal(Lf, offset=-o), (0, o)) for o in range(bw)],
        axis=1)
    bandpad = jnp.concatenate([jnp.zeros((8, bw), jnp.float32), band], axis=0)
    qt, werrt = pl.pallas_call(
        make_kernel(variant, n, blk),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n + 8, bw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), jnp.int32),
            jax.ShapeDtypeStruct((n, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk + 8, n), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(W.T.astype(jnp.float32), T.T.astype(jnp.float32), diag, bandpad, LTpad)
    return qt, werrt


def timeit(f, *a, reps=3, **kw):
    np.asarray(f(*a, **kw)[1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*a, **kw)[1])
        best = min(best, time.perf_counter() - t0)
    return best


m = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
rng = np.random.default_rng(0)
W = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
A = rng.normal(size=(n, n)).astype(np.float32)
H = A @ A.T / n + np.eye(n, dtype=np.float32)
L = jnp.asarray(np.linalg.cholesky(H))
T = jnp.sort(jnp.asarray(rng.normal(size=(m, 16)), jnp.float32), axis=1)

for variant in ("full", "no_dot", "no_select", "no_band", "dot_only"):
    for tm in (256, 512):
        if m % tm:
            continue
        try:
            t = timeit(run, W, L, T, variant=variant, tm=tm)
            print(f"{variant:10s} tm={tm}: {t*1e3:8.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{variant:10s} tm={tm}: FAILED {str(e)[:120]}")
