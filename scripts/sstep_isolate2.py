"""Isolate the in-kernel cost structure of the GANQ S-step Pallas kernel:
(a) the per-column 16-way codeword search walk alone, (b) + the committed
[blk, n] x [n, TM] residual matmuls, (c) matmuls alone. All in ONE pallas
call per variant (grid over m-tiles), so per-call dispatch cancels. The
matmul operand shapes match the real kernel; values are dummies.

Usage: python scripts/sstep_isolate2.py [m] [n] [TM]
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

m = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
TM = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def timeit(f, *args, reps=3):
    np.asarray(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _kernel(wt_ref, lt_ref, tt_ref, out_ref, *, n, do_search, do_matmul,
            blk, prec):
    T = tt_ref[:]
    out_ref[:] = jnp.zeros_like(out_ref)
    tm = wt_ref.shape[1]

    def outer(bo, carry):
        base = (n // blk - 1 - bo) * blk
        r = carry
        if do_matmul:
            r = jax.lax.dot_general(
                lt_ref[:], wt_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec)                     # [blk, n] x [n, TM]
        if do_search:
            for t in range(blk - 1, -1, -1):
                row = wt_ref[pl.ds(base + t, 1), :]
                eff = row + r[t % r.shape[0]:t % r.shape[0] + 1, :]
                dmin = jnp.abs(eff - T[0:1, :])
                code = jnp.zeros((1, tm), jnp.float32)
                for s in range(1, 16):
                    d = jnp.abs(eff - T[s:s + 1, :])
                    better = (d < dmin).astype(jnp.float32)
                    dmin = jnp.minimum(d, dmin)
                    code = better * s + (1 - better) * code
                out_ref[pl.ds(base + t, 1), :] = code
        return r

    init = jnp.zeros((blk, tm), jnp.float32)
    jax.lax.fori_loop(0, n // blk, outer, init)


def run(do_search, do_matmul, blk=8, prec=jax.lax.Precision.HIGHEST):
    wt = jnp.asarray(np.random.default_rng(0).normal(size=(n, TM)), jnp.float32)
    lt = jnp.asarray(np.random.default_rng(2).normal(size=(blk, n)), jnp.float32)
    tt = jnp.sort(jnp.asarray(np.random.default_rng(1).normal(size=(16, TM)),
                              jnp.float32), axis=0)
    kern = functools.partial(_kernel, n=n, do_search=do_search,
                             do_matmul=do_matmul, blk=blk, prec=prec)
    f = pl.pallas_call(
        kern,
        grid=(m // TM,),
        in_specs=[pl.BlockSpec((n, TM), lambda i: (0, 0)),
                  pl.BlockSpec((blk, n), lambda i: (0, 0)),
                  pl.BlockSpec((16, TM), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((n, TM), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, TM), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return timeit(jax.jit(lambda a, b, c: f(a, b, c)), wt, lt, tt)


print(f"m={m} n={n} TM={TM} grid={m//TM} programs, {n} cols each")
print(f"search only  blk=8   : {run(True, False)*1e3:8.1f} ms")
print(f"search+mm    blk=8   : {run(True, True)*1e3:8.1f} ms")
print(f"mm only      blk=8   : {run(False, True)*1e3:8.1f} ms")
for blk in (32, 128):
    print(f"search+mm    blk={blk:<4}: {run(True, True, blk)*1e3:8.1f} ms")
    print(f"mm only      blk={blk:<4}: {run(False, True, blk)*1e3:8.1f} ms")
print(f"mm only blk=128 f32  : "
      f"{run(False, True, 128, jax.lax.Precision.DEFAULT)*1e3:8.1f} ms")
