"""Bisect the per-grid-step cost of the blocked S-step kernel: same grid,
BlockSpecs and scratch as ops/ganq_solver.s_step_blocked_pallas, with the
body's pieces toggled. Usage: python scripts/sstep_isolate3.py [m] [n]
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

m = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
blk, TM = 128, 256
nb = n // blk
HIGH = jax.lax.Precision.HIGHEST


def kern(wt_ref, tt_ref, lband_ref, lt_ref, qt_ref, werrt_ref, r_ref,
         acc_ref, *, parts):
    f32 = jnp.float32
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _():
        r_ref[:] = jnp.zeros_like(r_ref)

    base = (nb - 1 - bi) * blk
    if "zero" in parts:
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qt_ref[:] = jnp.zeros_like(qt_ref)
        werrt_ref[:] = jnp.zeros_like(werrt_ref)
    if "walk" in parts:
        for sb in range(blk // 8 - 1, -1, -1):
            for t in range(7, -1, -1):
                j = sb * 8 + t
                r = r_ref[pl.ds(base + j, 1), :] + acc_ref[j:j + 1, :]
                if "corr" in parts:
                    for tp in range(t + 1, 8):
                        r = r + (lband_ref[sb * 8 + tp, j]
                                 * werrt_ref[sb * 8 + tp:sb * 8 + tp + 1, :])
                wrow = wt_ref[j:j + 1, :]
                eff = wrow + r / lband_ref[j, j]
                if "search" in parts:
                    dmin = jnp.abs(eff - tt_ref[0:1, :])
                    val = tt_ref[0:1, :]
                    code = jnp.zeros((1, TM), f32)
                    for s in range(1, 16):
                        d = jnp.abs(eff - tt_ref[s:s + 1, :])
                        better = (d < dmin).astype(f32)
                        dmin = dmin + better * (d - dmin)
                        val = val + better * (tt_ref[s:s + 1, :] - val)
                        code = code + better * (s - code)
                else:
                    val, code = eff, eff
                werrt_ref[j:j + 1, :] = wrow - val
                qt_ref[j:j + 1, :] = code.astype(jnp.int32)
            if "minidot" in parts:
                acc_ref[:] += jax.lax.dot_general(
                    lband_ref[sb * 8:sb * 8 + 8, :],
                    werrt_ref[sb * 8:sb * 8 + 8, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=HIGH)
    if "rupdate" in parts:
        r_ref[:] += jax.lax.dot_general(
            lt_ref[:], werrt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=HIGH)


def run(parts):
    rng = np.random.default_rng(0)
    wt = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
    tt = jnp.asarray(rng.normal(size=(16, m)), jnp.float32)
    Lf = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    f = pl.pallas_call(
        functools.partial(kern, parts=parts),
        grid=(m // TM, nb),
        in_specs=[
            pl.BlockSpec((blk, TM), lambda mi, bi: (nb - 1 - bi, mi)),
            pl.BlockSpec((16, TM), lambda mi, bi: (0, mi)),
            pl.BlockSpec((blk, blk),
                         lambda mi, bi: (nb - 1 - bi, nb - 1 - bi)),
            pl.BlockSpec((n, blk), lambda mi, bi: (0, nb - 1 - bi)),
        ],
        out_specs=[
            pl.BlockSpec((blk, TM), lambda mi, bi: (nb - 1 - bi, mi)),
            pl.BlockSpec((blk, TM), lambda mi, bi: (nb - 1 - bi, mi)),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, m), jnp.int32),
                   jax.ShapeDtypeStruct((n, m), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n, TM), jnp.float32),
                        pltpu.VMEM((blk, TM), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda a, b, c, d: f(a, b, c, d))
    out = g(wt, tt, Lf, Lf.T)
    [np.asarray(x) for x in out]
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(wt, tt, Lf, Lf.T)
        [np.asarray(x) for x in out]
        best = min(best, time.perf_counter() - t0)
    steps = (m // TM) * nb
    print(f"{'+'.join(sorted(parts)) or 'empty':42s}: {best*1e3:8.1f} ms"
          f"  ({best*1e6/steps:6.1f} us/step)", flush=True)


print(f"m={m} n={n} grid=({m//TM},{nb}) = {(m//TM)*nb} steps")
run(set())
run({"zero"})
run({"zero", "rupdate"})
run({"zero", "walk"})
run({"zero", "walk", "search"})
run({"zero", "walk", "search", "corr", "minidot"})
run({"zero", "walk", "search", "corr", "minidot", "rupdate"})
