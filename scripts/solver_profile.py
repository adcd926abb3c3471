"""Round-3 GANQ solver profiling: where do S-step and T-step actually spend
time on the chip? Host-fetch barriers (np.asarray) per PERF.md —
block_until_ready can return early through the tunnel.

Usage: python scripts/solver_profile.py [m] [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ganq_tpu.quant.ganq import s_step, t_step, t_step_affine

m = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
k = 16
rng = np.random.default_rng(0)
W = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
A = rng.normal(size=(n, n)).astype(np.float32)
H = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
L = jnp.linalg.cholesky(H)
T = jnp.sort(jnp.asarray(rng.normal(size=(m, k)), jnp.float32), axis=1)
Q0 = jnp.asarray(rng.integers(0, k, size=(m, n)), jnp.int32)
WH = jnp.dot(W, H)
np.asarray(WH)  # materialize


def timeit(f, *args, reps=3, **kw):
    # ON-DEVICE reduction barrier: fetch a scalar sum, not the outputs.
    # Fetching [m, n] outputs over the tunnel (~40 MB/s) dominated every
    # round-2 solver measurement and mis-ranked the implementations
    # (128 MB of outputs = ~3-4 s of pure transfer billed to the kernel).
    red = jax.jit(lambda *a: [jnp.sum(o.astype(jnp.float32))
                              for o in jax.tree_util.tree_leaves(
                                  f(*a, **kw))])
    [np.asarray(x) for x in red(*args)]        # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        [np.asarray(x) for x in red(*args)]
        best = min(best, time.perf_counter() - t0)
    return best


print(f"shape m={m} n={n}")
print(f"s_step scan           : {timeit(s_step, W, L, T)*1e3:8.1f} ms")
from ganq_tpu.ops.ganq_solver import (s_step_blocked_fits,
                                      s_step_blocked_pallas)
for blk in (32, 64, 128):
    if s_step_blocked_fits(m, n, blk=blk):
        print(f"s_step blkpallas b{blk:<3}: "
              f"{timeit(s_step_blocked_pallas, W, L, T, blk=blk)*1e3:8.1f} ms")
try:
    from ganq_tpu.ops.ganq_solver import s_step_fits, s_step_pallas
    if s_step_fits(m, n):
        print(f"s_step pallas blk8    : {timeit(s_step_pallas, W, L, T)*1e3:8.1f} ms")
        for blk in (32, 128):
            if n % blk == 0:
                print(f"s_step pallas blk{blk:<4}: "
                      f"{timeit(s_step_pallas, W, L, T, blk=blk)*1e3:8.1f} ms")
except Exception as e:  # noqa: BLE001
    print("pallas s_step failed:", e)

print(f"t_step strict         : {timeit(t_step, WH, H, Q0, k, fast='strict')*1e3:8.1f} ms")
print(f"t_step split (default): {timeit(t_step, WH, H, Q0, k, fast=False)*1e3:8.1f} ms")
print(f"t_step bf16           : {timeit(t_step, WH, H, Q0, k, fast='bf16')*1e3:8.1f} ms")
print(f"t_step affine split   : {timeit(t_step_affine, WH, H, Q0, k, fast=False)*1e3:8.1f} ms")


# isolate the eigh vs contraction split inside the free T-step
@jax.jit
def contractions_only(WHx, Hx, Qx):
    from ganq_tpu.quant.ganq import _h_terms, _normal_ops
    Hs, cp = _h_terms(Hx, False)
    pad = (-m) % 256
    Qp = jnp.pad(Qx, ((0, pad), (0, 0)))
    WHp = jnp.pad(WHx, ((0, pad), (0, 0)))

    def go(args):
        return _normal_ops(args[0], args[1], Hs, k, cp)

    return jax.lax.map(go, (Qp.reshape(-1, 256, n), WHp.reshape(-1, 256, n)))


print(f"t_step contractions   : {timeit(contractions_only, WH, H, Q0)*1e3:8.1f} ms")

A16 = jnp.asarray(rng.normal(size=(m, k, k)), jnp.float32)
A16 = A16 @ jnp.swapaxes(A16, 1, 2) + jnp.eye(k)


@jax.jit
def eigh_only(Ax):
    lam, V = jnp.linalg.eigh(Ax)
    return lam.sum() + V.sum()


print(f"batched {m}x16x16 eigh : {timeit(eigh_only, A16)*1e3:8.1f} ms")
