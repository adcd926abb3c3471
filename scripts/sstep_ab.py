"""A/B the fused Pallas GANQ S-step vs the XLA scan on the real chip
(VERDICT r1 #4: demonstrate >=2x on a 2048^2 module or demote
solver_backend=auto). Prints min-of-5 times for both at 2048^2 and
4096x4096-ish llama shapes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ganq_tpu.ops.ganq_solver import s_step_fits, s_step_pallas
from ganq_tpu.quant.ganq import s_step


def bench(m, n, reps=5):
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    A = rng.normal(size=(n, n)).astype(np.float32)
    H = A @ A.T + n * np.eye(n, dtype=np.float32)
    L = jnp.asarray(np.linalg.cholesky(H))
    T = jnp.sort(jnp.asarray(rng.normal(size=(m, 16)).astype(np.float32)),
                 axis=1)

    out = {}
    for name, fn in (("xla_scan", s_step), ("pallas", s_step_pallas)):
        if name == "pallas" and not s_step_fits(m, n):
            out[name] = float("nan")
            continue
        f = jax.jit(fn)
        r = f(W, L, T)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f(W, L, T)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        out[name] = best
        # exact-index parity between the two implementations
        if name == "pallas":
            q_ref, _ = jax.jit(s_step)(W, L, T)
            assert bool(jnp.all(r[0] == q_ref)), "index mismatch!"
    return out


if __name__ == "__main__":
    for m, n in ((2048, 2048), (4096, 1024)):
        r = bench(m, n)
        ratio = (r["xla_scan"] / r["pallas"]
                 if r["pallas"] == r["pallas"] else float("nan"))
        print(f"{m}x{n}: xla_scan {r['xla_scan']*1e3:.0f} ms, "
              f"pallas {r['pallas']*1e3:.0f} ms, speedup {ratio:.2f}x",
              flush=True)
