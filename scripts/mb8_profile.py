"""8B-shape megastep decomposition (VERDICT r2 #3): kernel-only ms/step vs
the greedy_decode engine step, plus grid geometry. Run on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ganq_tpu.models import synthetic
from ganq_tpu.serve import stacked


def main():
    cfg = synthetic.llama_config(hidden=4096, inter=14336, layers=32,
                                 heads=32, kv_heads=8, vocab=32768,
                                 max_pos=2048)
    B, T = 8, 256
    sp = synthetic.make_stacked_model(cfg, kind="uniform", seed=0,
                                      lm_head_kind="w8", bits=4)
    sp = stacked.prepack(cfg, sp, "pallas_a8", B)
    variant = stacked.mega_enabled(cfg, sp, "pallas_a8", B)
    print("variant:", variant)
    mp = sp["megapack_lb" if variant in ("w4p", "w3", "w2") else "megapack4"]
    L = cfg.num_hidden_layers
    Hkv = cfg.num_key_value_heads
    d = cfg.head_dim
    ck = jnp.zeros((L, B * Hkv, T, d), jnp.bfloat16)
    cv = jnp.zeros((L, B * Hkv, T, d), jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, cfg.hidden_size)) * 0.3, jnp.bfloat16)
    from ganq_tpu.ops.megastep_lowbit import mega_lm_operands, megastep_lowbit_decode
    lm = mega_lm_operands(cfg, sp)
    half = jnp.ones((d // 2,), jnp.float32)
    kw = dict(q_dim=cfg.q_dim, kv_dim=Hkv * d, head_dim=d, rotary_dim=d,
              scale=0.088, bits=4)

    # kernel-only: chain steps back-to-back (x fed forward, fixed pos).
    # mp/lm/half are ARGUMENTS, never closure captures — a captured 3.5 GB
    # pytree bakes into the HLO as constants and kills the compile relay
    # (the round-2 verify-skill gotcha; this script's round-3 version had
    # exactly that bug, which is why the 8B decomposition never landed).
    @jax.jit
    def chain(x, ck, cv, mp, lm, half, n=8):
        def body(c, _):
            x, ck, cv = c
            out = megastep_lowbit_decode(x, mp, ck, cv, jnp.int32(128),
                                         half, half, lm=lm, **kw)
            y = out[0]
            return (y.astype(x.dtype), ck, cv), out[3][:, 0]
        c, lg = jax.lax.scan(body, (x, ck, cv), None, length=n)
        return lg

    np.asarray(chain(x, ck, cv, mp, lm, half))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(chain(x, ck, cv, mp, lm, half))
        best = min(best, time.perf_counter() - t0)
    print(f"kernel-only (with lm fold): {best / 8 * 1e3:.2f} ms/step",
          flush=True)

    # kernel without the lm fold
    @jax.jit
    def chain_nolm(x, ck, cv, mp, half, n=8):
        def body(c, _):
            x, ck, cv = c
            out = megastep_lowbit_decode(x, mp, ck, cv, jnp.int32(128),
                                         half, half, **kw)
            return (out[0].astype(x.dtype), ck, cv), out[0][:, 0]
        c, lg = jax.lax.scan(body, (x, ck, cv), None, length=n)
        return lg

    np.asarray(chain_nolm(x, ck, cv, mp, half))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(chain_nolm(x, ck, cv, mp, half))
        best = min(best, time.perf_counter() - t0)
    print(f"kernel-only (no lm fold):  {best / 8 * 1e3:.2f} ms/step",
          flush=True)

    # f8 KV cache storage A/B: halves the 268 MB/step cache stream; the
    # kernel reads cast to bf16 exactly as for a bf16 cache
    ck8 = ck.astype(jnp.float8_e4m3fn)
    cv8 = cv.astype(jnp.float8_e4m3fn)
    np.asarray(chain(x, ck8, cv8, mp, lm, half))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(chain(x, ck8, cv8, mp, lm, half))
        best = min(best, time.perf_counter() - t0)
    print(f"kernel-only (f8 kv):       {best / 8 * 1e3:.2f} ms/step",
          flush=True)

    # qkv phase granularity: ptq=1 (6 MB cap) vs the default ptq=2
    @jax.jit
    def chain_p1(x, ck, cv, mp, lm, half, n=8):
        def body(c, _):
            x, ck, cv = c
            out = megastep_lowbit_decode(x, mp, ck, cv, jnp.int32(128),
                                         half, half, lm=lm, qkv_cap_mb=6,
                                         **kw)
            return (out[0].astype(x.dtype), ck, cv), out[3][:, 0]
        c, lg = jax.lax.scan(body, (x, ck, cv), None, length=n)
        return lg

    np.asarray(chain_p1(x, ck, cv, mp, lm, half))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(chain_p1(x, ck, cv, mp, lm, half))
        best = min(best, time.perf_counter() - t0)
    print(f"kernel-only (ptq=1):       {best / 8 * 1e3:.2f} ms/step",
          flush=True)

    # phase-ablation decomposition: "dma" = grid DMA envelope (all phase
    # bodies empty, BlockSpec fetches unchanged); others subtract one
    # phase family's compute
    import functools as _ft

    for mode in ("dma", "noflash", "nomlp", "noqkv"):
        @_ft.partial(jax.jit, static_argnames=("mode",))
        def chain_ab(x, ck, cv, mp, lm, half, mode, n=8):
            def body(c, _):
                x, ck, cv = c
                out = megastep_lowbit_decode(x, mp, ck, cv, jnp.int32(128),
                                             half, half, lm=lm,
                                             ablate=mode, **kw)
                return (out[0].astype(x.dtype), ck, cv), out[3][:, 0]
            c, lg = jax.lax.scan(body, (x, ck, cv), None, length=n)
            return lg

        np.asarray(chain_ab(x, ck, cv, mp, lm, half, mode))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(chain_ab(x, ck, cv, mp, lm, half, mode))
            best = min(best, time.perf_counter() - t0)
        print(f"kernel ablate={mode:8s}: {best / 8 * 1e3:.2f} ms/step",
              flush=True)

    # full engine step: slope between two step counts (min-of-N each —
    # the old interleaved differencing went negative under prefill
    # variance)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, 64)), jnp.int32)

    def run(steps):
        ck2, cv2 = stacked.init_cache(cfg, L, B, T)
        return stacked.greedy_decode(cfg, sp, ck2, cv2, ids, steps,
                                     "pallas_a8")

    times = {}
    for steps in (8, 136):
        np.asarray(run(steps))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(steps))
            best = min(best, time.perf_counter() - t0)
        times[steps] = best
    marg = (times[136] - times[8]) / 128
    print(f"engine marginal:           {marg * 1e3:.2f} ms/step "
          f"(t8={times[8]:.2f}s t136={times[136]:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
