"""Exact-LUT decode pathology probe (VERDICT r3 #2b, deferred twice).

Known: at the guard shape (4L/h1024, b8) one lut_matmul amortizes to
~0.27 ms, but decode_step through the same weights costs ~130 ms — ~10x
the sum of its kernel parts — and greedy_decode's scan matches (~121
ms/step), so the pathology is NOT the outer scan: it is something about
many DISTINCT lut_matmul custom calls in one program (PERF.md r2
addendum). This probe discriminates the remaining hypotheses:

  (a) per-custom-call fixed cost that the single-kernel chain amortizes
      but distinct calls pay  -> layer-count sweep slope >> kernel time
  (b) operand layout conversions before each custom call
      -> optimized HLO contains copy/transpose ops feeding custom-calls
  (c) something about the fused qkv/gateup widths (different shapes
      than the chain benchmark)  -> single distinct-weight chain A/B

Run on the real chip: PYTHONPATH=/root/repo python scripts/lut_scan_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ganq_tpu.models import synthetic  # noqa: E402
from ganq_tpu.ops.lut_matmul import lut_matmul  # noqa: E402
from ganq_tpu.serve import stacked  # noqa: E402


def bench(fn, *args, reps=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    B, H = 8, 1024

    # (c) chain of DISTINCT lut weights vs ONE weight reused
    x = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    n_mats = 16
    luts = [jnp.sort(jnp.asarray(
        rng.normal(size=(H, 16)).astype(np.float32) * 0.02), axis=1)
        .astype(jnp.bfloat16) for _ in range(n_mats)]
    from ganq_tpu.ops.packing import pack_int_rows
    idxs = [pack_int_rows(jnp.asarray(
        rng.integers(0, 16, size=(H, H)).astype(np.int32)), 4)
        for _ in range(n_mats)]

    @jax.jit
    def chain_same(x):
        for _ in range(n_mats):
            x = lut_matmul(x, luts[0], idxs[0], 4)[:, :H]
        return x

    @jax.jit
    def chain_distinct(x):
        for i in range(n_mats):
            x = lut_matmul(x, luts[i], idxs[i], 4)[:, :H]
        return x

    t_same = bench(chain_same, x)
    t_dist = bench(chain_distinct, x)
    print(f"chain x{n_mats} same-weight:     {t_same*1e3:8.2f} ms "
          f"({t_same/n_mats*1e3:.3f} ms/matmul)", flush=True)
    print(f"chain x{n_mats} distinct-weight: {t_dist*1e3:8.2f} ms "
          f"({t_dist/n_mats*1e3:.3f} ms/matmul)", flush=True)

    # (a) decode_step layer-count sweep
    for L in (1, 2, 4):
        cfg = synthetic.llama_config(hidden=H, inter=2816, layers=L,
                                     heads=8, kv_heads=8, vocab=8192,
                                     max_pos=256)
        sp = synthetic.make_stacked_model(cfg, kind="lut", seed=0,
                                          lm_head_kind="w8")
        ck, cv = stacked.init_cache(cfg, L, B, 128)
        tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B,)),
                          jnp.int32)

        def step(tok, ck, cv):
            return stacked.decode_step(cfg, sp, ck, cv, tok, jnp.int32(32),
                                       "pallas")[0]

        t = bench(step, tok, ck, cv)
        print(f"decode_step L={L}: {t*1e3:8.2f} ms "
              f"({t/L*1e3:.2f} ms/layer)", flush=True)

    # (b) optimized-HLO copy census for the L=2 step
    cfg = synthetic.llama_config(hidden=H, inter=2816, layers=2, heads=8,
                                 kv_heads=8, vocab=8192, max_pos=256)
    sp = synthetic.make_stacked_model(cfg, kind="lut", seed=0,
                                      lm_head_kind="w8")
    ck, cv = stacked.init_cache(cfg, 2, B, 128)
    tok = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B,)), jnp.int32)
    lowered = jax.jit(
        lambda t_, k_, v_: stacked.decode_step(cfg, sp, k_, v_, t_,
                                               jnp.int32(32), "pallas")[0])
    try:
        txt = lowered.lower(tok, ck, cv).compile().as_text()
        lines = txt.splitlines()
        n_cc = sum("custom-call" in ln for ln in lines)
        n_copy = sum(" copy(" in ln for ln in lines)
        n_transpose = sum(" transpose(" in ln for ln in lines)
        n_loop = sum("while(" in ln for ln in lines)
        print(f"HLO: {len(lines)} lines, custom-calls={n_cc}, "
              f"copies={n_copy}, transposes={n_transpose}, "
              f"whiles={n_loop}", flush=True)
        big_copies = [ln.strip()[:140] for ln in lines
                      if " copy(" in ln and ("f32[" in ln or "bf16[" in ln)]
        for ln in big_copies[:12]:
            print("  COPY:", ln, flush=True)
    except Exception as e:
        print("HLO dump failed:", e, flush=True)


if __name__ == "__main__":
    main()
