"""Prefill-path profile (VERDICT r4 #4).

(1) Medium prompt buckets (128-1023 token-rows, the continuous-batching
    regime): decode-shaped fused kernels vs the dequant-once MXU GEMM —
    decides the GEMM-switch threshold (ops/qlinear._PREFILL_GEMM_ROWS).
(2) The b8 x 2048 flagship prefill: where does the 0.85x gap vs bf16
    come from — one-layer GEMM A/Bs of bf16 vs dequant+GEMM for each
    projection shape.

Run on the real chip: PYTHONPATH=/root/repo python scripts/prefill_profile.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from ganq_tpu.models import synthetic
from ganq_tpu.ops import qlinear
from ganq_tpu.serve import stacked


def bench_prefill(cfg, kind, backend, batch, seq, reps=4, bits=4):
    sp = synthetic.make_stacked_model(
        cfg, kind=kind, seed=0,
        lm_head_kind=None if kind == "dense" else "w8", bits=bits)
    sp = stacked.prepack(cfg, sp, backend, batch)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(batch, seq)),
                      jnp.int32)

    def run():
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, batch, seq)
        return stacked.prefill(cfg, sp, ck, cv, ids, backend)[0]

    np.asarray(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    del sp
    jax.clear_caches()
    import gc
    gc.collect()
    return batch * seq / best


def medium_buckets():
    cfg = synthetic.llama_config(hidden=3072, inter=8192, layers=28,
                                 heads=24, kv_heads=8, vocab=32768,
                                 max_pos=2048)
    for seq in (128, 256, 512, 1024):
        res = {}
        for thresh, label in ((1 << 30, "decode-kernels"), (128, "gemm")):
            qlinear._PREFILL_GEMM_ROWS = thresh
            res[label] = bench_prefill(cfg, "uniform", "pallas_a8", 1, seq)
        qlinear._PREFILL_GEMM_ROWS = 256
        bf = bench_prefill(cfg, "dense", "reference", 1, seq)
        dk, gm = res["decode-kernels"], res["gemm"]
        print(f"b1 seq={seq:5d}: decode-kernels {dk:8.1f} | gemm "
              f"{gm:8.1f} | bf16 {bf:8.1f} tok/s "
              f"(gemm/bf16 {gm / bf:.3f})", flush=True)


def layer_gemm_ab():
    """Single-matmul A/B at the b8x2048 prefill shape (16384 rows):
    bf16 GEMM vs dequant-once GEMM per projection shape of the 3B model."""
    rng = np.random.default_rng(0)
    rows, H = 16384, 3072
    for name, N in (("qkv", 5120), ("o", 3072), ("gateup", 16384),
                    ("down", 3072)):
        K = H if name != "down" else 8192
        x = jnp.asarray(rng.normal(size=(rows, K)).astype(np.float32) * .1,
                        jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * .02,
                         jnp.bfloat16)
        qidx = jnp.asarray(rng.integers(0, 16, size=(N, K)), jnp.int32)
        scales = jnp.asarray(
            rng.uniform(0.001, 0.004, size=(N, K // 128)).astype(np.float32))
        from ganq_tpu.ops.packing import pack_int_rows
        qw = pack_int_rows(qidx, 4)

        @jax.jit
        def f_bf16(x, wb):
            return jnp.dot(x, wb.T)

        @jax.jit
        def f_deq(x, qw, scales):
            q = qlinear.QLinear("uniform", {"qweight": qw,
                                            "scales": scales}, 4, K)
            w = qlinear.dequantize_weight(q).astype(jnp.bfloat16)
            return jnp.dot(x, w.T)

        def t(f, *a):
            np.asarray(f(*a))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(f(*a))
                best = min(best, time.perf_counter() - t0)
            return best * 1e3

        tb = t(f_bf16, x, wb)
        td = t(f_deq, x, qw, scales)
        print(f"{name:7s} [{rows}x{K}]x[{K}x{N}]: bf16 {tb:7.2f} ms | "
              f"dequant+gemm {td:7.2f} ms ({td / tb:.3f}x)", flush=True)


if __name__ == "__main__":
    layer_gemm_ab()
    medium_buckets()
