"""MoE decode A/B (VERDICT r4 #5): fused slot-steered expert kernel
(ops/moe_expert.py) vs the per-layer fallback, mixtral-shaped synthetic
model scaled to fit one chip (H=4096, I=14336 per expert, E=8 top-2,
L=4 — W4 expert weights ~2.8 GB).

Run on the real chip: PYTHONPATH=/root/repo python scripts/moe_bench.py
"""

import gc
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from ganq_tpu.models.transformer import ModelConfig
from ganq_tpu.ops import qlinear
from ganq_tpu.ops.packing import pack_int_rows
from ganq_tpu.serve import engine

E, H, I, L, K_TOP = 8, 4096, 14336, 4, 2
B, PROMPT, STEPS, MAX_SEQ = 8, 16, 32, 128
BITS = 4


def _uniform_lin(key, out_f, in_f):
    k1, k2 = jax.random.split(key)
    qidx = jax.random.randint(k1, (out_f, in_f), 0, 2 ** BITS, jnp.int32)
    scales = jax.random.uniform(k2, (out_f, in_f // 128), jnp.float32,
                                0.001, 0.004)
    return qlinear.QLinear(
        "uniform", {"qweight": pack_int_rows(qidx, BITS),
                    "scales": scales}, BITS, in_f)


def _w8_lin(key, out_f, in_f):
    k1, k2 = jax.random.split(key)
    w8 = jax.random.randint(k1, (out_f, in_f), -127, 128, jnp.int8)
    scale = jax.random.uniform(k2, (out_f, 1), jnp.float32, 0.001, 0.004)
    return qlinear.QLinear("w8", {"w8": w8, "scale": scale}, 8, in_f)


def build_model(seed=0):
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=32768, hidden_size=H,
        intermediate_size=I, num_hidden_layers=L, num_attention_heads=32,
        num_key_value_heads=8, head_dim=128, num_experts=E,
        num_experts_per_tok=K_TOP, max_position_embeddings=MAX_SEQ * 2)
    key = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(key, 8 + L * 32))
    layers = []
    for _ in range(L):
        experts = [{"gate": _uniform_lin(next(ks), I, H),
                    "up": _uniform_lin(next(ks), I, H),
                    "down": _uniform_lin(next(ks), H, I)}
                   for _ in range(E)]
        layers.append({
            "input_norm": {"weight": jnp.ones((H,), jnp.bfloat16)},
            "post_norm": {"weight": jnp.ones((H,), jnp.bfloat16)},
            "attn": {"q": _w8_lin(next(ks), 4096, H),
                     "k": _w8_lin(next(ks), 1024, H),
                     "v": _w8_lin(next(ks), 1024, H),
                     "o": _w8_lin(next(ks), H, 4096)},
            "moe": {"router": qlinear.dense_linear(
                jax.random.normal(next(ks), (E, H), jnp.bfloat16) * 0.02),
                "experts": experts},
        })
    params = {
        "embed_tokens": {"weight": jax.random.normal(
            next(ks), (32768, H), jnp.bfloat16) * 0.02},
        "final_norm": {"weight": jnp.ones((H,), jnp.bfloat16)},
        "lm_head": _w8_lin(next(ks), 32768, H),
        "layers": layers,
    }
    return cfg, params


def measure(cfg, params, label, reps=4):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, PROMPT)),
                      jnp.int32)

    key = jax.random.PRNGKey(0)

    def run():
        cache = engine.init_cache(cfg, B, MAX_SEQ)
        return engine.generate_tokens(cfg, params, cache, ids, key, STEPS,
                                      temperature=0.0, backend="pallas_a8")

    np.asarray(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    tps = B * STEPS / best
    # stderr: bench.py imports this and must keep stdout to ONE JSON line
    print(f"{label}: {tps:.1f} tok/s ({best / STEPS * 1e3:.2f} ms/step)",
          file=sys.stderr, flush=True)
    return tps


def main():
    from ganq_tpu.ops.moe_expert import moe_mega_fusable, moe_megapack

    cfg, params = build_model()
    tps_base = measure(cfg, params, "per-layer MoE fallback")
    for lp in params["layers"]:
        moe = lp["moe"]
        assert moe_mega_fusable(cfg, moe, BITS)
        moe["mega"] = dict(jax.jit(
            lambda m: moe_megapack(cfg, m, BITS))(moe))
    tps_fused = measure(cfg, params, "fused slot-steered MoE kernel")
    print(f"fused / per-layer: {tps_fused / tps_base:.3f}x "
          f"(VERDICT r4 #5 bar: >= 1.5x)", flush=True)


if __name__ == "__main__":
    main()
