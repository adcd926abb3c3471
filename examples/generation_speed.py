"""Decode-throughput comparison across serving backends (reference
examples/benchmark/generation_speed.py) on synthetic weights at a chosen
architecture shape — runs fully offline."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--inter", type=int, default=8192)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    cfg = synthetic.llama_config(hidden=args.hidden, inter=args.inter,
                                 layers=args.layers, heads=16, kv_heads=8,
                                 vocab=32768, max_pos=1024)
    on_tpu = jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 32768, size=(args.batch, 64)), jnp.int32)

    for kind, backend in (("dense", "reference"),
                          ("w8", "pallas_a8" if on_tpu else "reference"),
                          ("lut", "pallas" if on_tpu else "reference")):
        sp = synthetic.make_stacked_model(cfg, kind=kind, seed=0)
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, args.batch, 256)
        out = stacked.greedy_decode(cfg, sp, ck, cv, ids, args.steps, backend)
        jax.block_until_ready(out)
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, args.batch, 256)
        t0 = time.perf_counter()
        out = stacked.greedy_decode(cfg, sp, ck, cv, ids, args.steps, backend)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{kind:6s}/{backend:10s}: {args.batch * args.steps / dt:8.1f} tok/s")
        del sp


if __name__ == "__main__":
    main()
