"""On-chip A/B: W3 plane megastep vs W4 pair megastep vs bf16 at the 3B
shape. Run on the real chip: PYTHONPATH=/root/repo python scripts/w3_bench.py
(one TPU process at a time)."""

import gc
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, kind, backend, batch, prompt_len, steps, max_seq, reps=6,
            bits=4):
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    lm_kind = None if kind == "dense" else "w8"
    sp = synthetic.make_stacked_model(cfg, kind=kind, seed=0,
                                      lm_head_kind=lm_kind, bits=bits)
    sp = stacked.prepack(cfg, sp, backend, batch)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(batch, prompt_len)), jnp.int32)

    def run():
        ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, batch,
                                    max_seq)
        return stacked.greedy_decode(cfg, sp, ck, cv, ids, steps, backend)

    np.asarray(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    del sp
    gc.collect()
    return batch * steps / best


def main():
    from ganq_tpu.models import synthetic

    cfg = synthetic.llama_config(
        hidden=3072, inter=8192, layers=28, heads=24, kv_heads=8,
        vocab=32768, max_pos=2048)
    batch, prompt, steps, max_seq = 8, 64, 64, 256
    out = {}
    which = sys.argv[1:] or ["w3", "w4"]
    for name in which:
        try:
            if name == "w3":
                out["w3"] = measure(cfg, "uniform", "pallas_a8", batch,
                                    prompt, steps, max_seq, bits=3)
            elif name == "w2":
                out["w2"] = measure(cfg, "uniform", "pallas_a8", batch,
                                    prompt, steps, max_seq, bits=2)
            elif name == "w4":
                out["w4"] = measure(cfg, "uniform", "pallas_a8", batch,
                                    prompt, steps, max_seq, bits=4)
            elif name == "bf16":
                out["bf16"] = measure(cfg, "dense", "reference", batch,
                                      prompt, steps, max_seq)
        except Exception as e:
            import traceback
            traceback.print_exc()
            out[name] = f"FAILED: {e}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
