"""Multi-chip scaling-efficiency harness (BASELINE §6: >=80% at 2+ hosts).

Measures decode tokens/s of a tensor+data-sharded quantized model across mesh
sizes and reports efficiency vs linear scaling. On a real pod, run under
`ganq_tpu.parallel.distributed.initialize()`; here it also runs on the
virtual CPU mesh (set GANQ_TPU_FORCE_CPU_DEVICES=8) to validate the harness
itself — CPU numbers are not performance-meaningful.

  python examples/scaling_efficiency.py --meshes 1,2,4,8
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default="1,2,4,8")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    n_force = os.environ.get("GANQ_TPU_FORCE_CPU_DEVICES")
    import jax
    if n_force:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(n_force))
    import jax.numpy as jnp

    from ganq_tpu.models import synthetic
    from ganq_tpu.parallel import sharding
    from ganq_tpu.serve import stacked

    cfg = synthetic.llama_config(hidden=args.hidden, inter=args.hidden * 4,
                                 layers=args.layers, heads=8, kv_heads=8,
                                 vocab=4096, max_pos=256)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 4096, size=(args.batch, 32)), jnp.int32)
    backend = "pallas" if jax.default_backend() != "cpu" else "reference"

    results = {}
    for n in (int(x) for x in args.meshes.split(",")):
        if n > jax.device_count():
            print(f"mesh {n}: skipped ({jax.device_count()} devices)")
            continue
        params = synthetic.make_model(cfg, kind="lut", seed=0)
        mesh = sharding.make_mesh(data=1, model=n,
                                  devices=jax.devices()[:n])
        sparams = sharding.shard_params(cfg, params, mesh)
        with jax.set_mesh(mesh):
            sp = stacked.stack_layers(sparams, fuse=False)
            ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers,
                                        args.batch, 128)
            np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids,
                                             args.steps, backend))  # warm
            ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers,
                                        args.batch, 128)
            t0 = time.perf_counter()
            np.asarray(stacked.greedy_decode(cfg, sp, ck, cv, ids,
                                             args.steps, backend))
            dt = time.perf_counter() - t0
        tps = args.batch * args.steps / dt
        results[n] = tps
        base = results[min(results)]
        base_n = min(results)
        eff = (tps / base) / (n / base_n)
        print(f"mesh model={n}: {tps:9.1f} tok/s  scaling-eff vs {base_n}-chip:"
              f" {eff:5.1%}")


if __name__ == "__main__":
    main()
