"""On-chip A/B: W4 pair-nibble megastep (ops/megastep4.py) vs the same
artifact through the generalized plane kernel (ops/megastep_lowbit.py,
bits=4 — identical integer algebra, but walks ptq/ptg packed tiles per
sequential grid step), plus the W2 path whose qkv tile grew from 1024 to
2560 with the widened tile candidates. Methodology matches bench.py
(same-process min-of-N, host-fetch barriers)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402
from ganq_tpu.models import synthetic  # noqa: E402


def main():
    assert jax.default_backend() != "cpu", "run on the real chip"
    cfg = synthetic.llama_config(hidden=3072, inter=8192, layers=28,
                                 heads=24, kv_heads=8, vocab=32768,
                                 max_pos=2048)
    b, p, s, m = 8, 64, 64, 256
    runs = [
        ("w4_pair  (megastep4)", "0", 4),
        ("w4_plane (lowbit b4)", "1", 4),
        ("w3_plane", "1", 3),
        ("w2_plane", "1", 2),
    ]
    for name, env, bits in runs:
        os.environ["GANQ_W4_PLANE"] = env
        try:
            tps = bench.measure(cfg, "uniform", "pallas_a8", b, p, s, m,
                                reps=6, bits=bits)
            print(f"{name}: {tps:.1f} tok/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
