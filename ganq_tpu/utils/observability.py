"""Observability: profiler traces, quantization stat tables, memory estimates.

Parity with the reference's aux tooling (SURVEY.md §5.1/§5.5): per-module
stat rows (``loop_processor.py:133-156``), ClearML/plotly charts (replaced by
jax.profiler + plain text), and the vram estimator (``utils/vram.py``).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, List, Optional

import jax

from .logger import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/ganq_tpu_trace"):
    """jax.profiler trace context — open the result in XProf/Perfetto.
    The TPU analog of the reference's Metal gputrace capture
    (tests/test_ganq_solve_s_kernel.py:53-59) / ClearML hooks."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {log_dir}")


def quant_log_table(entries: List[Any]) -> str:
    """Aligned stat table of ModuleQuantLog rows (the reference's per-module
    table, loop_processor.py:133-156)."""
    header = f"{'layer':>5}  {'module':<32} {'method':<6} {'loss':>12} " \
             f"{'damp':>7} {'time':>7}"
    rows = [header, "-" * len(header)]
    for e in entries:
        rows.append(f"{e.layer:>5}  {e.module:<32} {e.method:<6} "
                    f"{e.loss:>12.5f} {e.damp:>7.4f} {e.duration:>6.1f}s")
    return "\n".join(rows)


def estimate_model_bytes(params: Dict[str, Any]) -> int:
    """Total parameter bytes (the vram estimator, utils/vram.py analog)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += getattr(leaf, "nbytes",
                         getattr(leaf, "size", 0) * 4)
    return total


def estimate_serving_bytes(cfg, batch: int, max_seq: int,
                           params: Dict[str, Any],
                           kv_dtype_bytes: int = 2) -> Dict[str, int]:
    """Weights + KV cache + activation headroom for a serving config.

    Honors per-layer KV head counts (decilm variable GQA,
    ``cfg.layer_kv_heads``) and MLA cache widths (k at nope+rope, v at
    v_head_dim) — the models where the estimate actually matters."""
    weights = estimate_model_bytes(params)
    kv = 0
    for li in range(cfg.num_hidden_layers):
        heads = cfg.layer_kv_heads(li)
        kv += (batch * max_seq * heads *
               (cfg.k_cache_dim + cfg.v_cache_dim) * kv_dtype_bytes)
    act = batch * max_seq * cfg.hidden_size * 4 * 4  # rough headroom
    return {"weights": weights, "kv_cache": kv, "activations": act,
            "total": weights + kv + act}


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Live HBM stats when the backend exposes them."""
    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        return {"bytes_in_use": stats.get("bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0)}
    except Exception:
        return None


__all__ = ["profile_trace", "quant_log_table", "estimate_model_bytes",
           "estimate_serving_bytes", "device_memory_stats"]
