"""Observability + distributed helper smoke tests."""

import numpy as np

from ganq_tpu.models import synthetic
from ganq_tpu.parallel import distributed
from ganq_tpu.utils.observability import (estimate_model_bytes,
                                          estimate_serving_bytes,
                                          quant_log_table)


def test_estimates():
    cfg = synthetic.llama_config(hidden=64, inter=128, layers=2, heads=4,
                                 kv_heads=2, vocab=256, max_pos=64)
    dense = synthetic.make_model(cfg, kind="dense", seed=0)
    lut = synthetic.make_model(cfg, kind="lut", seed=0)
    bd = estimate_model_bytes(dense)
    bl = estimate_model_bytes(lut)
    assert bl < bd  # packed is smaller
    est = estimate_serving_bytes(cfg, batch=2, max_seq=64, params=lut)
    assert est["total"] == est["weights"] + est["kv_cache"] + est["activations"]
    assert est["kv_cache"] == 2 * 2 * 2 * 64 * 2 * 16 * 2


def test_quant_log_table():
    from ganq_tpu.quant.looper import ModuleQuantLog
    rows = [ModuleQuantLog(0, "self_attn.q_proj", "ganq", 0.123, 0.01, 1.5)]
    table = quant_log_table(rows)
    assert "self_attn.q_proj" in table and "0.12300" in table


def test_distributed_single_process():
    distributed.initialize()  # no-op single process
    assert distributed.is_coordinator()
    calls = []
    distributed.coordinator_only(lambda: calls.append(1))()
    assert calls == [1]
    assert distributed.local_batch_slice(8) == slice(0, 8)
