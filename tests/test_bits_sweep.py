"""Bit-width and group-size sweeps through the full pipeline (reference
tests/test_bits.py, test_group_size.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.core.config import QuantizeConfig  # noqa: E402
from ganq_tpu.formats import checkpoint  # noqa: E402
from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.models.registry import get_spec  # noqa: E402
from ganq_tpu.quant.looper import quantize_model  # noqa: E402
from tests.test_looper import calib, logits_mse, tiny_llama  # noqa: E402


@pytest.mark.parametrize("bits", [2, 3, 8])
def test_ganq_bits_sweep(rng, bits, tmp_path):
    model = tiny_llama(20 + bits)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    out = quantize_model(cfg, params, get_spec("llama"), QuantizeConfig(
        bits=bits, quant_method="ganq", ganq_iterations=2,
        act_sort="asc", l_damp_style="ganq", dead="mean"), calib(rng, n=2))
    art = next(iter(out.artifacts.values()))
    assert art.lut.shape[1] == 2 ** bits
    assert int(np.asarray(art.idx).max()) < 2 ** bits

    d = str(tmp_path / f"b{bits}")
    checkpoint.save_quantized(d, model.config.to_dict(), QuantizeConfig(
        bits=bits, quant_method="ganq"), out.params, out.artifacts)
    cfg2, params2, _ = checkpoint.load_quantized(d)
    ids = jnp.asarray(rng.integers(0, 512, size=(1, 32)))
    a = np.asarray(transformer.forward(cfg, out.params, ids), np.float32)
    b = np.asarray(transformer.forward(cfg2, params2, ids), np.float32)
    np.testing.assert_allclose(a, b, atol=0.1, rtol=0.1)

    # more bits -> better fidelity (checked across the sweep by magnitude)
    ids2 = rng.integers(0, 512, size=(1, 48))
    mse = logits_mse(cfg, p_ref, out.params, ids2)
    assert np.isfinite(mse)


@pytest.mark.parametrize("bits,gs", [(2, 32), (8, -1), (4, 64)])
def test_gptq_bits_group_sweep(rng, bits, gs):
    model = tiny_llama(30 + bits)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    out = quantize_model(cfg, params, get_spec("llama"), QuantizeConfig(
        bits=bits, group_size=gs, sym=False, desc_act=False, act_sort="none",
        format="gptq_v2"), calib(rng, n=2))
    art = next(iter(out.artifacts.values()))
    assert int(np.asarray(art.qidx).max()) < 2 ** bits
    mse = logits_mse(cfg, p_ref, out.params, rng.integers(0, 512, size=(1, 48)))
    assert np.isfinite(mse)


def test_more_bits_less_error(rng):
    model = tiny_llama(40)
    cfg, p_ref = hf_import.params_from_torch_model(model)
    errs = {}
    ids = rng.integers(0, 512, size=(2, 48))
    for bits in (2, 4):
        _, params = hf_import.params_from_torch_model(model)
        out = quantize_model(cfg, params, get_spec("llama"), QuantizeConfig(
            bits=bits, quant_method="ganq", ganq_iterations=2,
            act_sort="asc", l_damp_style="ganq", dead="mean"), calib(rng, n=2))
        errs[bits] = logits_mse(cfg, p_ref, out.params, ids)
    assert errs[4] < errs[2]
