"""MLX export (formats/mlx_export.py): the written layout must dequantize
(scales * q + biases, little-endian uint32 unpack) to exactly our own
dequantized weights — the lossless property the reference's
dequantize-then-requantize path lacks (gptqmodel/utils/mlx.py:22-153)."""

import glob
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from safetensors.numpy import load_file

from ganq_tpu.api import GanqModel
from ganq_tpu.core.config import QuantizeConfig
from ganq_tpu.ops.qlinear import QLinear, dequantize_weight


def tiny_model(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg)


def mlx_dequant(packed, scales, biases, bits, K):
    pf = 32 // bits
    out = packed.shape[0]
    q = np.zeros((out, K), np.float32)
    for t in range(pf):
        q[:, t::pf] = ((packed >> (bits * t)) & (2 ** bits - 1)).astype(
            np.float32)
    gs = K // scales.shape[1]
    g = np.arange(K) // gs
    return scales.astype(np.float32)[:, g] * q + biases.astype(
        np.float32)[:, g]


def test_mlx_export_lossless(rng, tmp_path):
    qcfg = QuantizeConfig(bits=4, group_size=32, quant_method="gptq",
                          act_sort="none", desc_act=False)
    m = GanqModel.from_torch_model(tiny_model(), qcfg)
    calib = [rng.integers(1, 128, size=(32,)).astype(np.int32)
             for _ in range(3)]
    m.quantize(calib, batch_size=1)
    d = str(tmp_path / "q")
    m.save(d)

    m2 = GanqModel.load(d)
    out = str(tmp_path / "mlx")
    stats = m2.export_mlx(out)
    assert stats["quantized"] == 14  # 7 linears x 2 layers

    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["quantization"] == {"group_size": 32, "bits": 4}

    state = {}
    for f in glob.glob(os.path.join(out, "*.safetensors")):
        state.update(load_file(f))

    # every quantized module dequantizes exactly to our weights (fp16 grid)
    name = "model.layers.0.self_attn.q_proj"
    assert f"{name}.scales" in state and f"{name}.biases" in state
    assert state[f"{name}.weight"].dtype == np.uint32
    ql = m2.params["layers"][0]["attn"]["q"]
    assert isinstance(ql, QLinear)
    ours = np.asarray(dequantize_weight(ql), np.float32)
    theirs = mlx_dequant(state[f"{name}.weight"], state[f"{name}.scales"],
                         state[f"{name}.biases"], 4, ql.in_features)
    np.testing.assert_allclose(theirs, ours, atol=2e-3, rtol=2e-3)

    # non-quantized tensors ride along as fp16
    assert state["model.embed_tokens.weight"].dtype == np.float16
    assert state["model.norm.weight"].dtype == np.float16


def test_mlx_export_fp16_fallback_for_lut(rng, tmp_path):
    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=1,
                          act_sort="asc", l_damp_style="ganq")
    m = GanqModel.from_torch_model(tiny_model(1), qcfg)
    calib = [rng.integers(1, 128, size=(32,)).astype(np.int32)
             for _ in range(3)]
    m.quantize(calib, batch_size=1)
    out = str(tmp_path / "mlx")
    stats = m.export_mlx(out)
    # LUT codebooks have no mlx affine analog -> fp16 everywhere
    assert stats["quantized"] == 0 and stats["fp16"] > 0
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert "quantization" not in cfg
