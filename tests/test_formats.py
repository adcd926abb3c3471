"""Checkpoint format tests: pack/unpack roundtrips (reference test_packable /
test_packing), GPTQ ecosystem layout roundtrip, and full save->load->forward
parity (reference test_serialization / test_sharded)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ganq_tpu.core.config import FORMAT, QuantizeConfig
from ganq_tpu.formats import checkpoint, gptq_compat
from ganq_tpu.models import hf_import, transformer
from ganq_tpu.models.registry import get_spec
from ganq_tpu.ops import qlinear
from ganq_tpu.ops.packing import pack_int_rows, unpack_int_rows


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_pack_roundtrip(rng, bits):
    idx = rng.integers(0, 2**bits, size=(16, 64)).astype(np.int32)
    packed = pack_int_rows(jnp.asarray(idx), bits)
    out = unpack_int_rows(packed, bits, 64)
    np.testing.assert_array_equal(np.asarray(out), idx)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_gptq_compat_roundtrip(rng, bits):
    out_f, in_f, groups = 32, 64, 2
    qidx = rng.integers(0, 2**bits, size=(out_f, in_f)).astype(np.int32)
    scales = rng.random(size=(out_f, groups)).astype(np.float32) + 0.1
    zeros = rng.integers(1, 2**bits, size=(out_f, groups)).astype(np.float32)
    g_idx = (np.arange(in_f) // (in_f // groups)).astype(np.int32)

    packed = gptq_compat.pack_gptq(qidx, scales, zeros, g_idx, bits, v1=True)
    assert packed["qweight"].shape == (in_f * bits // 32, out_f)
    assert packed["qzeros"].shape == (groups, out_f * bits // 32)
    qidx2, scales2, zeros2, g_idx2 = gptq_compat.unpack_gptq(packed, bits, v1=True)
    np.testing.assert_array_equal(qidx2, qidx)
    np.testing.assert_array_equal(g_idx2, g_idx)
    np.testing.assert_array_equal(zeros2, zeros)
    np.testing.assert_allclose(scales2, scales, rtol=1e-3)


def test_lut_linear_dequant_matches_gather(rng):
    lut = np.sort(rng.normal(size=(8, 16)).astype(np.float32), axis=1)
    idx = rng.integers(0, 16, size=(8, 32)).astype(np.int32)
    ql = qlinear.lut_linear(jnp.asarray(lut), jnp.asarray(idx), 4)
    w = np.asarray(qlinear.dequantize_weight(ql))
    ref = np.take_along_axis(lut, idx, axis=1)
    np.testing.assert_allclose(w, ref.astype(np.float16), atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("method,fmt,bits", [
    ("ganq", "lut", 4),
    ("ganq", "lut", 3),     # 8-entry codebooks (the walsh-served artifact)
    ("gptq", "gptq", 4),
    ("gptq", "gptq_v2", 4),
])
def test_save_load_forward_parity(rng, tmp_path, method, fmt, bits):
    torch = pytest.importorskip("torch")
    import transformers as hf

    from ganq_tpu.quant.looper import quantize_model

    hf_cfg = hf.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(7)
    model = hf.LlamaForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")

    if method == "ganq":
        qcfg = QuantizeConfig(bits=bits, quant_method="ganq",
                              ganq_iterations=2, act_sort="asc",
                              l_damp_style="ganq", dead="mean")
    else:
        qcfg = QuantizeConfig(bits=bits, group_size=32, sym=False,
                              desc_act=False, act_sort="none", format=fmt)

    batches = [rng.integers(0, 256, size=(2, 32)).astype(np.int32) for _ in range(2)]
    out = quantize_model(cfg, params, spec, qcfg, batches)

    save_dir = str(tmp_path / "ckpt")
    checkpoint.save_quantized(save_dir, model.config.to_dict(), qcfg,
                              out.params, out.artifacts, out.log)
    assert os.path.exists(os.path.join(save_dir, "quantize_config.json"))
    assert os.path.exists(os.path.join(save_dir, "quant_log.csv"))
    with open(os.path.join(save_dir, "config.json")) as f:
        assert "quantization_config" in json.load(f)

    cfg2, params2, qcfg2 = checkpoint.load_quantized(save_dir)
    assert qcfg2.format == FORMAT(fmt)

    ids = jnp.asarray(rng.integers(0, 256, size=(1, 32)))
    ref = np.asarray(transformer.forward(cfg, out.params, ids), np.float32)
    got = np.asarray(transformer.forward(cfg2, params2, ids), np.float32)
    # lut is stored fp16 and runs bf16; gptq scales are stored fp16 (the
    # ecosystem convention): small dequant noise is expected
    tol = 5e-2 if method == "ganq" else 1e-3
    np.testing.assert_allclose(got, ref, atol=tol, rtol=tol)

    # quantized modules came back packed, not dense
    q0 = hf_import.get_module(params2, 0, "attn.q")
    assert q0.kind == ("lut" if method == "ganq" else "uniform")
    assert q0.bits == bits


def test_hash_verify(rng, tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello world")
    h = checkpoint.sha256_file(str(p))
    assert h == "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9"


def test_sharded_write(rng, tmp_path):
    state = {f"t{i}": rng.random(size=(64, 64)).astype(np.float32) for i in range(8)}
    checkpoint._write_sharded(str(tmp_path), state, max_shard_bytes=40000)
    idx_path = tmp_path / "model.safetensors.index.json"
    assert idx_path.exists()
    index = json.loads(idx_path.read_text())
    assert set(index["weight_map"]) == set(state)
    loaded = {k: v for k, v in hf_import.iter_safetensors(str(tmp_path))}
    for k, v in state.items():
        np.testing.assert_array_equal(loaded[k], v)


def test_load_reference_style_gptq_checkpoint(rng, tmp_path):
    """Interop: a checkpoint written with the GPTQ ecosystem's conventions
    (reference writer: v1 qweight/qzeros/scales/g_idx under HF module
    prefixes, quantize_config.json with its field set) must load and serve."""
    import json
    from safetensors.numpy import save_file

    # build a fake ecosystem checkpoint for a 1-layer llama
    hf_cfg = {"model_type": "llama", "vocab_size": 128, "hidden_size": 64,
              "intermediate_size": 96, "num_hidden_layers": 1,
              "num_attention_heads": 4, "num_key_value_heads": 4,
              "max_position_embeddings": 64, "rms_norm_eps": 1e-5,
              "tie_word_embeddings": False}
    state = {
        "model.embed_tokens.weight": rng.normal(size=(128, 64)).astype(np.float32),
        "model.norm.weight": np.ones(64, np.float32),
        "lm_head.weight": rng.normal(size=(128, 64)).astype(np.float32),
        "model.layers.0.input_layernorm.weight": np.ones(64, np.float32),
        "model.layers.0.post_attention_layernorm.weight": np.ones(64, np.float32),
    }
    dequants = {}
    for mod, (out_f, in_f) in {
            "self_attn.q_proj": (64, 64), "self_attn.k_proj": (64, 64),
            "self_attn.v_proj": (64, 64), "self_attn.o_proj": (64, 64),
            "mlp.gate_proj": (96, 64), "mlp.up_proj": (96, 64),
            "mlp.down_proj": (64, 96)}.items():
        qidx = rng.integers(0, 16, size=(out_f, in_f)).astype(np.int32)
        gs = 32
        scales = rng.random(size=(out_f, in_f // gs)).astype(np.float32) * 0.01 + 0.001
        zeros = rng.integers(1, 16, size=(out_f, in_f // gs)).astype(np.float32)
        g_idx = (np.arange(in_f) // gs).astype(np.int32)
        packed = gptq_compat.pack_gptq(qidx, scales, zeros, g_idx, 4, v1=True)
        for k, v in packed.items():
            state[f"model.layers.0.{mod}.{k}"] = v
        dequants[mod] = scales[:, g_idx] * (qidx - zeros[:, g_idx])
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(tmp_path / "model.safetensors"))
    # ecosystem-style quantize_config.json (reference field set)
    (tmp_path / "quantize_config.json").write_text(json.dumps({
        "bits": 4, "group_size": 32, "desc_act": False, "sym": False,
        "quant_method": "gptq", "checkpoint_format": "gptq",
        "damp_percent": 0.01, "true_sequential": True}))
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    cfg, params, qcfg = checkpoint.load_quantized(str(tmp_path))
    assert qcfg.format == FORMAT.GPTQ and qcfg.group_size == 32
    q0 = hf_import.get_module(params, 0, "attn.q")
    assert q0.kind == "uniform"
    np.testing.assert_allclose(
        np.asarray(qlinear.dequantize_weight(q0)), dequants["self_attn.q_proj"],
        rtol=1e-2, atol=1e-4)
    # and the model actually runs
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 8)))
    out = transformer.forward(cfg, params, ids)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fake_format_save_and_export(rng, tmp_path):
    """FORMAT.FAKE writes dequantized fp weights (the reference's GANQ
    default artifact); export_dequantized yields a plain HF checkpoint."""
    torch = pytest.importorskip("torch")
    import transformers as hf
    from ganq_tpu import GanqModel, QuantizeConfig

    hf_cfg = hf.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(11)
    m = GanqModel.from_torch_model(
        hf.LlamaForCausalLM(hf_cfg),
        QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=1,
                       act_sort="asc", l_damp_style="ganq", dead="mean",
                       format="fake"))
    m.quantize([rng.integers(0, 128, size=(24,)).astype(np.int32)
                for _ in range(2)])
    d = str(tmp_path / "fake")
    m.save(d)
    # fake checkpoint: plain weights present, no packed tensors
    state = {k: v for k, v in hf_import.iter_safetensors(d)}
    assert "model.layers.0.self_attn.q_proj.weight" in state
    assert not any(k.endswith(".lut") for k in state)
    m2 = __import__("ganq_tpu").GanqModel.load(d)
    assert m2.quantized
    q0 = hf_import.get_module(m2.params, 0, "attn.q")
    assert q0.kind == "dense"

    # export path (works for packed models too)
    e = str(tmp_path / "export")
    m.export_dequantized(e)
    state2 = {k: v for k, v in hf_import.iter_safetensors(e)}
    assert "model.layers.0.mlp.down_proj.weight" in state2
    assert os.path.isfile(os.path.join(e, "config.json"))
