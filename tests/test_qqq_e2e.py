"""QQQ W4A8 end-to-end: quantize with quant_method='qqq' (GPTQ-sym solver +
calibrated per-channel scale_extra, reference quantization/qqq.py:9-36),
save/load the QQQ checkpoint format, and run the A8 serving path with the
calibrated scales (VERDICT round 1, item #6)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.core.config import FORMAT, QUANT_METHOD, QuantizeConfig  # noqa: E402
from ganq_tpu.formats import checkpoint  # noqa: E402
from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.models.registry import get_spec  # noqa: E402
from ganq_tpu.ops import qlinear  # noqa: E402
from ganq_tpu.quant.looper import quantize_model  # noqa: E402


def tiny_llama(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(hf_cfg)


def test_qqq_config_defaults():
    qcfg = QuantizeConfig(bits=4, quant_method="qqq", group_size=32)
    assert qcfg.quant_method == QUANT_METHOD.QQQ
    assert qcfg.format == FORMAT.QQQ
    assert qcfg.sym and not qcfg.desc_act
    with pytest.raises(ValueError, match="sym"):
        QuantizeConfig(bits=4, quant_method="qqq", sym=False)
    with pytest.raises(ValueError, match="4-bit"):
        QuantizeConfig(bits=8, quant_method="qqq")


def test_qqq_quantize_save_load_roundtrip(rng, tmp_path):
    model = tiny_llama()
    cfg, params = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    batches = [rng.integers(0, 512, size=(2, 64)).astype(np.int32)
               for _ in range(3)]
    qcfg = QuantizeConfig(bits=4, quant_method="qqq", group_size=32,
                          act_sort="none")
    out = quantize_model(cfg, params, spec, qcfg, batches)

    # grouped QQQ artifacts must carry the calibrated per-channel scale
    for name, art in out.artifacts.items():
        assert art.scale_extra is not None, name
        assert art.scale_extra.shape == (art.qidx.shape[0],)

    hf_cfg = model.config.to_dict()
    save_dir = str(tmp_path / "qqq")
    checkpoint.save_quantized(save_dir, hf_cfg, qcfg, out.params,
                              out.artifacts, out.log)

    # the checkpoint holds QQQ tensors, not gptq ones
    import safetensors.numpy
    import glob
    tensors = {}
    for f in glob.glob(f"{save_dir}/*.safetensors"):
        tensors.update(safetensors.numpy.load_file(f))
    b_keys = [k for k in tensors if k.endswith(".B")]
    assert b_keys and not any(k.endswith(".qweight") for k in tensors)
    assert any(k.endswith(".s_channel") for k in tensors)
    assert any(k.endswith(".s_group") for k in tensors)

    cfg2, params2, qcfg2 = checkpoint.load_quantized(save_dir)
    assert qcfg2.format == FORMAT.QQQ

    # loaded dequant == in-memory fake-quant (the pack is lossless on codes;
    # scales pass through fp16 relative storage)
    ids = jnp.asarray(rng.integers(0, 512, size=(1, 32)))
    ref = np.asarray(transformer.forward(cfg, out.params, ids), np.float32)
    got = np.asarray(transformer.forward(cfg2, params2, ids), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)

    # A8 serving path on the loaded artifact (calibrated group scales)
    got8 = np.asarray(transformer.forward(cfg2, params2, ids,
                                          backend="pallas_a8"), np.float32)
    assert np.mean((got8 - ref) ** 2) < np.var(ref) * 0.05

    # the w8 recode consumes the calibrated scale_extra
    m = params2["layers"][0]["attn"]["q"]
    assert "scale_extra" in m.arrays
    r = qlinear.recode_w8(m)
    np.testing.assert_allclose(
        np.asarray(r["scale"][:, 0]), np.asarray(m["scale_extra"]),
        rtol=1e-6)


def test_qqq_checkpoint_serves_via_megastep(rng, tmp_path, monkeypatch):
    """Full journey: quantize (QQQ W4 sym) -> save FORMAT.QQQ -> load ->
    Engine serve; with d=128 the W4 megastep fast path engages on the
    LOADED artifacts (not synthetic ones) and generation matches the
    reference backend."""
    from ganq_tpu.serve import engine as eng_mod

    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=128, max_position_embeddings=256)
    torch.manual_seed(3)
    model = transformers.LlamaForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    batches = [rng.integers(0, 512, size=(2, 64)).astype(np.int32)
               for _ in range(2)]
    qcfg = QuantizeConfig(bits=4, quant_method="qqq", group_size=128,
                          act_sort="none")
    out = quantize_model(cfg, params, spec, qcfg, batches)
    save_dir = str(tmp_path / "qqq128")
    checkpoint.save_quantized(save_dir, model.config.to_dict(), qcfg,
                              out.params, out.artifacts, out.log)
    cfg2, params2, _ = checkpoint.load_quantized(save_dir)

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    e = eng_mod.Engine(cfg2, params2, backend="reference", max_seq=64)
    assert e._sp is not None and "megapack_lb" in e._sp
    ids = rng.integers(0, 512, size=(2, 8))
    got = e.generate(ids, max_new_tokens=6)

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    e2 = eng_mod.Engine(cfg2, params2, backend="reference", max_seq=64)
    ref = e2.generate(ids, max_new_tokens=6)
    assert (np.asarray(got) == np.asarray(ref)).mean() >= 0.9, (got, ref)
