"""EoRA tests: math parity vs numpy float64, accuracy recovery end-to-end,
adapter save/load (reference test_quant_and_eora / test_post_quant_eora)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.adapter.eora import apply_lora, compute_eora  # noqa: E402
from ganq_tpu.core.config import QuantizeConfig  # noqa: E402
from ganq_tpu.formats import checkpoint  # noqa: E402
from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.models.registry import get_spec  # noqa: E402
from ganq_tpu.quant.eora_flow import generate_eora  # noqa: E402
from ganq_tpu.quant.looper import quantize_model  # noqa: E402
from tests.test_looper import calib, tiny_llama, logits_mse  # noqa: E402


def test_compute_eora_matches_numpy(rng):
    m, n, r = 24, 32, 4
    delta = rng.normal(size=(m, n)).astype(np.float32)
    X = rng.normal(size=(n, 128)).astype(np.float32)
    cov = (X @ X.T / 128).astype(np.float32)

    A, B = compute_eora(jnp.asarray(delta), jnp.asarray(cov), r)
    assert A.shape == (r, n) and B.shape == (m, r)

    # numpy float64 oracle of the reference math (eora.py:60-92)
    L, Q = np.linalg.eigh(cov.astype(np.float64))
    L[L < 0] = L[L > 0].min()
    S = Q @ np.diag(np.sqrt(L))
    Sinv = np.linalg.inv(S)
    U, sv, Vt = np.linalg.svd(delta.astype(np.float64) @ S, full_matrices=False)
    Bref = U[:, :r] @ np.diag(np.sqrt(sv[:r]))
    Aref = np.diag(np.sqrt(sv[:r])) @ Vt[:r] @ Sinv
    # compare the reconstructions (factors are sign/rotation ambiguous)
    np.testing.assert_allclose(np.asarray(B) @ np.asarray(A), Bref @ Aref,
                               atol=1e-2, rtol=1e-2)


def test_eora_reduces_weighted_error(rng):
    m, n, r = 32, 48, 8
    delta = rng.normal(size=(m, n)).astype(np.float32)
    X = rng.normal(size=(n, 256)).astype(np.float32)
    cov = (X @ X.T / 256).astype(np.float32)
    A, B = compute_eora(jnp.asarray(delta), jnp.asarray(cov), r)
    resid = delta - np.asarray(B) @ np.asarray(A)
    err_before = np.sum((delta @ X) ** 2)
    err_after = np.sum((resid @ X) ** 2)
    assert err_after < err_before * 0.8


def test_quantize_with_eora_improves_outputs(rng):
    from tests.test_looper import _heavy_tails
    model = _heavy_tails(tiny_llama(5), rng)
    cfg, p_plain = hf_import.params_from_torch_model(model)
    _, p_eora = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    batches = calib(rng, n=3)

    base = dict(bits=3, quant_method="ganq", ganq_iterations=3,
                act_sort="asc", l_damp_style="ganq", dead="mean")
    out_plain = quantize_model(cfg, p_plain, spec, QuantizeConfig(**base), batches)
    out_eora = quantize_model(cfg, p_eora, spec,
                              QuantizeConfig(**base, adapter={"rank": 16}), batches)

    ids = rng.integers(0, 512, size=(2, 48))
    assert logits_mse(cfg, p_ref, out_eora.params, ids) < \
        logits_mse(cfg, p_ref, out_plain.params, ids)
    art = next(iter(out_eora.artifacts.values()))
    assert art.lora_a.shape[0] == 16


def test_eora_save_load_roundtrip(rng, tmp_path):
    model = tiny_llama(6)
    cfg, params = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=1,
                          act_sort="asc", l_damp_style="ganq", dead="mean",
                          adapter={"rank": 8})
    out = quantize_model(cfg, params, spec, qcfg, calib(rng, n=2))
    d = str(tmp_path / "ck")
    checkpoint.save_quantized(d, model.config.to_dict(), qcfg, out.params,
                              out.artifacts, out.log)
    import os
    assert os.path.isfile(os.path.join(d, "adapter_model.safetensors"))
    assert os.path.isfile(os.path.join(d, "adapter_config.json"))

    cfg2, params2, _ = checkpoint.load_quantized(d)
    q0 = hf_import.get_module(params2, 0, "attn.q")
    assert "lora_a" in q0 and q0["lora_a"].shape == (8, 64)

    ids = jnp.asarray(rng.integers(0, 256, size=(1, 16)))
    a = np.asarray(transformer.forward(cfg, out.params, ids), np.float32)
    b = np.asarray(transformer.forward(cfg2, params2, ids), np.float32)
    np.testing.assert_allclose(a, b, atol=0.1, rtol=0.1)


def test_post_quant_eora(rng):
    from tests.test_looper import _heavy_tails
    model = _heavy_tails(tiny_llama(7), rng)
    cfg, p_q = hf_import.params_from_torch_model(model)
    _, p_fp = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    batches = calib(rng, n=3)
    out = quantize_model(cfg, p_q, spec, QuantizeConfig(
        bits=3, quant_method="ganq", ganq_iterations=2,
        act_sort="asc", l_damp_style="ganq", dead="mean"), batches)

    # pack to a real quantized params tree, then post-quant EoRA
    import tempfile
    d = tempfile.mkdtemp()
    checkpoint.save_quantized(d, model.config.to_dict(),
                              QuantizeConfig(bits=3, quant_method="ganq"),
                              out.params, out.artifacts)
    cfg2, qparams, _ = checkpoint.load_quantized(d)

    ids = rng.integers(0, 512, size=(2, 48))
    before = logits_mse(cfg, p_ref, qparams, ids)
    done = generate_eora(cfg2, p_fp, qparams, spec, rank=16, calib_batches=batches)
    assert len(done) == 14
    after = logits_mse(cfg, p_ref, qparams, ids)
    assert after < before


def test_api_post_quant_eora_generate(rng, tmp_path):
    """GanqModel.eora_generate (reference GPTQModel.adapter.generate): load a
    quantized checkpoint, attach post-quant EoRA from the fp original, save
    the PEFT adapter next to the checkpoint, and reload with auto-attach."""
    import transformers
    import torch
    from ganq_tpu import GanqModel, QuantizeConfig

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64)
    torch.manual_seed(50)
    fp_model = transformers.LlamaForCausalLM(hf_cfg).eval().float()
    calib = [rng.integers(1, 128, size=(24,)).astype(np.int32)
             for _ in range(3)]

    m = GanqModel.from_torch_model(
        fp_model, QuantizeConfig(bits=4, quant_method="ganq",
                                 ganq_iterations=2, act_sort="asc",
                                 l_damp_style="ganq", dead="mean"))
    m.quantize(calib, batch_size=1)
    d = str(tmp_path / "q")
    m.save(d)

    q = GanqModel.load(d)
    with pytest.raises(RuntimeError, match="quantized"):
        GanqModel.from_torch_model(fp_model).eora_generate(fp_model, calib)
    prompt = rng.integers(1, 128, size=(1, 8)).astype(np.int32)
    done = q.eora_generate(fp_model, calib, rank=8, save_adapter_to=d)
    assert len(done) == 14
    assert "lora_a" in q.params["layers"][0]["attn"]["q"].arrays

    q2 = GanqModel.load(d)        # adapter auto-attached on load
    assert "lora_a" in q2.params["layers"][0]["attn"]["q"].arrays
    a = q.generate(prompt, max_new_tokens=4, max_seq=32)
    b = q2.generate(prompt, max_new_tokens=4, max_seq=32)
    assert np.mean(a == b) >= 0.75
