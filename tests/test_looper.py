"""End-to-end layer-wise quantization on tiny random-init models: the
miniature of the reference's ModelTest flow (tests/models/model_test.py) —
quantize with real calibration forwards, then check the quantized model stays
close to the fp model and GANQ beats GPTQ on output fidelity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.core.config import QuantizeConfig  # noqa: E402
from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.models.registry import get_spec  # noqa: E402
from ganq_tpu.quant.looper import quantize_model  # noqa: E402
from ganq_tpu.evals.perplexity import fixed_stride_ppl  # noqa: E402


def tiny_llama(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(hf_cfg)


def tiny_opt(seed=0):
    hf_cfg = transformers.OPTConfig(
        vocab_size=512, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
        word_embed_proj_dim=64)
    torch.manual_seed(seed)
    return transformers.OPTForCausalLM(hf_cfg)


def calib(rng, n=4, b=2, s=64, vocab=512):
    return [rng.integers(0, vocab, size=(b, s)).astype(np.int32) for _ in range(n)]


def logits_mse(cfg, p_ref, p_q, ids):
    a = np.asarray(transformer.forward(cfg, p_ref, jnp.asarray(ids)), np.float32)
    b = np.asarray(transformer.forward(cfg, p_q, jnp.asarray(ids)), np.float32)
    return float(np.mean((a - b) ** 2))


@pytest.mark.parametrize("maker,mtype", [(tiny_llama, "llama"), (tiny_opt, "opt")])
def test_quantize_model_end_to_end(rng, maker, mtype):
    model = maker()
    cfg, params = hf_import.params_from_torch_model(model)
    _, params_ref = hf_import.params_from_torch_model(model)
    spec = get_spec(mtype)
    batches = calib(rng)

    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=3,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    out = quantize_model(cfg, params, spec, qcfg, batches)

    n_linears_per_layer = len([m for sub in spec.layer_modules for m in sub])
    assert len(out.artifacts) == cfg.num_hidden_layers * n_linears_per_layer
    assert all(np.isfinite(e.loss) for e in out.log)

    ids = rng.integers(0, 512, size=(1, 64))
    mse_q = logits_mse(cfg, params_ref, out.params, ids)
    # fp-vs-fp sanity: same params give 0
    assert logits_mse(cfg, params_ref, params_ref, ids) == 0.0
    base_var = float(np.var(np.asarray(transformer.forward(cfg, params_ref, jnp.asarray(ids)))))
    assert mse_q < base_var * 0.5, (mse_q, base_var)


def _heavy_tails(model, rng):
    """Sparse outlier injection: random-init weights are iid Gaussian, where a
    uniform grid is near-optimal; real LLM weights are heavy-tailed, which is
    where the non-uniform codebook earns its ppl wins (BASELINE.md)."""
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 2 and "embed" not in name and "lm_head" not in name:
                mask = torch.tensor(rng.random(size=tuple(p.shape)) < 0.03)
                out = torch.tensor(rng.normal(size=tuple(p.shape)) * 6.0,
                                   dtype=p.dtype)
                p.mul_(torch.where(mask, torch.tensor(1.0), torch.tensor(1.0)))
                p.add_(torch.where(mask, out * p.abs().mean(), torch.tensor(0.0)))
    return model


def test_ganq_beats_gptq_on_model_outputs(rng):
    model = _heavy_tails(tiny_llama(1), rng)
    cfg, p1 = hf_import.params_from_torch_model(model)
    _, p2 = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    batches = calib(rng, n=4)

    out_ganq = quantize_model(cfg, p1, spec, QuantizeConfig(
        bits=3, quant_method="ganq", ganq_iterations=5,
        act_sort="asc", l_damp_style="ganq", dead="mean"), batches)
    out_gptq = quantize_model(cfg, p2, spec, QuantizeConfig(
        bits=3, group_size=-1, sym=False, desc_act=False, act_sort="none"), batches)

    ids = rng.integers(0, 512, size=(2, 64))
    m_ganq = logits_mse(cfg, p_ref, out_ganq.params, ids)
    m_gptq = logits_mse(cfg, p_ref, out_gptq.params, ids)
    assert m_ganq < m_gptq, (m_ganq, m_gptq)


def test_dynamic_exclude_and_override(rng):
    model = tiny_llama(2)
    cfg, params = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    qcfg = QuantizeConfig(bits=4, group_size=-1, desc_act=False, act_sort="none",
                          dynamic={
                              "-:.*o_proj.*": {},
                              "+:.*down_proj.*": {"bits": 8},
                          })
    out = quantize_model(cfg, params, spec, qcfg, calib(rng, n=2))
    names = set(out.artifacts)
    assert not any("o_proj" in n for n in names)
    down = [a for n, a in out.artifacts.items() if "down_proj" in n]
    assert down and all(a.bits == 8 for a in down)
    q = [a for n, a in out.artifacts.items() if "q_proj" in n]
    assert q and all(a.bits == 4 for a in q)


def test_quantized_ppl_delta_small(rng):
    """Fixed-stride ppl of the GANQ model stays close to fp — the miniature of
    the README accuracy contract (BASELINE.md: delta +0.80 on opt-125m)."""
    model = tiny_opt(3)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    spec = get_spec("opt")
    out = quantize_model(cfg, params, spec, QuantizeConfig(
        bits=4, quant_method="ganq", ganq_iterations=3,
        act_sort="asc", l_damp_style="ganq", dead="mean"), calib(rng, n=4))

    tokens = rng.integers(0, 512, size=(4 * 128,))
    fwd = lambda p, ids: transformer.forward(cfg, p, ids)
    ppl_fp = fixed_stride_ppl(fwd, p_ref, tokens, seqlen=128)
    ppl_q = fixed_stride_ppl(fwd, out.params, tokens, seqlen=128)
    # random-init models sit near ppl≈vocab; quantization must not blow it up
    assert ppl_q < ppl_fp * 1.15, (ppl_fp, ppl_q)


def test_resume_mid_quantization(rng, tmp_path):
    """Per-layer checkpointing: a second run restores completed layers and
    produces identical artifacts (net-new vs the reference, SURVEY.md 5.4)."""
    model = tiny_llama(9)
    cfg, p1 = hf_import.params_from_torch_model(model)
    _, p2 = hf_import.params_from_torch_model(model)
    spec = get_spec("llama")
    batches = calib(rng, n=2)
    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=1,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    d = str(tmp_path / "resume")

    out1 = quantize_model(cfg, p1, spec, qcfg, batches, resume_dir=d)
    import os
    assert os.path.isfile(os.path.join(d, "layer_0.npz"))
    assert os.path.isfile(os.path.join(d, "layer_1.npz"))

    # second run must restore every layer (no re-solving) and agree exactly
    out2 = quantize_model(cfg, p2, spec, qcfg, batches, resume_dir=d)
    assert len(out2.log) == 0  # nothing re-quantized
    for name in out1.artifacts:
        a, b = out1.artifacts[name], out2.artifacts[name]
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
        np.testing.assert_allclose(np.asarray(a.lut), np.asarray(b.lut),
                                   rtol=1e-6)
    ids = rng.integers(0, 512, size=(1, 32))
    import jax.numpy as jnp
    from ganq_tpu.models import transformer
    x1 = np.asarray(transformer.forward(cfg, out1.params, jnp.asarray(ids)))
    x2 = np.asarray(transformer.forward(cfg, out2.params, jnp.asarray(ids)))
    np.testing.assert_allclose(x1, x2, atol=1e-5)
