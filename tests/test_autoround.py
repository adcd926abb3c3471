"""AutoRound solver tests: RTN-equivalence at init, monotone improvement over
signed-gradient iterations, format compat, and an end-to-end quantize/save/
load roundtrip through the uniform serving path.

The reference has no unit tests for auto-round (it delegates to the external
package); the strategy here mirrors its solver tests — an obvious baseline vs
the optimized result (SURVEY.md §4.1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from ganq_tpu.core.config import QUANT_METHOD, QuantizeConfig
from ganq_tpu.quant.autoround import autoround_quantize
from ganq_tpu.quant.gptq import gptq_quantize


def make_problem(rng, m=24, n=64, nsamples=8):
    X = rng.standard_normal((nsamples * 16, n)).astype(np.float32)
    H = (2.0 / nsamples) * (X.T @ X)
    W = rng.standard_normal((m, n)).astype(np.float32)
    return jnp.asarray(W), jnp.asarray(H), nsamples


def hloss(W, Q, H):
    E = np.asarray(Q - W, np.float64)
    return float(np.sum((E @ np.asarray(H, np.float64)) * E))


def test_autoround_improves_over_rtn():
    rng = np.random.default_rng(0)
    W, H, ns = make_problem(rng)
    base = QuantizeConfig(bits=4, group_size=32, quant_method="auto_round",
                          autoround_iters=1, autoround_minmax_tuning=False,
                          autoround_keep_best=True)
    tuned = QuantizeConfig(bits=4, group_size=32, quant_method="auto_round",
                           autoround_iters=200)
    r0 = autoround_quantize(W, H, base, ns)
    r1 = autoround_quantize(W, H, tuned, ns)
    # iters=1 from a zero init with best-keeping is (at worst) the RTN grid
    assert hloss(W, r1.Q, H) < hloss(W, r0.Q, H) * 0.95
    # integer artifacts stay on the uniform grid
    q = np.asarray(r1.qidx)
    assert q.min() >= 0 and q.max() <= 15
    z = np.asarray(r1.zero)
    assert np.allclose(z, np.round(z))
    # fake-quant reconstructs exactly from the packed fields
    s = np.asarray(r1.scale)
    g = np.asarray(r1.g_idx)
    recon = s[:, g] * (q - z[:, g])
    assert np.allclose(recon, np.asarray(r1.Q), atol=1e-5)


def test_autoround_competitive_with_gptq():
    rng = np.random.default_rng(1)
    W, H, ns = make_problem(rng, m=32, n=96)
    cfg_ar = QuantizeConfig(bits=4, group_size=-1, quant_method="auto_round",
                            autoround_iters=300)
    cfg_g = QuantizeConfig(bits=4, group_size=-1, quant_method="gptq",
                           act_sort="none", desc_act=False)
    r_ar = autoround_quantize(W, H, cfg_ar, ns)
    r_g = gptq_quantize(W, H, cfg_g, ns)
    # not a strict ordering in general, but on iid problems the tuned
    # rounding should land in the same loss decade as GPTQ
    assert hloss(W, r_ar.Q, H) < 3.0 * hloss(W, r_g.Q, H)


def test_autoround_asym_and_overhang():
    rng = np.random.default_rng(2)
    W, H, ns = make_problem(rng, m=8, n=72)  # 72 % 32 != 0 -> padded group
    cfg = QuantizeConfig(bits=4, group_size=32, sym=False,
                         quant_method="auto_round", autoround_iters=40)
    r = autoround_quantize(W, H, cfg, ns)
    assert r.Q.shape == W.shape
    assert np.asarray(r.scale).shape == (8, 3)
    assert int(np.asarray(r.g_idx).max()) == 2
    assert np.isfinite(hloss(W, r.Q, H))


def test_autoround_config_serialization():
    cfg = QuantizeConfig(bits=4, quant_method="auto_round")
    d = cfg.to_dict()
    # ecosystem compat: advertised as gptq, provenance in meta
    assert d["quant_method"] == "gptq"
    assert d["meta"]["true_quant_method"] == "auto_round"
    cfg2 = QuantizeConfig.from_dict(d)
    assert cfg2.quant_method == QUANT_METHOD.GPTQ  # loads as plain uniform


def test_autoround_end_to_end(tmp_path):
    transformers = pytest.importorskip("transformers")
    import torch

    from ganq_tpu.api import GanqModel

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(3)
    tm = transformers.LlamaForCausalLM(hf_cfg)

    rng = np.random.default_rng(3)
    qcfg = QuantizeConfig(bits=4, group_size=16, quant_method="auto_round",
                          autoround_iters=30)
    m = GanqModel.from_torch_model(tm, qcfg)
    calib = [rng.integers(1, 128, size=(40,)).astype(np.int32) for _ in range(3)]
    m.quantize(calib, batch_size=1)
    assert m.quantized

    d = str(tmp_path / "ar")
    m.save(d)
    m2 = GanqModel.load(d)
    assert m2.quantized

    prompt = rng.integers(1, 128, size=(1, 8)).astype(np.int32)
    a = m.generate(prompt, max_new_tokens=4, max_seq=64)
    b = m2.generate(prompt, max_new_tokens=4, max_seq=64)
    assert a.shape == b.shape == (1, 4)
    assert np.mean(a == b) >= 0.75


def test_autoround_block_scope(rng, tmp_path):
    """Block-scope AutoRound (layer-output MSE, the external package's
    nblocks=1 default) quantizes end-to-end and reduces the layer-output
    error vs plain RTN rounding (iters=1 baseline)."""
    transformers = pytest.importorskip("transformers")
    import torch

    from ganq_tpu.api import GanqModel

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(7)
    tm = transformers.LlamaForCausalLM(hf_cfg)
    calib = [np.random.default_rng(7).integers(
        1, 128, size=(40,)).astype(np.int32) for _ in range(3)]

    losses = {}
    for iters in (1, 120):
        torch.manual_seed(7)
        m = GanqModel.from_torch_model(
            transformers.LlamaForCausalLM(hf_cfg),
            QuantizeConfig(bits=4, group_size=16, quant_method="auto_round",
                           autoround_scope="block", autoround_iters=iters))
        rows = m.quantize(calib, batch_size=1)
        assert all(r.method == "auto_round/block" for r in rows)
        losses[iters] = rows[-1].loss  # layer-1 block loss
        if iters == 120:
            d = str(tmp_path / "arb")
            m.save(d)
            m2 = GanqModel.load(d)
            p = np.random.default_rng(7).integers(
                1, 128, size=(1, 8)).astype(np.int32)
            a = m.generate(p, max_new_tokens=4, max_seq=64)
            b = m2.generate(p, max_new_tokens=4, max_seq=64)
            assert np.mean(np.asarray(a) == np.asarray(b)) >= 0.75
    assert losses[120] < losses[1]
