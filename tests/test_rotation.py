"""QuaRot rotation: function preservation (norm fusing + R1) and improved
quantization on outlier-heavy weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.quant.rotation import fuse_norms, make_rotation, rotate_model  # noqa: E402


def tiny(seed=0, tie=False, hidden=64):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=hidden, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=tie)
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(hf_cfg)


@pytest.mark.parametrize("mode", ["hadamard", "random"])
@pytest.mark.parametrize("tie", [False, True])
def test_rotation_preserves_function(rng, mode, tie):
    model = tiny(0, tie=tie)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    ids = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    ref = np.asarray(transformer.forward(cfg, p_ref, ids), np.float32)

    rotate_model(cfg, params, mode=mode)
    out = np.asarray(transformer.forward(cfg, params, ids), np.float32)
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_make_rotation_orthogonal():
    for mode, h in (("hadamard", 64), ("random", 48)):
        Q = np.asarray(make_rotation(h, mode))
        np.testing.assert_allclose(Q @ Q.T, np.eye(h), atol=1e-5)


def test_fuse_norms_alone_preserves_function(rng):
    model = tiny(1)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    ids = jnp.asarray(rng.integers(0, 256, size=(1, 12)))
    ref = np.asarray(transformer.forward(cfg, p_ref, ids), np.float32)
    fuse_norms(cfg, params)
    for lp in params["layers"]:
        np.testing.assert_allclose(np.asarray(lp["input_norm"]["weight"]), 1.0)
    out = np.asarray(transformer.forward(cfg, params, ids), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_rotation_spreads_outliers(rng):
    """Channel outliers should shrink after rotation (the QuaRot effect)."""
    model = tiny(2)
    cfg, params = hf_import.params_from_torch_model(model)
    w = params["layers"][0]["mlp"]["up"]["weight"]
    # inject a single-channel outlier column
    w = np.array(w)  # writable copy
    w[:, 7] *= 30.0
    params["layers"][0]["mlp"]["up"]["weight"] = jnp.asarray(w)
    kurt_before = _max_col_ratio(w)
    rotate_model(cfg, params, mode="hadamard")
    w2 = np.asarray(params["layers"][0]["mlp"]["up"]["weight"])
    kurt_after = _max_col_ratio(w2)
    assert kurt_after < kurt_before * 0.3


def _max_col_ratio(w):
    norms = np.linalg.norm(np.asarray(w, np.float64), axis=0)
    return norms.max() / np.median(norms)


def test_quantize_with_rotation_api(rng):
    from ganq_tpu import GanqModel, QuantizeConfig
    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=1,
                          act_sort="asc", l_damp_style="ganq", dead="mean",
                          rotation="hadamard")
    m = GanqModel.from_torch_model(tiny(3, tie=True), qcfg)
    m.quantize([rng.integers(1, 256, size=(32,)).astype(np.int32)
                for _ in range(2)])
    assert m.quantized and "lm_head" in m.params


def test_rotate_ov_preserves_function(rng):
    """R2 alone (reference rotation.py:161-166 rotate_ov_proj): per-head
    H on v outputs / o inputs must not change the network function."""
    from ganq_tpu.quant.rotation import rotate_ov

    for mode in ("hadamard", "random"):
        model = tiny(4)
        cfg, params = hf_import.params_from_torch_model(model)
        _, p_ref = hf_import.params_from_torch_model(model)
        ids = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
        ref = np.asarray(transformer.forward(cfg, p_ref, ids), np.float32)
        rotate_ov(cfg, params, mode=mode)
        out = np.asarray(transformer.forward(cfg, params, ids), np.float32)
        np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_rotate_ov_suppresses_v_activation_outliers(rng):
    """R2's purpose: outliers in the per-head v activations entering o
    (the W4A8 activation-quantization hazard) spread across the head dim."""
    from ganq_tpu.quant.rotation import rotate_ov

    model = tiny(5)
    cfg, params = hf_import.params_from_torch_model(model)
    # single-row outlier in v -> one hot channel in o's input activations
    v = np.array(params["layers"][0]["attn"]["v"]["weight"])
    v[3, :] *= 30.0
    params["layers"][0]["attn"]["v"]["weight"] = jnp.asarray(v)
    def row_ratio(w):  # per-output-channel (row) energy concentration
        norms = np.linalg.norm(np.asarray(w, np.float64), axis=1)
        return norms.max() / np.median(norms)

    before = row_ratio(params["layers"][0]["attn"]["v"]["weight"])
    rotate_ov(cfg, params, mode="hadamard")
    after = row_ratio(params["layers"][0]["attn"]["v"]["weight"])
    assert after < before * 0.5, (before, after)
