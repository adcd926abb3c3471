"""Mllama vision tower vs the transformers oracle (MllamaVisionModel).

Mirrors the reference's oracle-vs-implementation kernel test strategy
(SURVEY.md §4): a real (random-weight, tiny-shape) torch MllamaVisionModel
is the ground truth; our pure-JAX tower must match its cross-attention
states, including tile masking, gated tile/positional embeddings and the
intermediate-layer concatenation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from ganq_tpu.models import mllama_vision  # noqa: E402


def _tiny_torch_vision(seed=0):
    from transformers.models.mllama.configuration_mllama import (
        MllamaVisionConfig)
    from transformers.models.mllama.modeling_mllama import MllamaVisionModel

    cfg = MllamaVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_global_layers=2, attention_heads=2, image_size=16, patch_size=8,
        num_channels=3, max_num_tiles=2,
        supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]],
        intermediate_layers_indices=[1, 2], hidden_act="gelu")
    cfg._attn_implementation = "eager"
    model = MllamaVisionModel(cfg).eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "layernorm" in name and name.endswith("weight"):
                p.uniform_(0.9, 1.1, generator=g)
            elif "gate" in name.split(".")[-1]:
                p.uniform_(-0.7, 0.7, generator=g)
            else:
                p.normal_(0.0, 0.05, generator=g)
    return cfg, model


def test_vision_forward_matches_torch_oracle(rng):
    hf_cfg, model = _tiny_torch_vision()
    cfg = mllama_vision.vision_config_from_hf(
        {"vision_config": hf_cfg.to_dict()})
    assert cfg.num_patches == 5 and cfg.output_dim == 32 * 3

    state = {f"vision_model.{k}": v.numpy()
             for k, v in model.state_dict().items()}
    params = mllama_vision.import_vision_params(state)

    B, M, T = 2, 1, 2
    pixels = rng.normal(size=(B, M, T, 3, 16, 16)).astype(np.float32)
    ar_ids = np.array([[1], [2]], np.int64)          # [1,1] and [1,2] ratios
    ar_mask = np.array([[[1, 0]], [[1, 1]]], np.int64)  # one padded tile

    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(pixels),
                    aspect_ratio_ids=torch.tensor(ar_ids),
                    aspect_ratio_mask=torch.tensor(ar_mask))
    ref = ref.last_hidden_state.numpy().reshape(B, M, T, 5, cfg.output_dim)

    got = np.asarray(mllama_vision.vision_forward(
        cfg, params, jnp.asarray(pixels), jnp.asarray(ar_ids),
        jnp.asarray(ar_mask)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_projector_matches_linear(rng):
    w = rng.normal(size=(16, 96)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    params = {"multi_modal_projector": {"weight": jnp.asarray(w),
                                        "bias": jnp.asarray(b)}}
    x = rng.normal(size=(2, 1, 2, 5, 96)).astype(np.float32)
    got = np.asarray(mllama_vision.project_cross_attention(
        params, jnp.asarray(x)))
    assert got.shape == (2, 1 * 2 * 5, 16)
    ref = x.reshape(2, -1, 96) @ w.T + b
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
