"""Mllama gated cross-attention serving vs the transformers oracle.

Full-model parity (vision tower -> projector -> interleaved self/cross text
decoder) on a tiny random MllamaForConditionalGeneration: prompt logits and
greedy generation, including rows whose cross-attention mask hides every
tile (the full-text-row masking path).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from ganq_tpu.models import hf_import  # noqa: E402
from ganq_tpu.serve.mllama_vl import MllamaVLEngine  # noqa: E402


def _tiny_torch_vl(seed=0):
    from transformers import MllamaConfig, MllamaForConditionalGeneration
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)

    vision = MllamaVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_global_layers=1, attention_heads=2, image_size=16, patch_size=8,
        num_channels=3, max_num_tiles=2,
        supported_aspect_ratios=[[1, 1], [1, 2], [2, 1]],
        intermediate_layers_indices=[0, 1], vision_output_dim=96,
        hidden_act="gelu")
    text = MllamaTextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=6,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        cross_attention_layers=[1, 4], max_position_embeddings=128,
        rope_theta=10000.0, rope_scaling={"rope_type": "default"},
        tie_word_embeddings=False, bos_token_id=None,
        eos_token_id=None, pad_token_id=None)
    cfg = MllamaConfig(vision_config=vision, text_config=text,
                       image_token_index=258)
    for c in (cfg, cfg.vision_config, cfg.text_config):
        c._attn_implementation = "eager"
    model = MllamaForConditionalGeneration(cfg).eval()
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if ("layernorm" in name or "norm" in name) and \
                    name.endswith("weight") and p.ndim == 1:
                p.uniform_(0.9, 1.1, generator=g)
            elif "gate" in name.split(".")[-1]:
                p.uniform_(-0.7, 0.7, generator=g)
            else:
                p.normal_(0.0, 0.05, generator=g)
    return cfg, model


def _inputs(rng):
    B, S, M, T = 1, 7, 1, 2
    ids = np.array([[258, 5, 9, 4, 17, 33, 2]], np.int64)  # image token first
    pixels = rng.normal(size=(B, M, T, 3, 16, 16)).astype(np.float32)
    ar_ids = np.array([[2]], np.int64)                      # [1, 2] ratio
    ar_mask = np.array([[[1, 1]]], np.int64)
    cam = np.ones((B, S, M, T), np.int64)
    cam[:, 1] = 0            # one row attends to nothing (full-row masking)
    cam[:, 2:4, :, 1] = 0    # some rows see only the first tile
    return ids, pixels, ar_ids, ar_mask, cam


@pytest.fixture(scope="module")
def vl():
    hf_cfg, model = _tiny_torch_vl()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    tcfg, tparams = hf_import.params_from_state_dict(state,
                                                     hf_cfg.to_dict())
    assert tcfg.num_hidden_layers == 4  # 6 layers - 2 cross
    eng = MllamaVLEngine.build(tcfg, tparams, hf_cfg.to_dict(), state,
                               max_seq=64)
    return model, eng


def test_prompt_logits_match_oracle(vl, rng):
    model, eng = vl
    ids, pixels, ar_ids, ar_mask, cam = _inputs(rng)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels),
                    aspect_ratio_ids=torch.tensor(ar_ids),
                    aspect_ratio_mask=torch.tensor(ar_mask),
                    cross_attention_mask=torch.tensor(cam)).logits.numpy()
    got = eng.forward_logits(ids, pixels, ar_ids, ar_mask, cam)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_greedy_generate_matches_oracle(vl, rng):
    model, eng = vl
    ids, pixels, ar_ids, ar_mask, cam = _inputs(rng)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
            cross_attention_mask=torch.tensor(cam), max_new_tokens=8,
            do_sample=False).numpy()[:, ids.shape[1]:]
    got = eng.generate(ids, pixels, ar_ids, ar_mask, cam, max_new_tokens=8)
    np.testing.assert_array_equal(got, ref)


def test_mllama_quantize_save_load_generate(rng, tmp_path):
    """The reference mllama journey, end to end: quantize the self-attention
    decoder layers (the reference never quantizes cross layers either), save
    — vision tower + cross layers carried through fp — reload, and run
    multimodal generate through the public API; the reloaded model matches
    the in-memory quantized model token-for-token."""
    from ganq_tpu import GanqModel, QuantizeConfig

    hf_cfg, model = _tiny_torch_vl(seed=11)
    qcfg = QuantizeConfig(bits=8, group_size=32, quant_method="gptq")
    m = GanqModel.from_torch_model(model, qcfg)
    assert m.vision_state is not None
    assert any(k.startswith("vision_model.") for k in m.vision_state)
    assert any(".cross_attn." in k for k in m.vision_state)
    calib = [rng.integers(1, 200, size=(32,)).astype(np.int32)
             for _ in range(4)]
    m.quantize(calib, batch_size=2)

    d = str(tmp_path / "qmllama")
    m.save(d)
    m2 = GanqModel.load(d)
    assert m2.quantized
    assert m2.vision_state is not None
    for k, v in m.vision_state.items():
        np.testing.assert_array_equal(v, m2.vision_state[k])

    ids, pixels, ar_ids, ar_mask, cam = _inputs(rng)
    m.backend = m2.backend = "reference"
    kw = dict(pixel_values=pixels, aspect_ratio_ids=ar_ids,
              aspect_ratio_mask=ar_mask, cross_attention_mask=cam,
              max_new_tokens=6, max_seq=64)
    a = m.generate(ids, **kw)
    b = m2.generate(ids, **kw)
    np.testing.assert_array_equal(a, b)
    # text-only generate through the same model still works (plain engine,
    # cross layers skipped — the HF text-only path)
    t = m2.generate(ids[:, -4:], max_new_tokens=4, max_seq=64)
    assert t.shape == (1, 4)
