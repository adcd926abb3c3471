"""Qwen2-VL multimodal SERVING parity vs HuggingFace transformers.

The reference serves VL checkpoints through HF generate with the fp vision
tower intact (definitions/qwen2_vl.py); here the whole path — vision tower,
M-RoPE position assignment, image-token embedding splice, decode — is
TPU-native and oracle-tested against the full HF VL model on random tiny
weights (the test strategy of SURVEY.md §4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.models import hf_import  # noqa: E402
from ganq_tpu.models import qwen2_vl_vision as vlm  # noqa: E402
from ganq_tpu.serve.vl import VLEngine  # noqa: E402

IMG, VID, VSTART = 251, 252, 250


def tiny_vl_model(seed=7):
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        image_token_id=IMG, video_token_id=VID, vision_start_token_id=VSTART,
        vision_config={"depth": 2, "embed_dim": 32, "hidden_size": 64,
                       "num_heads": 2, "in_channels": 3, "patch_size": 4,
                       "spatial_merge_size": 2, "temporal_patch_size": 2,
                       "hidden_act": "quick_gelu", "mlp_ratio": 4},
    )
    torch.manual_seed(seed)
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    return model


def to_vl_engine(model):
    cfg, params = hf_import.params_from_torch_model(model)
    hf = model.config.to_dict()
    vcfg, toks = vlm.vision_config_from_hf(hf)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    vparams = vlm.import_vision_params(state, vcfg)
    return VLEngine(cfg, params, vcfg, vparams, toks, max_seq=256)


def make_image_inputs(rng, grid=(1, 4, 4)):
    """Random processor-style flattened patches for one image."""
    t, h, w = grid
    patch_dim = 3 * 2 * 4 * 4  # C * tps * ps * ps
    pixels = rng.standard_normal((t * h * w, patch_dim)).astype(np.float32)
    return pixels, np.asarray([grid])


def prompt_with_image(rng, n_img_tokens, prefix_len=3, suffix_len=5):
    pre = rng.integers(1, 200, size=prefix_len)
    post = rng.integers(1, 200, size=suffix_len)
    ids = np.concatenate([pre, [VSTART], [IMG] * n_img_tokens, post])
    return ids[None, :].astype(np.int64)


def test_vision_tower_parity(rng):
    """ViT output matches HF Qwen2VisionTransformer exactly (same patch
    order, 2-D rope, per-frame attention blocks, 2x2 merger)."""
    model = tiny_vl_model()
    eng = to_vl_engine(model)
    pixels, grid = make_image_inputs(rng, (2, 4, 4))  # video-ish: 2 frames
    with torch.no_grad():
        ref = model.model.visual(torch.tensor(pixels),
                                 grid_thw=torch.tensor(grid)).numpy()
    out = np.asarray(vlm.vision_forward(eng.vcfg, eng.vparams,
                                        jnp.asarray(pixels), grid))
    assert out.shape == ref.shape == (2 * 4 * 4 // 4, 64)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_get_rope_index_parity(rng):
    """3-D mrope position assignment matches HF get_rope_index, including
    the decode delta, for an image+text batch row and a pure-text row."""
    model = tiny_vl_model()
    eng = to_vl_engine(model)
    ids_img = prompt_with_image(rng, 4)
    ids_txt = rng.integers(1, 200, size=(1, ids_img.shape[1]))
    ids = np.concatenate([ids_img, ids_txt], axis=0)
    grid = np.asarray([[1, 4, 4]])
    ref_pos, ref_delta = model.model.get_rope_index(
        torch.tensor(ids), image_grid_thw=torch.tensor(grid))
    pos, delta = vlm.get_rope_index(ids, grid, None, eng.tokens,
                                    eng.vcfg.spatial_merge_size)
    np.testing.assert_array_equal(pos, ref_pos.numpy())
    np.testing.assert_array_equal(delta, ref_delta.numpy())


def test_vl_forward_logits_parity(rng):
    """Full multimodal forward (vision splice + mrope decoder) matches the
    HF composite model's logits."""
    model = tiny_vl_model()
    eng = to_vl_engine(model)
    pixels, grid = make_image_inputs(rng)
    ids = prompt_with_image(rng, 4)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels),
                    image_grid_thw=torch.tensor(grid)).logits.numpy()
    out = eng.forward_logits(ids, pixel_values=pixels, image_grid_thw=grid)
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)


def test_vl_greedy_generate_parity(rng):
    """End-to-end greedy generation with an image prompt matches HF
    generate token-for-token."""
    model = tiny_vl_model()
    eng = to_vl_engine(model)
    pixels, grid = make_image_inputs(rng)
    ids = prompt_with_image(rng, 4)
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids), pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid), max_new_tokens=8,
            do_sample=False).numpy()[:, ids.shape[1]:]
    out = eng.generate(ids, pixel_values=pixels, image_grid_thw=grid,
                       max_new_tokens=8)
    np.testing.assert_array_equal(out, ref)


def test_vl_video_generate_parity(rng):
    """Video inputs (multi-frame grid through the video token) ride the same
    machinery: greedy parity vs HF."""
    model = tiny_vl_model(seed=9)
    eng = to_vl_engine(model)
    pixels, grid = make_image_inputs(rng, (2, 4, 4))
    n_tokens = 2 * 4 * 4 // 4
    pre = rng.integers(1, 200, size=2)
    post = rng.integers(1, 200, size=4)
    ids = np.concatenate([pre, [VSTART], [VID] * n_tokens, post])[None]
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.tensor(ids),
            pixel_values_videos=torch.tensor(pixels),
            video_grid_thw=torch.tensor(grid), max_new_tokens=6,
            do_sample=False).numpy()[:, ids.shape[1]:]
    out = eng.generate(ids, pixel_values_videos=pixels, video_grid_thw=grid,
                       max_new_tokens=6)
    np.testing.assert_array_equal(out, ref)


def test_vl_quantize_save_load_generate(rng, tmp_path):
    """The reference VL journey, end to end: quantize the text decoder of a
    VL model, save (vision tower carried through fp, like the reference's
    quant_override_files), reload, and run multimodal generate — the reloaded
    model matches the in-memory quantized model token-for-token."""
    from ganq_tpu import GanqModel, QuantizeConfig

    model = tiny_vl_model(seed=11)
    qcfg = QuantizeConfig(bits=8, group_size=32, quant_method="gptq")
    m = GanqModel.from_torch_model(model, qcfg)
    assert m.vision_state is not None and len(m.vision_state) > 0
    calib = [rng.integers(1, 200, size=(32,)).astype(np.int32)
             for _ in range(4)]
    m.quantize(calib, batch_size=2)

    d = str(tmp_path / "qvl")
    m.save(d)
    m2 = GanqModel.load(d)
    assert m2.quantized
    # vision tower round-trips exactly
    assert m2.vision_state is not None
    for k, v in m.vision_state.items():
        np.testing.assert_array_equal(v, m2.vision_state[k])

    pixels, grid = make_image_inputs(rng)
    ids = prompt_with_image(rng, 4)
    m.backend = m2.backend = "reference"
    a = m.generate(ids, max_new_tokens=6, max_seq=128,
                   pixel_values=pixels, image_grid_thw=grid)
    b = m2.generate(ids, max_new_tokens=6, max_seq=128,
                    pixel_values=pixels, image_grid_thw=grid)
    np.testing.assert_array_equal(a, b)
    # text-only generate through the same model still works (plain engine)
    t = m2.generate(ids[:, -4:], max_new_tokens=4, max_seq=64)
    assert t.shape == (1, 4)
