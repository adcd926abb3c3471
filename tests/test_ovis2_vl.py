"""Ovis2 multimodal serving parity vs the transformers oracle.

The reference only quantizes Ovis's inner LLM and serves through HF with the
visual tokenizer in fp (definitions/ovis.py). Here the whole path — AIMv2
vision tower, softmax visual tokenizer, vte embeds splice, quantized decode —
is TPU-native and oracle-tested against the full HF Ovis2 model on random
tiny weights (the test strategy of SURVEY.md §4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ganq_tpu.models import hf_import  # noqa: E402
from ganq_tpu.models import ovis2_vision as ov  # noqa: E402
from ganq_tpu.serve.ovis2_vl import Ovis2VLEngine  # noqa: E402

IMG = 250
INDICATORS = [251, 252, 253, 254, 255]


def _tiny_torch_vl(seed=0):
    from transformers import Ovis2Config, Ovis2ForConditionalGeneration

    cfg = Ovis2Config(
        text_config={"model_type": "qwen2", "vocab_size": 256,
                     "hidden_size": 64, "intermediate_size": 128,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "num_key_value_heads": 2,
                     "max_position_embeddings": 256,
                     "tie_word_embeddings": False},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 2,
                       "patch_size": 4, "image_size": 16, "vocab_size": 64,
                       "hidden_stride": 2, "num_visual_indicator_tokens": 5,
                       "tokenize_function": "softmax"},
        image_token_id=IMG, visual_indicator_token_ids=list(INDICATORS),
        vocab_size=256, hidden_size=64,  # real checkpoints mirror the text values
    )
    for c in (cfg, cfg.vision_config, cfg.text_config):
        c._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = Ovis2ForConditionalGeneration(cfg).eval().float()
    return cfg, model


def _inputs(rng, n_images=1):
    # image_size 16 / patch 4 -> 16 patches; hidden_stride 2 -> 4 tokens/image
    pixels = rng.normal(size=(n_images, 3, 16, 16)).astype(np.float32)
    pre = rng.integers(1, 200, size=3)
    post = rng.integers(1, 200, size=4)
    ids = np.concatenate(
        [pre, [INDICATORS[0]], [IMG] * (4 * n_images), [INDICATORS[1]], post])
    return ids[None, :].astype(np.int64), pixels


@pytest.fixture(scope="module")
def vl():
    hf_cfg, model = _tiny_torch_vl()
    tcfg, tparams = hf_import.params_from_torch_model(model)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    vision_state = ov.extract_vision_state(state)
    assert vision_state is not None
    eng = Ovis2VLEngine.build(tcfg, tparams, hf_cfg.to_dict(), vision_state,
                              max_seq=64)
    return model, eng


def test_vision_tower_parity(vl, rng):
    """Soft visual-token probabilities match HF ``Ovis2VisionModel`` (patch
    embed, AIMv2 encoder, 2x2 hidden_stride merge, head LN + softmax)."""
    model, eng = vl
    _, pixels = _inputs(rng, n_images=2)
    with torch.no_grad():
        ref = model.model.vision_tower(torch.tensor(pixels)).numpy()
    out = np.asarray(ov.visual_tokens(eng.vcfg, eng.vparams,
                                      np.asarray(pixels)))
    k = eng.vcfg.num_visual_indicator_tokens
    np.testing.assert_allclose(out[..., :-k], ref, atol=2e-5, rtol=1e-4)
    assert np.all(out[..., -k:] == 0)  # zero-padded indicator columns


def test_image_features_parity(vl, rng):
    """probs @ vte lookup + indicator rows match ``get_image_features``."""
    model, eng = vl
    _, pixels = _inputs(rng)
    with torch.no_grad():
        ref_feats, ref_ind = model.model.get_image_features(
            torch.tensor(pixels))
    feats, ind = ov.image_features(eng.vcfg, eng.vparams,
                                   np.asarray(pixels))
    np.testing.assert_allclose(np.asarray(feats), ref_feats.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ind), ref_ind.numpy(),
                               atol=2e-6, rtol=1e-5)


def test_prompt_logits_match_oracle(vl, rng):
    model, eng = vl
    ids, pixels = _inputs(rng)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels)).logits.numpy()
    got = eng.forward_logits(ids, pixels)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_greedy_generate_matches_oracle(vl, rng):
    model, eng = vl
    ids, pixels = _inputs(rng)
    with torch.no_grad():
        ref = model.generate(input_ids=torch.tensor(ids),
                             pixel_values=torch.tensor(pixels),
                             max_new_tokens=8, do_sample=False
                             ).numpy()[:, ids.shape[1]:]
    got = eng.generate(ids, pixels, max_new_tokens=8)
    np.testing.assert_array_equal(got, ref)


def test_text_only_generate(vl, rng):
    """No pixels: the engine is the plain decoder (embeds path unused)."""
    model, eng = vl
    ids = rng.integers(1, 200, size=(1, 6)).astype(np.int64)
    with torch.no_grad():
        ref = model.generate(input_ids=torch.tensor(ids), max_new_tokens=6,
                             do_sample=False).numpy()[:, ids.shape[1]:]
    got = eng.generate(ids, None, max_new_tokens=6)
    np.testing.assert_array_equal(got, ref)


def test_ovis2_quantize_save_load_generate(rng, tmp_path):
    """The reference ovis journey end to end: quantize the inner LLM (the
    reference never quantizes the visual tokenizer either), save — vision
    tower + vte carried through fp — reload, and run multimodal generate
    through the public API; the reloaded model matches the in-memory
    quantized model token-for-token."""
    from ganq_tpu import GanqModel, QuantizeConfig

    hf_cfg, model = _tiny_torch_vl(seed=11)
    qcfg = QuantizeConfig(bits=8, group_size=32, quant_method="gptq")
    m = GanqModel.from_torch_model(model, qcfg)
    assert m.vision_state is not None
    assert any(k.startswith("vision_tower.") for k in m.vision_state)
    assert "visual_embeddings_table.weight" in m.vision_state
    calib = [rng.integers(1, 200, size=(32,)).astype(np.int32)
             for _ in range(4)]
    m.quantize(calib, batch_size=2)

    d = str(tmp_path / "qovis2")
    m.save(d)
    m2 = GanqModel.load(d)
    assert m2.quantized
    assert m2.vision_state is not None
    for k, v in m.vision_state.items():
        np.testing.assert_array_equal(v, m2.vision_state[k])

    ids, pixels = _inputs(rng)
    m.backend = m2.backend = "reference"
    kw = dict(pixel_values=pixels, max_new_tokens=6, max_seq=64)
    a = m.generate(ids, **kw)
    b = m2.generate(ids, **kw)
    np.testing.assert_array_equal(a, b)
    # text-only generate through the same model still works (plain engine)
    t = m2.generate(ids[:, -4:], max_new_tokens=4, max_seq=64)
    assert t.shape == (1, 4)
