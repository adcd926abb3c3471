"""Multimodal calibration capture (models/vl_calib.py): layer-0 input
capture from a torch model, pre-embedded calibration through the API, and
equivalence with token-id calibration (same embeddings -> same artifacts)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ganq_tpu.api import GanqModel, prepare_dataset
from ganq_tpu.core.config import QuantizeConfig
from ganq_tpu.models.vl_calib import capture_decoder_inputs


def tiny_torch(seed=0, vocab=128, hidden=48):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg)


class FakeVL(torch.nn.Module):
    """A composite 'VL' wrapper: merges a learned image embedding into the
    token stream before the language model — capture must see the merged
    layer-0 input."""

    def __init__(self, lm):
        super().__init__()
        self.lm = lm
        self.vision = torch.nn.Linear(7, lm.config.hidden_size)

    def forward(self, input_ids=None, pixel_values=None, **kw):
        emb = self.lm.model.embed_tokens(input_ids)
        if pixel_values is not None:
            img = self.vision(pixel_values)          # [b, n_img, hidden]
            emb = torch.cat([img, emb], dim=1)
        return self.lm(inputs_embeds=emb)


def test_capture_matches_embedding(rng):
    tm = tiny_torch()
    ids = rng.integers(1, 128, size=(2, 10)).astype(np.int64)
    rows = capture_decoder_inputs(tm, [{"input_ids": ids}])
    assert len(rows) == 2
    want = tm.model.embed_tokens(torch.as_tensor(ids)).detach().numpy()
    got = np.stack([r["inputs_embeds"] for r in rows])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_capture_through_vision_merge(rng):
    tm = FakeVL(tiny_torch(1))
    ids = rng.integers(1, 128, size=(1, 6)).astype(np.int64)
    px = rng.standard_normal((1, 3, 7)).astype(np.float32)
    rows = capture_decoder_inputs(
        tm, [{"input_ids": ids, "pixel_values": px}])
    assert rows[0]["inputs_embeds"].shape == (9, 48)  # 3 img + 6 text tokens


def test_embeds_calibration_equals_token_calibration(rng):
    """Feeding the captured layer-0 inputs must produce the same quantized
    artifacts as feeding the token ids (identical Hessians)."""
    tm = tiny_torch(2)
    qcfg = QuantizeConfig(bits=4, group_size=16, quant_method="gptq",
                          act_sort="none", desc_act=False)
    calib_ids = [rng.integers(1, 128, size=(24,)).astype(np.int32)
                 for _ in range(3)]

    m1 = GanqModel.from_torch_model(tiny_torch(2), qcfg)
    m1.quantize(calib_ids, batch_size=1)

    rows = capture_decoder_inputs(
        tm, [{"input_ids": ids[None].astype(np.int64)} for ids in calib_ids])
    m2 = GanqModel.from_torch_model(tiny_torch(2), QuantizeConfig(
        bits=4, group_size=16, quant_method="gptq", act_sort="none",
        desc_act=False))
    m2.quantize(rows, batch_size=1)

    a1 = m1._quant_output.artifacts
    a2 = m2._quant_output.artifacts
    assert a1.keys() == a2.keys()
    for k in a1:
        np.testing.assert_allclose(np.asarray(a1[k].scale),
                                   np.asarray(a2[k].scale), atol=1e-4,
                                   rtol=1e-3)
        agree = np.mean(np.asarray(a1[k].qidx) == np.asarray(a2[k].qidx))
        assert agree > 0.99, (k, agree)


def test_prepare_dataset_mixed_rows(rng):
    ids = rng.integers(1, 99, size=(12,)).astype(np.int32)
    emb = rng.standard_normal((7, 48)).astype(np.float32)
    batches = prepare_dataset([ids, {"inputs_embeds": emb}, emb], None,
                              batch_size=2)
    kinds = sorted(str(b.dtype)[:5] for b in batches)
    assert kinds == ["float", "int32"]
    fb = [b for b in batches if b.dtype != np.int32][0]
    assert fb.shape == (2, 7, 48)
