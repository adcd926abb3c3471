"""Ovis-1.6 SigLIP visual tokenizer (models/ovis16_vision.py) vs the
transformers SiglipVisionModel oracle + a numpy head oracle — the last
Ovis gap (VERDICT r4 #8)."""

import numpy as np
import pytest
import torch
import transformers

import jax.numpy as jnp

from ganq_tpu.models import ovis16_vision as ov


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _small_siglip():
    scfg = transformers.SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        num_channels=3)
    torch.manual_seed(5)
    return scfg, transformers.SiglipVisionModel(scfg).eval()


def _state_with_head(rng, m, vocab=32, indicators=5, stride=1, D=64):
    """Ovis-1.6-style flat state: SigLIP backbone under
    visual_tokenizer.backbone.*, the probabilistic head, and the vte."""
    state = {f"visual_tokenizer.backbone.{k}": v.numpy()
             for k, v in m.state_dict().items()}
    hd = D * stride * stride
    state["visual_tokenizer.head.0.weight"] = rng.normal(
        size=(vocab - indicators, hd)).astype(np.float32) * 0.05
    state["visual_tokenizer.head.1.weight"] = np.ones(
        vocab - indicators, np.float32)
    state["visual_tokenizer.head.1.bias"] = np.zeros(
        vocab - indicators, np.float32)
    state["vte.weight"] = rng.normal(size=(vocab, 48)).astype(np.float32)
    return state


def test_siglip_tower_matches_transformers(rng):
    scfg, m = _small_siglip()
    state = _state_with_head(rng, m)
    params = ov.import_vision_params(state)
    cfg = ov.Ovis16VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=scfg.layer_norm_eps)
    px = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.tensor(px)).last_hidden_state.numpy()
    got = np.asarray(ov.siglip_hidden(
        cfg, params["visual_tokenizer"]["backbone"]["vision_model"],
        jnp.asarray(px)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("stride", [1, 2])
def test_image_features_head_oracle(rng, stride):
    """Merge + head + vte vs a direct numpy composition on the tower's
    (already-verified) hidden states."""
    scfg, m = _small_siglip()
    vocab, ind, D = 32, 5, 64
    state = _state_with_head(rng, m, vocab, ind, stride, D)
    params = ov.import_vision_params(state)
    cfg = ov.Ovis16VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=scfg.layer_norm_eps, vocab_size=vocab,
        hidden_stride=stride, num_visual_indicator_tokens=ind)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    feats, indicators = ov.image_features(cfg, params, jnp.asarray(px))

    # numpy oracle
    with torch.no_grad():
        h = m(torch.tensor(px)).last_hidden_state.numpy()  # [1, 4, 64]
    n, L, _ = h.shape
    if stride > 1:
        side = int(round(L ** 0.5))
        h = h.reshape(n, side // stride, stride, side // stride, stride, D)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(n, -1, stride * stride * D)
    logits = h @ state["visual_tokenizer.head.0.weight"].T
    mu = logits.mean(-1, keepdims=True)
    var = ((logits - mu) ** 2).mean(-1, keepdims=True)
    logits = ((logits - mu) / np.sqrt(var + 1e-5)
              * state["visual_tokenizer.head.1.weight"]
              + state["visual_tokenizer.head.1.bias"])
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    probs = np.pad(probs, ((0, 0), (0, 0), (0, ind)))
    ref_feats = probs @ state["vte.weight"]
    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(indicators),
                               state["vte.weight"][vocab - ind:vocab],
                               atol=1e-6)


def test_ovis16_engine_generates(rng):
    """End-to-end: negative placeholder ids (-200 image / -30x indicator,
    the ovis remote-code convention) are spliced with SigLIP tower
    features and the llama decoder generates."""
    import dataclasses

    from ganq_tpu.models import synthetic
    from ganq_tpu.serve.ovis2_vl import Ovis2VLEngine

    scfg, m = _small_siglip()
    vocab, ind, D = 32, 5, 64
    state = _state_with_head(rng, m, vocab, ind, 1, D)
    # vte rows must match the text model's hidden size
    H = 128
    state["vte.weight"] = rng.normal(size=(vocab, H)).astype(np.float32)
    cfg = dataclasses.replace(
        synthetic.llama_config(hidden=H, inter=256, layers=2, heads=4,
                               kv_heads=2, vocab=256, max_pos=128),
        model_type="ovis")
    params = synthetic.make_model(cfg, kind="dense", seed=9) \
        if hasattr(synthetic, "make_model") else None
    if params is None:
        sp = synthetic.make_stacked_model(cfg, kind="dense", seed=9)
        import jax
        layers = [jax.tree_util.tree_map(lambda a: a[i],
                                         sp["layers_stacked"])
                  for i in range(cfg.num_hidden_layers)]
        def unfuse(lp):
            attn = lp["attn"]
            qkv = attn["qkv"]["weight"]
            q_dim, kv = cfg.q_dim, cfg.kv_dim
            from ganq_tpu.ops.qlinear import dense_linear
            return {
                "input_norm": lp["input_norm"],
                "post_norm": lp["post_norm"],
                "attn": {"q": dense_linear(qkv[:q_dim]),
                         "k": dense_linear(qkv[q_dim:q_dim + kv]),
                         "v": dense_linear(qkv[q_dim + kv:]),
                         "o": attn["o"]},
                "mlp": {"gate": dense_linear(
                            lp["mlp"]["gateup"]["weight"][:cfg.intermediate_size]),
                        "up": dense_linear(
                            lp["mlp"]["gateup"]["weight"][cfg.intermediate_size:]),
                        "down": lp["mlp"]["down"]},
            }
        params = {k: v for k, v in sp.items()
                  if k not in ("layers_stacked", "num_layers")}
        params["layers"] = [unfuse(lp) for lp in layers]
    hf = {"visual_tokenizer_config": {
        "vocab_size": vocab, "hidden_stride": 1,
        "num_visual_indicator_tokens": ind, "tokenize_function": "softmax",
        "backbone_config": {
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "image_size": 28, "patch_size": 14}}}
    eng = Ovis2VLEngine.build_ovis16(cfg, params, hf, state, max_seq=64)
    # prompt: [bos-ish, IND1, IMG x4, IND2, text...]
    ids = np.array([[5, -301, -200, -200, -200, -200, -302, 7, 9]],
                   np.int32)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32) * 0.5
    out = eng.generate(ids, pixel_values=px, max_new_tokens=4)
    assert out.shape == (1, 4)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()
