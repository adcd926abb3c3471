"""Fused MoE expert-decode kernel (ops/moe_expert.py) vs the per-expert
reference loop: the slot-steered (routing-as-prefetch) kernel must match
models/transformer._moe_combine within the activation-quantization
tolerance class of the uniform megastep kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganq_tpu.models.transformer import ModelConfig, _moe_forward
from ganq_tpu.ops import qlinear
from ganq_tpu.ops.moe_expert import (moe_expert_decode, moe_mega_fusable,
                                     moe_megapack)
from ganq_tpu.ops.packing import pack_int_rows


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _uniform_lin(rng, out_f, in_f, bits=4):
    qidx = rng.integers(0, 2 ** bits, size=(out_f, in_f)).astype(np.int32)
    # range cap (models/synthetic.py): dequantized weight magnitudes stay
    # comparable across bits so the a8-quantization tolerances hold
    scales = rng.uniform(0.002, 0.008,
                         size=(out_f, in_f // 128)).astype(np.float32) \
        * min(1.0, 16.0 / (1 << bits))
    return qlinear.QLinear(
        "uniform",
        {"qweight": pack_int_rows(jnp.asarray(qidx), bits),
         "scales": jnp.asarray(scales)}, bits, in_f)


def _moe_cfg(E, H, I, k):
    return ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=H,
        intermediate_size=I, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=4, head_dim=H // 4, num_experts=E,
        num_experts_per_tok=k)


def _build(rng, E, H, I, bits=4):
    experts = [{"gate": _uniform_lin(rng, I, H, bits),
                "up": _uniform_lin(rng, I, H, bits),
                "down": _uniform_lin(rng, H, I, bits)} for _ in range(E)]
    router = qlinear.dense_linear(jnp.asarray(
        rng.normal(size=(E, H)).astype(np.float32)))
    return {"router": router, "experts": experts}


@pytest.mark.parametrize("E,H,I,B,k,bits", [
    (4, 256, 512, 8, 2, 4),
    (8, 256, 512, 2, 2, 4),      # S = B*k = 4 < E: union slot-steering
    (4, 512, 8192, 4, 2, 4),     # NG = 2: multi-tile expert walk
    (4, 256, 512, 8, 2, 8),      # w8p-class experts (free-codebook recode)
    (4, 256, 512, 3, 2, 4),      # B below the sublane octet (Bp pad)
])
def test_moe_expert_kernel_parity(rng, E, H, I, B, k, bits):
    moe = _build(rng, E, H, I, bits)
    cfg = _moe_cfg(E, H, I, k)
    assert moe_mega_fusable(cfg, moe, bits)
    mp = moe_megapack(cfg, moe, bits)

    h = jnp.asarray(rng.normal(size=(B, 1, H)).astype(np.float32) * 0.4,
                    jnp.bfloat16)
    # routing exactly as _moe_forward's topk path
    logits = np.asarray(qlinear.apply(moe["router"], h, "reference"),
                        np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    topv, _ = jax.lax.top_k(probs, k)
    sel = probs >= topv[..., -1:]
    gated = jnp.where(sel, probs, 0.0)
    gated = gated / jnp.maximum(jnp.sum(gated, -1, keepdims=True), 1e-9)

    # reference: per-expert dequantized loop (reference backend)
    from ganq_tpu.models.transformer import _moe_combine
    ref = np.asarray(_moe_combine(cfg, moe, h, sel, gated, None,
                                  "reference"), np.float32)

    rows = B
    gb = gated.reshape(rows, E).astype(jnp.float32)
    S = min(E, rows * k)
    _, slot_ids = jax.lax.top_k(jnp.sum(gb, axis=0), S)
    wts = jnp.take(gb, slot_ids, axis=1)
    y = moe_expert_decode(h.reshape(rows, H), mp, slot_ids, wts,
                          bits=bits,
                          interpret=jax.default_backend() == "cpu")
    y = np.asarray(y, np.float32).reshape(B, 1, H)
    # tolerance class of the uniform megastep parity tests: the kernel
    # quantizes activations (per-row x8, per-tile a8) while the reference
    # path runs the dequantized matmul in full precision
    np.testing.assert_allclose(y, ref, atol=6e-2, rtol=6e-2)


def test_moe_combine_fast_path_wiring(rng, monkeypatch):
    """_moe_combine engages the fused kernel when 'mega' operands are
    attached (GANQ_MOE_MEGA=1 forces it under the CPU interpret mode) and
    matches its own reference-path output."""
    E, H, I, B, k = 4, 256, 512, 4, 2
    moe = _build(rng, E, H, I, 4)
    cfg = _moe_cfg(E, H, I, k)
    moe["mega"] = dict(moe_megapack(cfg, moe, 4))
    h = jnp.asarray(rng.normal(size=(B, 1, H)).astype(np.float32) * 0.4,
                    jnp.bfloat16)
    ref = np.asarray(_moe_forward(cfg, {k_: v for k_, v in moe.items()
                                        if k_ != "mega"},
                                  h, None, "reference"), np.float32)
    monkeypatch.setenv("GANQ_MOE_MEGA", "1")
    out = np.asarray(_moe_forward(cfg, moe, h, None, "pallas_a8"),
                     np.float32)
    np.testing.assert_allclose(out, ref, atol=6e-2, rtol=6e-2)


def test_moe_mega_engine_parity(rng, monkeypatch):
    """Full decode path: a quantized MoE model with attached "mega"
    operands (the optimize() flow) generates the same greedy tokens
    through the fused slot-steered kernel as without it."""
    from ganq_tpu.serve import engine as eng

    E, H, I, k = 4, 256, 512, 2
    cfg = _moe_cfg(E, H, I, k)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, vocab_size=256, num_attention_heads=2, num_key_value_heads=2,
        head_dim=128, max_position_embeddings=128)
    key = jax.random.PRNGKey(4)
    ks = iter(jax.random.split(key, 32))

    def dense(out_f, in_f):
        return qlinear.dense_linear(
            jax.random.normal(next(ks), (out_f, in_f), jnp.float32) * 0.05)

    layers = []
    for _ in range(2):
        moe = _build(rng, E, H, I, 4)
        layers.append({
            "input_norm": {"weight": jnp.ones((H,), jnp.float32)},
            "post_norm": {"weight": jnp.ones((H,), jnp.float32)},
            "attn": {"q": dense(256, H), "k": dense(256, H),
                     "v": dense(256, H), "o": dense(H, 256)},
            "moe": moe,
        })
    params = {
        "embed_tokens": {"weight": jax.random.normal(
            next(ks), (256, H), jnp.float32) * 0.02},
        "final_norm": {"weight": jnp.ones((H,), jnp.float32)},
        "lm_head": dense(256, H),
        "layers": layers,
    }
    ids = np.asarray(rng.integers(0, 256, size=(3, 6)), np.int32)

    monkeypatch.setenv("GANQ_MOE_MEGA", "0")
    ref = np.asarray(eng.Engine(cfg=cfg, params=params, max_seq=64,
                                backend="pallas_a8").generate(
        ids, max_new_tokens=5))

    for lp in params["layers"]:
        assert moe_mega_fusable(cfg, lp["moe"], 4)
        lp["moe"]["mega"] = dict(moe_megapack(cfg, lp["moe"], 4))
    monkeypatch.setenv("GANQ_MOE_MEGA", "1")
    got = np.asarray(eng.Engine(cfg=cfg, params=params, max_seq=64,
                                backend="pallas_a8").generate(
        ids, max_new_tokens=5))
    agree = (got == ref).mean()
    assert agree >= 0.9, f"moe mega path disagrees: {got} vs {ref}"
