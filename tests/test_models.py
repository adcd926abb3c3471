"""Forward parity of the functional decoder vs HuggingFace transformers
(random-initialized tiny models, fp32, CPU torch) — the model-correctness
oracle that replaces downloading real checkpoints in this environment."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ganq_tpu.models import hf_import, transformer  # noqa: E402

ATOL = 2e-3


def _compare(model, input_ids):
    model = model.eval().float()
    with torch.no_grad():
        ref = model(torch.tensor(input_ids)).logits.numpy()
    cfg, params = hf_import.params_from_torch_model(model)
    out = np.asarray(transformer.forward(cfg, params, jnp.asarray(input_ids)))
    np.testing.assert_allclose(out, ref, atol=ATOL, rtol=1e-3)
    return cfg, params


def test_opt_forward_parity(rng):
    hf_cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=64,
        activation_function="relu",
    )
    torch.manual_seed(0)
    model = transformers.OPTForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 24))
    _compare(model, ids)


def test_opt_350m_style_parity(rng):
    """project_in/out + post-norm ordering (do_layer_norm_before=False)."""
    hf_cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        do_layer_norm_before=False, word_embed_proj_dim=32,
    )
    torch.manual_seed(1)
    model = transformers.OPTForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 16))
    cfg, params = _compare(model, ids)
    assert "project_in" in params and "project_out" in params


def test_llama_forward_parity(rng):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.LlamaForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 20))
    _compare(model, ids)


def test_llama32_style_parity(rng):
    """Tied embeddings + llama3 rope scaling (Llama-3.2-1B config shape)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=500000.0,
        tie_word_embeddings=True,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
    )
    torch.manual_seed(3)
    model = transformers.LlamaForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 96))  # beyond original_max to hit scaling
    cfg, params = _compare(model, ids)
    assert "lm_head" not in params  # tied


def test_taps_shapes(rng):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2)
    torch.manual_seed(4)
    model = transformers.LlamaForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 8)))
    pos = jnp.broadcast_to(jnp.arange(8), (2, 8))
    x = transformer.embed(cfg, params, ids, pos)
    rope = transformer.rope_tables(cfg, pos)
    mask = transformer.causal_mask(8, 8)
    y, _, taps = transformer.layer_forward(cfg, params["layers"][0], x, mask, rope,
                                           want_taps=True)
    assert set(taps) == {"attn.q", "attn.k", "attn.v", "attn.o",
                         "mlp.gate", "mlp.up", "mlp.down"}
    assert taps["attn.q"].shape == (2, 8, 32)
    assert taps["mlp.down"].shape == (2, 8, 64)
    assert y.shape == x.shape


def test_gpt2_forward_parity(rng):
    hf_cfg = transformers.GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        n_inner=128, activation_function="gelu_new",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(5)
    model = transformers.GPT2LMHeadModel(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 24))
    _compare(model, ids)


def test_gemma_forward_parity(rng):
    hf_cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        hidden_activation="gelu_pytorch_tanh")
    torch.manual_seed(6)
    model = transformers.GemmaForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 16))
    _compare(model, ids)


def test_qwen2_forward_parity(rng):
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(7)
    model = transformers.Qwen2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    _compare(model, ids)


def test_mixtral_forward_parity(rng):
    hf_cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128)
    torch.manual_seed(8)
    model = transformers.MixtralForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.num_experts == 4
    assert len(params["layers"][0]["moe"]["experts"]) == 4


def test_mixtral_quantize_end_to_end(rng):
    from ganq_tpu.core.config import QuantizeConfig
    from ganq_tpu.models.registry import get_spec
    from ganq_tpu.quant.looper import quantize_model

    hf_cfg = transformers.MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128)
    torch.manual_seed(9)
    model = transformers.MixtralForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    spec = get_spec("mixtral").expand(cfg.num_experts)
    assert "block_sparse_moe.experts.3.w2" in spec.module_slots

    batches = [rng.integers(0, 256, size=(2, 32)).astype(np.int32)
               for _ in range(3)]
    out = quantize_model(cfg, params, spec, QuantizeConfig(
        bits=4, quant_method="ganq", ganq_iterations=2,
        act_sort="asc", l_damp_style="ganq", dead="mean"), batches)
    # 4 attn + 4 experts x 3 linears (some experts may be skipped if unrouted)
    assert len(out.artifacts) >= 10
    ids = jnp.asarray(rng.integers(0, 256, size=(1, 16)))
    a = np.asarray(transformer.forward(cfg, p_ref, ids), np.float32)
    b = np.asarray(transformer.forward(cfg, out.params, ids), np.float32)
    assert np.mean((a - b) ** 2) < np.var(a) * 0.5


def test_phi3_forward_parity(rng):
    hf_cfg = transformers.Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0)
    torch.manual_seed(10)
    model = transformers.Phi3ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    _compare(model, ids)


def test_unsupported_arch_fails_loudly():
    from ganq_tpu.models.registry import get_spec
    import pytest as _pt
    with _pt.raises(KeyError, match="Unsupported architecture"):
        get_spec("not_a_real_arch")
    get_spec("hymba")  # round 3: hybrid attn/SSM arch is now registered


def test_qwen3_forward_parity(rng):
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128)
    torch.manual_seed(13)
    model = transformers.Qwen3ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.qk_norm
    assert "q_norm" in params["layers"][0]["attn"]


def test_starcoder2_forward_parity(rng):
    hf_cfg = transformers.Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, use_bias=True,
        residual_dropout=0.0, embedding_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(14)
    model = transformers.Starcoder2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    _compare(model, ids)


def test_gpt_neox_forward_parity(rng):
    """Pythia family: parallel residual, partial rotary, interleaved fused
    query_key_value."""
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.25,
        use_parallel_residual=True,
        hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(15)
    model = transformers.GPTNeoXForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.parallel_residual and cfg.rotary_dim == 4


def test_bloom_forward_parity(rng):
    """ALiBi attention + embedding layernorm + interleaved fused QKV."""
    hf_cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(16)
    model = transformers.BloomForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.pos == "alibi" and "embed_norm" in params


def test_falcon_forward_parity(rng):
    """Falcon-7b style: parallel attention with a single shared layernorm,
    multi-query attention, fused QKV."""
    hf_cfg = transformers.FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(18)
    model = transformers.FalconForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.num_key_value_heads == 1 and cfg.parallel_residual


def test_olmo2_forward_parity(rng):
    """OLMo2: post-sublayer norms (x += norm(sublayer(x))) + flat q/k
    RMSNorms applied before the head reshape."""
    hf_cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attention_dropout=0.0)
    torch.manual_seed(19)
    model = transformers.Olmo2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.norm_after_sublayer and cfg.qk_norm == "flat"
    # flat norms span the whole projection, not one head
    assert params["layers"][0]["attn"]["q_norm"]["weight"].shape == (cfg.q_dim,)
    assert params["layers"][0]["attn"]["k_norm"]["weight"].shape == (cfg.kv_dim,)


def test_stablelm_forward_parity(rng):
    """StableLM: gated MLP + LayerNorm with bias + partial rotary + qkv bias."""
    hf_cfg = transformers.StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, partial_rotary_factor=0.5,
        use_qkv_bias=True, attention_dropout=0.0, hidden_dropout=0.0)
    torch.manual_seed(20)
    model = transformers.StableLmForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.norm == "layernorm" and cfg.rotary_dim == 8
    assert "bias" in params["layers"][0]["input_norm"]
    assert params["layers"][0]["attn"]["q"]["bias"] is not None


def test_stablelm_unsupported_variants_raise():
    from ganq_tpu.models.registry import get_spec
    spec = get_spec("stablelm")
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_hidden_layers=1, num_attention_heads=2,
                num_key_value_heads=2)
    with pytest.raises(NotImplementedError):
        spec.make_config({**base, "qk_layernorm": True})
    with pytest.raises(NotImplementedError):
        spec.make_config({**base, "use_parallel_residual": True})


def test_gemma2_forward_parity(rng):
    """Sandwich norms, attn/logit softcaps, query_pre_attn_scalar, and a
    sliding window SMALLER than the sequence so the alternate-layer window
    mask actually changes the output."""
    hf_cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, query_pre_attn_scalar=16,
        sliding_window=8, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
    )
    torch.manual_seed(40)
    model = transformers.Gemma2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 24))  # 24 > window=8
    cfg, params = _compare(model, ids)
    assert cfg.sandwich_norm and cfg.attn_softcap == 50.0
    assert cfg.layer_window(0) == 8 and cfg.layer_window(1) is None


def test_gemma2_engine_matches_forward(rng):
    """Cached decode must reproduce the no-cache forward argmax path —
    exercises the sliding-window mask against a padded KV cache."""
    from ganq_tpu.serve.engine import Engine

    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64, query_pre_attn_scalar=16,
        sliding_window=8,
    )
    torch.manual_seed(41)
    cfg, params = hf_import.params_from_torch_model(
        transformers.Gemma2ForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    out = Engine(cfg, params, max_seq=48).generate(prompt, max_new_tokens=8)

    # oracle: greedy re-decode via the full no-cache forward
    ids = prompt.copy()
    for _ in range(8):
        logits = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)))
        nxt = int(np.argmax(logits[0, -1]))
        ids = np.concatenate([ids, [[nxt]]], axis=1)
    np.testing.assert_array_equal(out[0], ids[0, 12:])


def test_gptj_forward_parity(rng):
    """Parallel residual off one shared ln_1 + interleaved partial rotary."""
    hf_cfg = transformers.GPTJConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        rotary_dim=8, n_inner=None, activation_function="gelu_new",
    )
    torch.manual_seed(42)
    model = transformers.GPTJForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 20))
    cfg, _ = _compare(model, ids)
    assert cfg.rope_interleaved and cfg.parallel_residual


def test_phi_forward_parity(rng):
    """Phi-2 style: parallel residual, half-split partial rotary, biases."""
    hf_cfg = transformers.PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
    )
    torch.manual_seed(43)
    model = transformers.PhiForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 20))
    cfg, params = _compare(model, ids)
    assert cfg.parallel_residual and not cfg.rope_interleaved
    assert params["lm_head"].arrays.get("bias") is not None


def test_codegen_forward_parity(rng):
    """Fused qkv with mp_num=4 (query, value, key) block layout."""
    hf_cfg = transformers.CodeGenConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        rotary_dim=8,
    )
    torch.manual_seed(44)
    model = transformers.CodeGenForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 20))
    _compare(model, ids)


def test_cohere_forward_parity(rng):
    """Shared-norm parallel residual, bias-free LayerNorm, interleaved
    full-dim rope, logit_scale, per-head q/k norms (command-r-plus style)."""
    hf_cfg = transformers.CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, logit_scale=0.25, use_qk_norm=True,
    )
    torch.manual_seed(45)
    model = transformers.CohereForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.logit_scale == 0.25 and cfg.qk_norm == "cohere"


def test_granite_forward_parity(rng):
    """The four granite multipliers must all bite."""
    hf_cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, embedding_multiplier=2.0,
        residual_multiplier=0.5, attention_multiplier=0.2,
        logits_scaling=3.0, tie_word_embeddings=False,
    )
    torch.manual_seed(46)
    model = transformers.GraniteForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.residual_multiplier == 0.5 and cfg.attn_scale == 0.2


def test_glm_forward_parity(rng):
    """Interleaved partial rotary + fused gate_up split."""
    hf_cfg = transformers.GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, max_position_embeddings=128,
        pad_token_id=0,
    )
    torch.manual_seed(47)
    model = transformers.GlmForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.rope_interleaved and cfg.rotary_dim == 8


def test_mpt_forward_parity(rng):
    """Mosaic-grid ALiBi (6 heads exercises the odd/even interleave) +
    clip_qkv + bias-free linears."""
    hf_cfg = transformers.MptConfig(
        vocab_size=256, d_model=48, n_heads=6, n_layers=2, max_seq_len=128,
        expansion_ratio=4,
        attn_config={"alibi": True, "clip_qkv": 3.0},
    )
    torch.manual_seed(48)
    model = transformers.MptForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.alibi_kind == "mpt" and cfg.clip_qkv == 3.0


def test_gpt_bigcode_forward_parity(rng):
    """MQA fused c_attn split + learned positions."""
    hf_cfg = transformers.GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        multi_query=True,
    )
    torch.manual_seed(49)
    model = transformers.GPTBigCodeForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.num_key_value_heads == 1


def test_gpt_bigcode_mha_variant_parity(rng):
    hf_cfg = transformers.GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
        multi_query=False,
    )
    torch.manual_seed(50)
    model = transformers.GPTBigCodeForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 12))
    cfg, _ = _compare(model, ids)
    assert cfg.num_key_value_heads == 4


def test_qwen2_moe_forward_parity(rng):
    """Shared expert + sigmoid gate + NO top-k renorm (norm_topk_prob off)."""
    hf_cfg = transformers.Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(51)
    model = transformers.Qwen2MoeForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert not cfg.moe_norm_topk
    assert "shared" in params["layers"][0]["moe"]


def test_qwen3_moe_forward_parity(rng):
    hf_cfg = transformers.Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128,
    )
    torch.manual_seed(52)
    model = transformers.Qwen3MoeForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.qk_norm is True and cfg.moe_norm_topk


def test_olmoe_forward_parity(rng):
    hf_cfg = transformers.OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(53)
    model = transformers.OlmoeForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.qk_norm == "flat"


def test_gemma3_forward_parity(rng):
    """Dual rope (local theta on sliding layers), per-head (1+w) q/k norms,
    sandwich norms; 7 layers exercise the 5:1 sliding pattern boundary and a
    window smaller than the sequence."""
    hf_cfg = transformers.Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, query_pre_attn_scalar=16,
        sliding_window=8, rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
    )
    torch.manual_seed(54)
    model = transformers.Gemma3ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 24))
    cfg, _ = _compare(model, ids)
    assert cfg.rope_local_theta == 10_000.0
    assert cfg.layer_window(0) == 8 and cfg.layer_window(5) is None


def test_gemma3_stacked_greedy_matches_unrolled(rng):
    """The dual-rope where-select in the stacked layer scan must match the
    unrolled engine's static per-layer table choice."""
    from ganq_tpu.serve import engine, stacked

    hf_cfg = transformers.Gemma3TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64, query_pre_attn_scalar=16,
        sliding_window=8,
    )
    torch.manual_seed(55)
    cfg, params = hf_import.params_from_torch_model(
        transformers.Gemma3ForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    ref = engine.Engine(cfg, params, max_seq=32).generate(prompt,
                                                          max_new_tokens=8)
    sp = stacked.stack_layers(params)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, 1, 32)
    out = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv,
                                           jnp.asarray(prompt), 8))
    np.testing.assert_array_equal(out, ref)


def test_deepseek_v2_forward_parity(rng):
    """MLA (q bottleneck + compressed kv + rope/nope split) with
    group-limited greedy MoE routing, shared experts, one leading dense
    layer."""
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, topk_method="group_limited_greedy",
        norm_topk_prob=False, routed_scaling_factor=1.5,
        first_k_dense_replace=1, max_position_embeddings=128,
    )
    torch.manual_seed(56)
    model = transformers.DeepseekV2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.mla and cfg.moe_routed_scale == 1.5
    assert "moe" not in params["layers"][0]          # dense first layer
    assert "shared" in params["layers"][1]["moe"]
    assert "shared_gate" not in params["layers"][1]["moe"]  # ungated


def test_deepseek_v2_lite_style_parity(rng):
    """q_lora_rank=None: direct q_proj, greedy routing."""
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=4, n_shared_experts=2, num_experts_per_tok=2,
        topk_method="greedy", first_k_dense_replace=0,
        max_position_embeddings=128,
    )
    torch.manual_seed(57)
    model = transformers.DeepseekV2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 12))
    cfg, params = _compare(model, ids)
    assert cfg.q_lora_rank is None
    assert params["layers"][0]["attn"]["q"] is not None


def test_deepseek_v3_forward_parity(rng):
    """Sigmoid scores + e_score_correction_bias selection (noaux_tc top-2
    group sum) + renormalized weights + routed scaling."""
    hf_cfg = transformers.DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=4, topk_group=2, norm_topk_prob=True,
        routed_scaling_factor=2.5, first_k_dense_replace=1,
        max_position_embeddings=128,
    )
    torch.manual_seed(58)
    model = transformers.DeepseekV3ForCausalLM(hf_cfg)
    # give the correction bias real (nonzero) values so the test covers the
    # biased-choice/unbiased-weight split
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.normal_(0, 0.5)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.moe_scoring == "sigmoid" and cfg.moe_topk_method == "noaux_tc"


def test_deepseek_v2_engine_matches_forward(rng):
    """Cached MLA decode (asymmetric k/v cache dims) vs the no-cache oracle."""
    from ganq_tpu.serve.engine import Engine

    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=12, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="greedy", first_k_dense_replace=0,
        max_position_embeddings=64,
    )
    torch.manual_seed(59)
    cfg, params = hf_import.params_from_torch_model(
        transformers.DeepseekV2ForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    out = Engine(cfg, params, max_seq=32).generate(prompt, max_new_tokens=6)
    ids = prompt.copy()
    for _ in range(6):
        logits = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)))
        ids = np.concatenate([ids, [[int(np.argmax(logits[0, -1]))]]], axis=1)
    np.testing.assert_array_equal(out[0], ids[0, 10:])


def test_deepseek_v2_quantize_end_to_end(rng):
    """The looper must tap and quantize the MLA bottleneck projections
    (q_a/q_b/kv_a/kv_b) plus routed/shared experts."""
    from ganq_tpu.core.config import QuantizeConfig
    from ganq_tpu.models.registry import get_spec
    from ganq_tpu.quant.looper import quantize_model

    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="greedy", first_k_dense_replace=0,
        max_position_embeddings=128,
    )
    torch.manual_seed(60)
    model = transformers.DeepseekV2ForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    _, p_ref = hf_import.params_from_torch_model(model)
    spec = get_spec("deepseek_v2").expand(cfg.num_experts)

    batches = [rng.integers(0, 256, size=(2, 32)).astype(np.int32)
               for _ in range(3)]
    out = quantize_model(cfg, params, spec, QuantizeConfig(
        bits=4, quant_method="gptq", group_size=8), batches)
    names = set(out.artifacts)
    for m in ("self_attn.q_a_proj", "self_attn.q_b_proj",
              "self_attn.kv_a_proj_with_mqa", "self_attn.kv_b_proj",
              "self_attn.o_proj", "mlp.shared_experts.down_proj"):
        assert f"model.layers.0.{m}" in names, m
    ids = jnp.asarray(rng.integers(0, 256, size=(1, 16)))
    a = np.asarray(transformer.forward(cfg, p_ref, ids), np.float32)
    b = np.asarray(transformer.forward(cfg, out.params, ids), np.float32)
    assert np.mean((a - b) ** 2) < np.var(a) * 0.5


def test_deepseek_v2_yarn_parity(rng):
    """Yarn rope scaling with deepseek's mscale/mscale_all_dim attention
    factor (the real v2/v3 checkpoint configuration)."""
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="greedy", first_k_dense_replace=0,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "yarn", "factor": 4.0, "beta_fast": 32,
                      "beta_slow": 1, "mscale": 0.707, "mscale_all_dim": 0.707,
                      "original_max_position_embeddings": 32},
    )
    torch.manual_seed(61)
    model = transformers.DeepseekV2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 64))  # beyond original_max
    _compare(model, ids)


def test_llama_yarn_parity(rng):
    """Plain yarn (no mscale keys) through the llama family."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
        rope_scaling={"rope_type": "yarn", "factor": 8.0,
                      "original_max_position_embeddings": 32},
    )
    torch.manual_seed(62)
    model = transformers.LlamaForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(1, 64))
    _compare(model, ids)


def test_dbrx_forward_parity(rng):
    """Fused Wqkv + clip, fused [E*ffn, h] expert tensors split at import,
    top-k sum-renormalized router."""
    hf_cfg = transformers.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128, vocab_size=256,
        attn_config={"kv_n_heads": 2, "clip_qkv": 4.0},
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                    "moe_top_k": 2},
    )
    torch.manual_seed(63)
    model = transformers.DbrxForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.clip_qkv == 4.0 and cfg.num_experts == 4
    assert len(params["layers"][0]["moe"]["experts"]) == 4


def test_nemotron_forward_parity(rng):
    """LayerNorm1P (w-1 storage, bias untouched) + squared ReLU + partial
    rotary."""
    hf_cfg = transformers.NemotronConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, hidden_act="relu2",
        max_position_embeddings=128,
    )
    torch.manual_seed(64)
    model = transformers.NemotronForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare(model, ids)
    assert cfg.act == "relu2" and cfg.rms_offset == 1.0


def test_exaone4_forward_parity(rng):
    """Hybrid sliding/NoPE: sliding layers rotate, full layers don't (the
    identity-table path), post-sublayer norms, per-head qk norms; 4 layers
    cover the 3:1 boundary with window < seq."""
    hf_cfg = transformers.Exaone4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=8, sliding_window_pattern=4,
        max_position_embeddings=128,
    )
    torch.manual_seed(65)
    model = transformers.Exaone4ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 24))  # seq > window
    cfg, _ = _compare(model, ids)
    assert cfg.rope_nope_full and cfg.norm_after_sublayer
    assert cfg.layer_window(3) is None and cfg.layer_window(0) == 8


def test_exaone4_stacked_matches_unrolled(rng):
    """NoPE-as-identity-table must survive the stacked scan's where-select."""
    from ganq_tpu.serve import engine, stacked

    hf_cfg = transformers.Exaone4Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
        sliding_window=8, sliding_window_pattern=4,
        max_position_embeddings=64,
    )
    torch.manual_seed(66)
    cfg, params = hf_import.params_from_torch_model(
        transformers.Exaone4ForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    ref = engine.Engine(cfg, params, max_seq=32).generate(prompt,
                                                          max_new_tokens=8)
    sp = stacked.stack_layers(params)
    ck, cv = stacked.init_cache(cfg, cfg.num_hidden_layers, 1, 32)
    out = np.asarray(stacked.greedy_decode(cfg, sp, ck, cv,
                                           jnp.asarray(prompt), 8))
    np.testing.assert_array_equal(out, ref)


def test_phimoe_forward_parity(rng):
    """Sparsemixer routing (unnormalized per-winner masked softmaxes),
    LayerNorm-with-bias norms, attention + lm_head biases."""
    hf_cfg = transformers.PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=8, num_experts_per_tok=2,
        router_jitter_noise=0.01, input_jitter_noise=0.0,
        attention_bias=True, lm_head_bias=True,
        max_position_embeddings=128, rope_theta=10000.0,
    )
    torch.manual_seed(67)
    model = transformers.PhimoeForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare(model, ids)
    assert cfg.moe_router_mode == "sparsemixer" and cfg.num_experts == 8
    assert "bias" in params["lm_head"].arrays


def test_cohere2_forward_parity(rng):
    """Parallel residual off one shared norm + interleaved rope on sliding
    layers only (full layers NoPE); logit_scale; tied embeddings. 4 layers
    cover a full-attention layer, seq > window."""
    hf_cfg = transformers.Cohere2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=8, logit_scale=0.25, tie_word_embeddings=True,
        layer_types=["sliding_attention", "sliding_attention",
                     "sliding_attention", "full_attention"],
        max_position_embeddings=128,
    )
    torch.manual_seed(68)
    model = transformers.Cohere2ForCausalLM(hf_cfg)
    ids = rng.integers(0, 256, size=(2, 24))  # seq > window
    cfg, _ = _compare(model, ids)
    assert cfg.rope_nope_full and cfg.parallel_residual
    assert cfg.layer_window(0) == 8 and cfg.layer_window(3) is None


# ---------------------------------------------------------------------------
# Remote-code architectures (no local transformers class): build a local
# oracle model, refactor its weights INTO the foreign checkpoint layout
# (fused packs, renamed tensors), then check our importer + forward
# reproduces the oracle's logits from that foreign-layout state dict.

def _np_state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _compare_state(hf_cfg_dict, state, model, input_ids, atol=ATOL):
    model = model.eval().float()
    with torch.no_grad():
        ref = model(torch.tensor(input_ids)).logits.numpy()
    cfg, params = hf_import.params_from_state_dict(state, hf_cfg_dict)
    out = np.asarray(transformer.forward(cfg, params, jnp.asarray(input_ids)))
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-3)
    return cfg, params


def test_baichuan_wpack_parity(rng):
    """W_pack fused qkv split; llama forward otherwise (7B-style rope)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rms_norm_eps=1e-6)
    torch.manual_seed(70)
    model = transformers.LlamaForCausalLM(hf_cfg)
    state = {}
    for k, v in _np_state(model).items():
        if ".q_proj." in k:
            base = k.replace("q_proj", "{}")
            q = v
            kk = _np_state(model)[k.replace("q_proj", "k_proj")]
            vv = _np_state(model)[k.replace("q_proj", "v_proj")]
            state[base.format("W_pack")] = np.concatenate([q, kk, vv], 0)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            state[k] = v
    cfg_dict = {"model_type": "baichuan", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 4,
                "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, state, model, ids)
    assert cfg.pos == "rope"


def test_baichuan_alibi_and_normhead():
    """13B-style config selects ALiBi; Baichuan2-size vocab normalizes
    lm_head rows (NormHead inference semantics)."""
    from ganq_tpu.models import registry as R
    cfg = R.get_spec("baichuan").make_config(
        {"model_type": "baichuan", "vocab_size": 64000, "hidden_size": 5120,
         "intermediate_size": 13696, "num_hidden_layers": 2,
         "num_attention_heads": 40})
    assert cfg.pos == "alibi"
    w = np.random.default_rng(0).normal(size=(8, 4)).astype(np.float32)
    out = R._baichuan_convert_state({"lm_head.weight": w},
                                    {"vocab_size": 125696, "hidden_size": 4})
    np.testing.assert_allclose(
        np.linalg.norm(out["lm_head.weight"], axis=1), 1.0, atol=1e-6)


def test_internlm_bias_parity(rng):
    """llama + q/k/v/o biases (config.bias), llama tensor names."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        attention_bias=True, max_position_embeddings=128)
    torch.manual_seed(71)
    model = transformers.LlamaForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "internlm", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "bias": True,
                "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert "bias" in params["layers"][0]["attn"]["o"].arrays


def test_internlm2_wqkv_parity(rng):
    """Grouped wqkv layout ([kv_heads, q_per_group+2, head_dim, hidden]) +
    internlm2 tensor names (tok_embeddings, feed_forward.w1/w3/w2)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(72)
    model = transformers.LlamaForCausalLM(hf_cfg)
    hd, kv, qpg = 16, 2, 2
    state = {}
    for k, v in _np_state(model).items():
        k2 = (k.replace("model.embed_tokens", "model.tok_embeddings")
               .replace("input_layernorm", "attention_norm")
               .replace("post_attention_layernorm", "ffn_norm")
               .replace("self_attn.o_proj", "attention.wo")
               .replace("mlp.gate_proj", "feed_forward.w1")
               .replace("mlp.up_proj", "feed_forward.w3")
               .replace("mlp.down_proj", "feed_forward.w2"))
        k2 = k2.replace("lm_head.weight", "output.weight")
        if ".q_proj." in k:
            q = v.reshape(kv, qpg, hd, 64)
            kk = _np_state(model)[k.replace("q_proj", "k_proj")].reshape(kv, 1, hd, 64)
            vv = _np_state(model)[k.replace("q_proj", "v_proj")].reshape(kv, 1, hd, 64)
            state[k2.replace("self_attn.q_proj", "attention.wqkv")] = \
                np.concatenate([q, kk, vv], 1).reshape(-1, 64)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            state[k2] = v
    cfg_dict = {"model_type": "internlm2", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    _compare_state(cfg_dict, state, model, ids)


def test_qwen1_parity(rng):
    """Fused biased c_attn split + halved-MLP convention (w1=up, w2=gate at
    intermediate_size//2); qwen2 is the oracle (same bias pattern)."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, rope_theta=5000.0, rms_norm_eps=1e-6)
    torch.manual_seed(73)
    model = transformers.Qwen2ForCausalLM(hf_cfg)
    raw = _np_state(model)
    state = {}
    for k, v in raw.items():
        k2 = (k.replace("model.embed_tokens", "transformer.wte")
               .replace("model.norm", "transformer.ln_f")
               .replace("model.layers.", "transformer.h.")
               .replace("input_layernorm", "ln_1")
               .replace("post_attention_layernorm", "ln_2")
               .replace("self_attn.o_proj", "attn.c_proj")
               .replace("mlp.up_proj", "mlp.w1")
               .replace("mlp.gate_proj", "mlp.w2")
               .replace("mlp.down_proj", "mlp.c_proj"))
        if ".q_proj." in k:
            parts = [raw[k], raw[k.replace("q_proj", "k_proj")],
                     raw[k.replace("q_proj", "v_proj")]]
            state[k2.replace("self_attn.q_proj", "attn.c_attn")] = \
                np.concatenate(parts, 0)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            state[k2] = v
    cfg_dict = {"model_type": "qwen", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 96,  # halved by the config reader
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "kv_channels": 16, "layer_norm_epsilon": 1e-6,
                "rotary_emb_base": 5000.0, "seq_length": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, state, model, ids)
    assert cfg.intermediate_size == 48


def test_exaone3_parity(rng):
    """llama forward under EXAONE names (transformer.h, attn.attention.*,
    mlp.c_fc_0/1) with num_layers config key."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0)
    torch.manual_seed(74)
    model = transformers.LlamaForCausalLM(hf_cfg)
    state = {}
    for k, v in _np_state(model).items():
        k2 = (k.replace("model.embed_tokens", "transformer.wte")
               .replace("model.norm", "transformer.ln_f")
               .replace("model.layers.", "transformer.h.")
               .replace("input_layernorm", "ln_1")
               .replace("post_attention_layernorm", "ln_2")
               .replace("self_attn.q_proj", "attn.attention.q_proj")
               .replace("self_attn.k_proj", "attn.attention.k_proj")
               .replace("self_attn.v_proj", "attn.attention.v_proj")
               .replace("self_attn.o_proj", "attn.attention.out_proj")
               .replace("mlp.gate_proj", "mlp.c_fc_0")
               .replace("mlp.up_proj", "mlp.c_fc_1")
               .replace("mlp.down_proj", "mlp.c_proj"))
        state[k2] = v
    cfg_dict = {"model_type": "exaone", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "layer_norm_epsilon": 1e-6, "rope_theta": 10000.0,
                "activation_function": "silu",
                "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    _compare_state(cfg_dict, state, model, ids)


def test_stablelm_epoch_parity(rng):
    """norm_eps/rope_pct config keys; LayerNorm + partial rotary forward
    (StableLm is the oracle, no qkv bias)."""
    hf_cfg = transformers.StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, use_qkv_bias=False,
        max_position_embeddings=128, layer_norm_eps=1e-5)
    torch.manual_seed(75)
    model = transformers.StableLmForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "stablelm_epoch", "vocab_size": 256,
                "hidden_size": 64, "intermediate_size": 128,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 4, "norm_eps": 1e-5, "rope_pct": 0.5,
                "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert cfg.rotary_dim == 8 and cfg.norm == "layernorm"


def test_decilm_variable_gqa_parity(rng):
    """Per-layer kv-head counts: oracle is a llama whose layer-1 attention is
    rebuilt with fewer kv heads (HF attention modules are per-layer
    independent, so surgically swapping one is a faithful reference)."""
    from transformers.models.llama.modeling_llama import LlamaAttention
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128)
    torch.manual_seed(76)
    model = transformers.LlamaForCausalLM(hf_cfg)
    import copy
    cfg1 = copy.deepcopy(hf_cfg)
    cfg1.num_key_value_heads = 2
    model.model.layers[1].self_attn = LlamaAttention(cfg1, layer_idx=1)
    cfg_dict = {"model_type": "decilm", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "num_key_value_heads_per_layer": [4, 2],
                "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert cfg.layer_kv_heads(0) == 4 and cfg.layer_kv_heads(1) == 2
    assert params["layers"][1]["attn"]["k"].arrays["weight"].shape[0] == 32


def test_moss_parity(rng):
    """MOSS == CodeGen under identical names; model_type routes to the moss
    spec (mp_num=4 fused qkv split, shared-norm parallel residual)."""
    hf_cfg = transformers.CodeGenConfig(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, rotary_dim=16,
        n_positions=128, n_inner=None, activation_function="gelu_new",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(77)
    model = transformers.CodeGenForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "moss", "vocab_size": 256, "n_embd": 64,
                "n_layer": 2, "n_head": 4, "rotary_dim": 16,
                "n_positions": 128, "activation_function": "gelu_new"}
    state = {k: v for k, v in _np_state(model).items()
             if not k.endswith("causal_mask")}
    ids = rng.integers(0, 256, size=(2, 16))
    _compare_state(cfg_dict, state, model, ids)


def test_telechat2_parity(rng):
    """Bloom-lineage names, per-head fused key_value split, dense/down
    biases wired (zero here so the bias-free llama oracle matches)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128)
    torch.manual_seed(78)
    model = transformers.LlamaForCausalLM(hf_cfg)
    hd, kv = 16, 2
    state = {}
    for k, v in _np_state(model).items():
        k2 = (k.replace("model.embed_tokens", "transformer.word_embeddings")
               .replace("model.norm", "transformer.ln_f")
               .replace("model.layers.", "transformer.h.")
               .replace("self_attn.q_proj", "self_attention.query")
               .replace("self_attn.o_proj", "self_attention.dense"))
        if ".k_proj." in k:
            kw = v.reshape(kv, 1, hd, 64)
            vw = _np_state(model)[k.replace("k_proj", "v_proj")].reshape(kv, 1, hd, 64)
            state[k2.replace("self_attn.k_proj", "self_attention.key_value")] = \
                np.concatenate([kw, vw], 1).reshape(2 * kv * hd, 64)
        elif ".v_proj." in k:
            continue
        else:
            state[k2] = v
    for i in range(2):  # exercise the bias slots (zero = oracle-equivalent)
        state[f"transformer.h.{i}.self_attention.dense.bias"] = np.zeros(64, np.float32)
        state[f"transformer.h.{i}.mlp.down_proj.bias"] = np.zeros(64, np.float32)
    cfg_dict = {"model_type": "telechat2", "vocab_size": 256,
                "hidden_size": 64, "ffn_hidden_size": 128, "n_layer": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "layer_norm_epsilon": 1e-6, "seq_length": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare_state(cfg_dict, state, model, ids)
    assert "bias" in params["layers"][0]["attn"]["o"].arrays
    assert "bias" in params["layers"][0]["mlp"]["down"].arrays


def test_grinmoe_parity(rng):
    """GRIN-MoE == PhiMoE inference graph (sparsemixer top-2, LayerNorm,
    biases); phimoe is the oracle, model_type routes to the grinmoe spec."""
    hf_cfg = transformers.PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=8, num_experts_per_tok=2,
        router_jitter_noise=0.01, input_jitter_noise=0.0,
        attention_bias=True, lm_head_bias=True,
        max_position_embeddings=128, rope_theta=10000.0)
    torch.manual_seed(80)
    model = transformers.PhimoeForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "grinmoe", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 48, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "num_local_experts": 8, "num_experts_per_tok": 2,
                "router_jitter_noise": 0.01, "attention_bias": True,
                "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
                "rope_theta": 10000.0}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert cfg.moe_router_mode == "sparsemixer"


def test_minicpm_parity(rng):
    """muP multipliers (scale_emb, scale_depth/sqrt(L), dim_model_base);
    granite exposes the identical knob set and is the oracle."""
    import math
    hf_cfg = transformers.GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=12.0,
        residual_multiplier=1.4 / math.sqrt(2),
        logits_scaling=2.0,              # = hidden / dim_model_base
        attention_multiplier=0.25,       # = 1/sqrt(head_dim): minicpm default
        max_position_embeddings=128, rms_norm_eps=1e-6)
    torch.manual_seed(81)
    model = transformers.GraniteForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "minicpm", "vocab_size": 256, "hidden_size": 64,
                "intermediate_size": 128, "num_hidden_layers": 2,
                "num_attention_heads": 4, "num_key_value_heads": 2,
                "scale_emb": 12.0, "scale_depth": 1.4, "dim_model_base": 32,
                "rms_norm_eps": 1e-6, "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert cfg.embed_scale == 12.0 and cfg.logit_scale == 0.5


def test_minicpm3_mla_parity(rng):
    """MLA with mandatory q bottleneck over all-dense MLPs (deepseek-v2 with
    first_k_dense_replace=L is the oracle; names are identical), neutral muP
    scales."""
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=2, max_position_embeddings=128)
    torch.manual_seed(82)
    model = transformers.DeepseekV2ForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "minicpm3", "vocab_size": 256,
                "hidden_size": 64, "intermediate_size": 128,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "q_lora_rank": 32, "kv_lora_rank": 24,
                "qk_nope_head_dim": 16, "qk_rope_head_dim": 8,
                "v_head_dim": 16, "rms_norm_eps": 1e-6,
                "scale_emb": 1.0, "scale_depth": 2 ** 0.5,
                "dim_model_base": 64, "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, params = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert cfg.mla and cfg.q_lora_rank == 32
    assert "moe" not in params["layers"][0]


def test_chatglm_parity(rng):
    """ChatGLM-2/3 encoder-style layout: fused biased query_key_value (MQA
    widths), fused dense_h_to_4h = [gate; up], half-dim interleaved rotary —
    transformers Glm is the oracle (same block, converted naming)."""
    hf_cfg = transformers.GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        rms_norm_eps=1e-6, max_position_embeddings=128, pad_token_id=0)
    torch.manual_seed(83)
    model = transformers.GlmForCausalLM(hf_cfg)
    raw = _np_state(model)
    state = {}
    for k, v in raw.items():
        k2 = (k.replace("model.embed_tokens", "transformer.embedding.word_embeddings")
               .replace("model.norm", "transformer.encoder.final_layernorm")
               .replace("lm_head", "transformer.output_layer")
               .replace("model.layers.", "transformer.encoder.layers.")
               .replace("self_attn.o_proj", "self_attention.dense")
               .replace("mlp.gate_up_proj", "mlp.dense_h_to_4h")
               .replace("mlp.down_proj", "mlp.dense_4h_to_h"))
        if ".q_proj." in k:
            parts = [raw[k], raw[k.replace("q_proj", "k_proj")],
                     raw[k.replace("q_proj", "v_proj")]]
            state[k2.replace("self_attn.q_proj",
                             "self_attention.query_key_value")] = \
                np.concatenate(parts, 0)
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            state[k2] = v
    cfg_dict = {"model_type": "chatglm", "padded_vocab_size": 256,
                "hidden_size": 64, "ffn_hidden_size": 128, "num_layers": 2,
                "num_attention_heads": 4, "kv_channels": 16,
                "multi_query_attention": True, "multi_query_group_num": 2,
                "add_qkv_bias": True, "layernorm_epsilon": 1e-6,
                "rmsnorm": True, "post_layer_norm": True, "rope_ratio": 1.0,
                "seq_length": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, state, model, ids)
    assert cfg.rotary_dim == 8 and cfg.rope_interleaved


def test_mla_absorbed_decode_matches_standard(rng):
    """Compressed-cache absorbed-matmul decode (rank+rope floats per token)
    vs the assembled per-head cache: same greedy tokens, close logits."""
    from ganq_tpu.serve.engine import Engine, init_cache

    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=12, head_dim=8,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        topk_method="greedy", first_k_dense_replace=0,
        max_position_embeddings=64)
    torch.manual_seed(90)
    cfg, params = hf_import.params_from_torch_model(
        transformers.DeepseekV2ForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    out_std = Engine(cfg, params, max_seq=32, mla_absorb=False).generate(
        prompt, max_new_tokens=8)
    out_abs = Engine(cfg, params, max_seq=32, mla_absorb=True).generate(
        prompt, max_new_tokens=8)
    np.testing.assert_array_equal(out_std, out_abs)
    # compressed cache really is the small one: rank+rope vs H*(k+v) dims
    comp = init_cache(cfg, 1, 32, mla_absorbed=True)[0]
    full = init_cache(cfg, 1, 32)[0]
    comp_f = comp["c"].size + comp["kpe"].size
    full_f = full["k"].size + full["v"].size
    assert comp["c"].shape == (1, 32, 16) and comp["kpe"].shape == (1, 32, 8)
    assert comp_f < full_f / 2


def test_instella_parity(rng):
    """Instella (AMD remote code): the OLMo-2 architecture verbatim under
    model_type "instella" — the reference's definition is olmo2's with only
    the layer_type renamed (definitions/instella.py). Olmo2 is the oracle."""
    hf_cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attention_dropout=0.0)
    torch.manual_seed(81)
    model = transformers.Olmo2ForCausalLM(hf_cfg)
    cfg_dict = {"model_type": "instella", "vocab_size": 256,
                "hidden_size": 64, "intermediate_size": 128,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "num_key_value_heads": 2, "rms_norm_eps": 1e-5,
                "max_position_embeddings": 128}
    ids = rng.integers(0, 256, size=(2, 16))
    cfg, _ = _compare_state(cfg_dict, _np_state(model), model, ids)
    assert cfg.norm_after_sublayer and cfg.qk_norm == "flat"


def test_ovis2_text_decoder_parity(rng):
    """Ovis2 (AIDC-AI, transformers-native): a qwen2 decoder under
    model.language_model.* with a top-level untied lm_head; the visual tower
    is descoped. The wrapper spec RESOLVES to the inner arch per config."""
    hf_cfg = transformers.Ovis2Config(
        text_config={"model_type": "qwen2", "vocab_size": 128,
                     "hidden_size": 64, "intermediate_size": 128,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "num_key_value_heads": 2,
                     "max_position_embeddings": 128,
                     "tie_word_embeddings": False},
        vision_config={"hidden_size": 32, "num_hidden_layers": 1,
                       "num_attention_heads": 2, "image_size": 32,
                       "patch_size": 16, "intermediate_size": 64,
                       "hidden_stride": 1, "vocab_size": 16},
        image_token_id=120, visual_indicator_token_ids=[121, 122, 123,
                                                        124, 125],
        vocab_size=128, hidden_size=64)
    torch.manual_seed(84)
    model = transformers.Ovis2ForConditionalGeneration(hf_cfg).eval().float()
    ids = rng.integers(1, 120, size=(2, 16))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    cfg, params = hf_import.params_from_torch_model(model)
    out = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)
    assert cfg.model_type == "ovis2"
    assert "lm_head" in params                         # untied
    assert "bias" in params["layers"][0]["attn"]["q"].arrays  # qwen2 biases


def test_ovis_legacy_gemma2_llm_parity(rng):
    """Legacy Ovis 1.6 (remote code): inner LLM under ``llm.*`` — the spec
    resolves by llm_config.model_type. Gemma2 is the hard inner case (its
    sandwich-norm name map conflicts with llama's); oracle = a local
    Gemma2ForCausalLM whose weights are refactored into the ovis layout
    (the established remote-code test pattern)."""
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64, query_pre_attn_scalar=16,
        sliding_window=16)
    torch.manual_seed(85)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval().float()
    ids = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    state = {"llm." + k: v.detach().numpy()
             for k, v in model.state_dict().items()}
    state["vte.weight"] = np.zeros((4, 32), np.float32)  # ignored
    ovis_cfg = {"model_type": "ovis",
                "llm_config": {"model_type": "gemma2",
                               **hf_cfg.to_dict()}}
    cfg, params = hf_import.params_from_state_dict(state, ovis_cfg)
    out = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)
    assert cfg.model_type == "ovis" and cfg.sandwich_norm
    assert "post_attn_norm" in params["layers"][0]     # gemma2 norms mapped


def test_ovis2_quantize_save_load_roundtrip(rng, tmp_path):
    """Wrapper-arch (resolve-hook) checkpoint IO: quantize the ovis2 text
    decoder, save, reload — the resolved spec must drive both the writer's
    HF-name mapping and the loader's packed-module reconstruction."""
    from ganq_tpu import GanqModel, QuantizeConfig

    hf_cfg = transformers.Ovis2Config(
        text_config={"model_type": "qwen2", "vocab_size": 128,
                     "hidden_size": 64, "intermediate_size": 128,
                     "num_hidden_layers": 2, "num_attention_heads": 4,
                     "num_key_value_heads": 2,
                     "max_position_embeddings": 128,
                     "tie_word_embeddings": False},
        vision_config={"hidden_size": 32, "num_hidden_layers": 1,
                       "num_attention_heads": 2, "image_size": 32,
                       "patch_size": 16, "intermediate_size": 64,
                       "hidden_stride": 1, "vocab_size": 16},
        image_token_id=120, visual_indicator_token_ids=[121, 122, 123,
                                                        124, 125],
        vocab_size=128, hidden_size=64)
    torch.manual_seed(86)
    model = transformers.Ovis2ForConditionalGeneration(hf_cfg).eval().float()
    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=2,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    m = GanqModel.from_torch_model(model, qcfg)
    calib = [rng.integers(1, 120, size=(32,)).astype(np.int32)
             for _ in range(2)]
    logrows = m.quantize(calib, batch_size=1)
    assert len(logrows) == 14  # 7 linears x 2 layers

    d = str(tmp_path / "q")
    m.save(d)
    m2 = GanqModel.load(d)
    assert m2.quantized and m2.cfg.model_type == "ovis2"
    prompt = rng.integers(1, 120, size=(1, 8)).astype(np.int32)
    a = m.generate(prompt, max_new_tokens=4, max_seq=64)
    m2.backend = "reference"
    b = m2.generate(prompt, max_new_tokens=4, max_seq=64)
    assert np.mean(a == b) >= 0.75


def test_mllama_text_decoder_parity(rng):
    """Mllama (Llama-3.2-Vision) text decoder: cross-attention layers are
    dropped at import (HF skips them for text-only input), the remaining
    self-attn layers renumber onto a plain llama decoder. Oracle = the full
    HF VL model driven text-only."""
    hf_cfg = transformers.MllamaConfig(
        text_config={"vocab_size": 128, "hidden_size": 64,
                     "intermediate_size": 128, "num_hidden_layers": 4,
                     "num_attention_heads": 4, "num_key_value_heads": 2,
                     "max_position_embeddings": 128,
                     "cross_attention_layers": [1, 3],
                     "rope_scaling": {"rope_type": "default"},
                     "pad_token_id": 0, "bos_token_id": 1,
                     "eos_token_id": 2},
        vision_config={"hidden_size": 32, "num_hidden_layers": 1,
                       "num_global_layers": 1, "num_attention_heads": 2,
                       "image_size": 32, "patch_size": 16, "max_num_tiles": 4,
                       "intermediate_size": 64, "vision_output_dim": 32,
                       "intermediate_layers_indices": [0]})
    torch.manual_seed(83)
    model = transformers.MllamaForConditionalGeneration(hf_cfg).eval().float()
    ids = rng.integers(1, 128, size=(2, 16))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    cfg, params = hf_import.params_from_torch_model(model)
    out = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)
    assert cfg.model_type == "mllama"
    assert cfg.num_hidden_layers == 2          # 4 layers minus 2 cross-attn
    assert len(params["layers"]) == 2
    assert "lm_head" in params                 # untied (embed has +8 rows)
    assert params["embed_tokens"]["weight"].shape[0] == 128 + 8


def test_qwen2_vl_text_decoder_parity(rng):
    """Qwen2-VL text decoder: qwen2 layers under model.language_model.*;
    text-only mrope == plain rope. Oracle = the full HF VL model driven with
    text-only input_ids; the visual tower is descoped (its keys are ignored
    at import)."""
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
        rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
        vision_config={"depth": 2, "embed_dim": 32, "hidden_size": 32,
                       "num_heads": 2, "in_chans": 3, "patch_size": 4,
                       "spatial_merge_size": 1, "temporal_patch_size": 1})
    torch.manual_seed(82)
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    ids = rng.integers(0, 256, size=(2, 16))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    cfg, params = hf_import.params_from_torch_model(model)
    out = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)
    assert cfg.model_type == "qwen2_vl" and cfg.rope_scaling is None
    assert "lm_head" in params        # untied despite the composite tie flag
    assert "bias" in params["layers"][0]["attn"]["q"].arrays  # qkv biases
