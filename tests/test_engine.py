"""Inference engine tests: cached decode must equal full-context forward
(KV-cache correctness), backends must agree, eos/sampling behavior."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ganq_tpu.core.config import QuantizeConfig  # noqa: E402
from ganq_tpu.formats import checkpoint  # noqa: E402
from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.models.registry import get_spec  # noqa: E402
from ganq_tpu.quant.looper import quantize_model  # noqa: E402
from ganq_tpu.serve import engine  # noqa: E402


def tiny(seed=0, mtype="llama"):
    if mtype == "llama":
        hf_cfg = transformers.LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256)
        cls = transformers.LlamaForCausalLM
    else:
        hf_cfg = transformers.OPTConfig(
            vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=256,
            word_embed_proj_dim=64)
        cls = transformers.OPTForCausalLM
    torch.manual_seed(seed)
    model = cls(hf_cfg)
    return hf_import.params_from_torch_model(model)


@pytest.mark.parametrize("mtype", ["llama", "opt"])
def test_greedy_generate_matches_full_forward(rng, mtype):
    """Greedy tokens from the cached decode loop must equal argmax decoding
    with the uncached full forward — the KV-cache correctness oracle."""
    cfg, params = tiny(0, mtype)
    prompt = rng.integers(0, 256, size=(2, 12)).astype(np.int32)
    eng = engine.Engine(cfg, params, max_seq=64)
    out = eng.generate(prompt, max_new_tokens=8)

    # reference: iterative full forward argmax
    ids = prompt.copy()
    for _ in range(8):
        logits = transformer.forward(cfg, params, jnp.asarray(ids))
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))[:, None]
        ids = np.concatenate([ids, nxt.astype(np.int32)], axis=1)
    np.testing.assert_array_equal(out, ids[:, 12:])


def test_quantized_backends_agree(rng):
    """Packed checkpoint: pallas kernels vs XLA dequant reference must
    produce the same greedy continuation (reference test_kernel_output.py)."""
    cfg, params = tiny(1)
    spec = get_spec("llama")
    qcfg = QuantizeConfig(bits=4, quant_method="ganq", ganq_iterations=2,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    batches = [rng.integers(0, 256, size=(2, 32)).astype(np.int32) for _ in range(2)]
    out = quantize_model(cfg, params, spec, qcfg, batches)

    import tempfile
    d = tempfile.mkdtemp()
    checkpoint.save_quantized(d, {
        "model_type": "llama", "vocab_size": 256, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "max_position_embeddings": 256}, qcfg, out.params, out.artifacts)
    cfg2, params2, _ = checkpoint.load_quantized(d)

    prompt = rng.integers(0, 256, size=(1, 10)).astype(np.int32)
    ref = engine.Engine(cfg2, params2, backend="reference", max_seq=64).generate(
        prompt, max_new_tokens=6)
    pal = engine.Engine(cfg2, params2, backend="pallas", max_seq=64).generate(
        prompt, max_new_tokens=6)
    # bf16 noise can flip near-tie argmax occasionally; require strong agreement
    agree = np.mean(ref == pal)
    assert agree >= 0.8, (ref, pal)


def test_eos_stops_generation(rng):
    cfg, params = tiny(2)
    prompt = rng.integers(0, 256, size=(1, 4)).astype(np.int32)
    eng = engine.Engine(cfg, params, max_seq=32)
    greedy = eng.generate(prompt, max_new_tokens=6)
    eos = int(greedy[0, 1])  # force the 2nd generated token to be "eos"
    out = eng.generate(prompt, max_new_tokens=6, eos_id=eos)
    assert np.all(out[0, 2:] == eos)  # everything after eos is padded


def test_sampling_is_reproducible(rng):
    cfg, params = tiny(3)
    prompt = rng.integers(0, 256, size=(1, 4)).astype(np.int32)
    eng = engine.Engine(cfg, params, max_seq=32)
    a = eng.generate(prompt, max_new_tokens=8, temperature=1.0, top_k=16, seed=7)
    b = eng.generate(prompt, max_new_tokens=8, temperature=1.0, top_k=16, seed=7)
    c = eng.generate(prompt, max_new_tokens=8, temperature=1.0, top_k=16, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c) or True  # different seed may coincide; no assert


def test_top_p_restricts_support(rng):
    """With tiny top_p the sampler must reduce to (near-)greedy."""
    cfg, params = tiny(4)
    prompt = rng.integers(0, 256, size=(1, 6)).astype(np.int32)
    eng = engine.Engine(cfg, params, max_seq=32)
    greedy = eng.generate(prompt, max_new_tokens=6)
    nucleus = eng.generate(prompt, max_new_tokens=6, temperature=1.0,
                           top_p=1e-6, seed=3)
    np.testing.assert_array_equal(nucleus, greedy)


def test_bloom_cached_decode_matches_full_forward(rng):
    """ALiBi + cache: per-key bias form must stay consistent between prefill
    and incremental decode."""
    hf_cfg = transformers.BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(17)
    model = transformers.BloomForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    prompt = rng.integers(0, 256, size=(1, 10)).astype(np.int32)
    out = engine.Engine(cfg, params, max_seq=48).generate(prompt, max_new_tokens=6)

    ids = prompt.copy()
    for _ in range(6):
        logits = transformer.forward(cfg, params, jnp.asarray(ids))
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))[:, None]
        ids = np.concatenate([ids, nxt.astype(np.int32)], axis=1)
    np.testing.assert_array_equal(out, ids[:, 10:])


def test_olmo2_cached_decode_matches_full_forward(rng):
    """Post-sublayer norms + flat qk-norms must stay consistent between the
    prefill path and incremental cached decode."""
    hf_cfg = transformers.Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, attention_dropout=0.0)
    torch.manual_seed(21)
    model = transformers.Olmo2ForCausalLM(hf_cfg)
    cfg, params = hf_import.params_from_torch_model(model)
    prompt = rng.integers(0, 256, size=(1, 10)).astype(np.int32)
    out = engine.Engine(cfg, params, max_seq=48).generate(prompt, max_new_tokens=6)

    ids = prompt.copy()
    for _ in range(6):
        logits = transformer.forward(cfg, params, jnp.asarray(ids))
        nxt = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))[:, None]
        ids = np.concatenate([ids, nxt.astype(np.int32)], axis=1)
    np.testing.assert_array_equal(out, ids[:, 10:])


def test_uniform_backends_agree_pallas_a8(rng):
    """GPTQ-format checkpoint under the W4A8 backend (uniform_a8_matmul
    dispatch) greedy-agrees with the full-precision reference."""
    from ganq_tpu.models import synthetic

    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=4,
                                 kv_heads=2, vocab=512, max_pos=64)
    params = synthetic.make_model(cfg, kind="uniform", seed=17)
    prompt = rng.integers(1, 512, size=(2, 8)).astype(np.int32)
    ref = engine.Engine(cfg, params, backend="reference", max_seq=32).generate(
        prompt, max_new_tokens=6)
    a8 = engine.Engine(cfg, params, backend="pallas_a8", max_seq=32).generate(
        prompt, max_new_tokens=6)
    assert np.mean(ref == a8) >= 0.8, (ref, a8)


def test_stacked_layout_matches_perlayer(rng):
    """Engine layout='auto' serves homogeneous models through the stacked
    scan; outputs must match the per-layer path (greedy, sampled, eos,
    streaming)."""
    from ganq_tpu.models import synthetic

    cfg = synthetic.llama_config(hidden=64, inter=128, layers=3, heads=4,
                                 kv_heads=2, vocab=128, max_pos=64)
    params = synthetic.make_model(cfg, kind="dense", seed=11)
    prompt = rng.integers(1, 128, size=(2, 9)).astype(np.int32)

    auto = engine.Engine(cfg, params, max_seq=48)
    assert auto._sp is not None  # homogeneous llama stacks
    per = engine.Engine(cfg, params, max_seq=48, layout="perlayer")
    assert per._sp is None

    a = auto.generate(prompt, max_new_tokens=6)
    b = per.generate(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(a, b)

    s1 = auto.generate(prompt, max_new_tokens=6, temperature=0.8, top_k=20,
                       seed=5)
    s2 = per.generate(prompt, max_new_tokens=6, temperature=0.8, top_k=20,
                      seed=5)
    np.testing.assert_array_equal(s1, s2)

    eos = int(a[0, 2])
    e1 = auto.generate(prompt[:1], max_new_tokens=6, eos_id=eos)
    e2 = per.generate(prompt[:1], max_new_tokens=6, eos_id=eos)
    np.testing.assert_array_equal(e1, e2)

    t1 = list(auto.stream(prompt[:1], max_new_tokens=5, seed=2))
    t2 = list(per.stream(prompt[:1], max_new_tokens=5, seed=2))
    assert t1 == t2


def test_engine_w4_megastep_route(rng, monkeypatch):
    """A uniform sym W4 d=128 model through the public Engine: prepack
    attaches the pair-nibble megastep operands and sampled generation
    agrees with the non-mega path (GANQ_MEGASTEP toggles, CPU interpret)."""
    from ganq_tpu.models import synthetic
    from ganq_tpu.serve import stacked

    cfg = synthetic.llama_config(hidden=256, inter=512, layers=2, heads=2,
                                 kv_heads=1, vocab=512, max_pos=128)
    params = synthetic.make_model(cfg, kind="uniform", seed=4)

    monkeypatch.setenv("GANQ_MEGASTEP", "1")
    eng = engine.Engine(cfg, params, backend="reference", max_seq=64)
    # W4 artifacts default to the plane kernel (w4p) which walks multiple
    # packed tiles per grid step; GANQ_W4_PLANE=0 selects the pair kernel
    assert eng._sp is not None and "megapack_lb" in eng._sp
    assert stacked.mega_enabled(cfg, eng._sp, "reference", 2) == "w4p"
    ids = rng.integers(0, 512, size=(2, 8))
    out_mega = eng.generate(ids, max_new_tokens=6, temperature=0.0)

    monkeypatch.setenv("GANQ_MEGASTEP", "0")
    eng2 = engine.Engine(cfg, params, backend="reference", max_seq=64)
    out_ref = eng2.generate(ids, max_new_tokens=6, temperature=0.0)
    agree = (out_mega == out_ref).mean()
    assert agree >= 0.9, (out_mega, out_ref)
