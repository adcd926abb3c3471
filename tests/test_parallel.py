"""Tensor/data-parallel sharding tests on the virtual 8-device CPU mesh —
numerically identical results to single-device execution, with parameters
actually distributed."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.parallel import sharding  # noqa: E402
from ganq_tpu.serve import engine  # noqa: E402


def tiny8(seed=0):
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128)
    torch.manual_seed(seed)
    return hf_import.params_from_torch_model(transformers.LlamaForCausalLM(hf_cfg))


def test_make_mesh():
    mesh = sharding.make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        sharding.make_mesh(data=3, model=3)


def test_sharded_forward_matches_unsharded(rng):
    cfg, params = tiny8()
    ids = jnp.asarray(rng.integers(0, 256, size=(2, 16)))
    ref = np.asarray(transformer.forward(cfg, params, ids))

    mesh = sharding.make_mesh(data=1, model=8)
    sparams = sharding.shard_params(cfg, params, mesh)
    # q weight rows really sharded over 8 devices
    q = sparams["layers"][0]["attn"]["q"]["weight"]
    assert len(q.sharding.device_set) == 8

    with jax.set_mesh(mesh):
        out = np.asarray(transformer.forward(cfg, sparams, ids))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_sharded_generate_matches_unsharded(rng):
    cfg, params = tiny8(1)
    prompt = rng.integers(0, 256, size=(2, 8)).astype(np.int32)
    ref = engine.Engine(cfg, params, max_seq=32).generate(prompt, max_new_tokens=6)

    mesh = sharding.make_mesh(data=2, model=4)
    sparams = sharding.shard_params(cfg, params, mesh)
    with jax.set_mesh(mesh):
        eng = engine.Engine(cfg, sparams, max_seq=32)
        out = eng.generate(prompt, max_new_tokens=6)
    np.testing.assert_array_equal(out, ref)


def test_sharded_mixtral_forward(rng):
    """TP over a MoE model: per-expert column/row parallel, router replicated."""
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=2, num_experts_per_tok=1,
        max_position_embeddings=64)
    torch.manual_seed(12)
    cfg, params = hf_import.params_from_torch_model(
        transformers.MixtralForCausalLM(hf_cfg))
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 8)))
    ref = np.asarray(transformer.forward(cfg, params, ids))

    mesh = sharding.make_mesh(data=2, model=4)
    sparams = sharding.shard_params(cfg, params, mesh)
    with jax.set_mesh(mesh):
        out = np.asarray(transformer.forward(cfg, sparams, ids))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_sequence_sharded_prefill(rng):
    """Long-context prefill with activations sharded along the sequence dim:
    GSPMD inserts the attention collectives; results match unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params = tiny8(3)
    ids_np = rng.integers(0, 256, size=(1, 64)).astype(np.int32)
    ref = np.asarray(transformer.forward(cfg, params, jnp.asarray(ids_np)))

    mesh = sharding.make_mesh(data=1, model=8)
    sparams = sharding.shard_params(cfg, params, mesh)
    ids = jax.device_put(jnp.asarray(ids_np),
                         NamedSharding(mesh, P(None, "model")))  # seq-sharded
    with jax.set_mesh(mesh):
        out = np.asarray(transformer.forward(cfg, sparams, ids))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_sharded_qwen3_forward(rng):
    """q/k norm params must have matching (replicated) specs in param_specs —
    regression for the spec-tree/params-tree structure mismatch."""
    import transformers, torch
    hf_cfg = transformers.Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=8, num_key_value_heads=8,
        head_dim=8, max_position_embeddings=128)
    torch.manual_seed(22)
    model = transformers.Qwen3ForCausalLM(hf_cfg)
    from ganq_tpu.models import hf_import as hfi
    cfg, params = hfi.params_from_torch_model(model)
    ids = jnp.asarray(rng.integers(0, 256, size=(2, 8)))
    ref = np.asarray(transformer.forward(cfg, params, ids))
    mesh = sharding.make_mesh(data=1, model=8)
    sparams = sharding.shard_params(cfg, params, mesh)
    with jax.set_mesh(mesh):
        out = np.asarray(transformer.forward(cfg, sparams, ids))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_expert_parallel_stacked_forward(rng):
    """Expert-index parallelism: stacked expert arrays must (a) match the
    per-expert loop exactly, (b) actually shard the expert axis over the
    mesh, and (c) still match when sharded."""
    from ganq_tpu.parallel.expert_parallel import stack_experts

    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=8, num_experts_per_tok=2,
        max_position_embeddings=64)
    torch.manual_seed(24)
    cfg, params = hf_import.params_from_torch_model(
        transformers.MixtralForCausalLM(hf_cfg))
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 8)))
    ref = np.asarray(transformer.forward(cfg, params, ids))

    stacked = stack_experts(params)
    assert "experts" not in stacked["layers"][0]["moe"]
    out = np.asarray(transformer.forward(cfg, stacked, ids))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)

    mesh = sharding.make_mesh(data=1, model=8)
    sparams = sharding.shard_params(cfg, stacked, mesh)
    gw = sparams["layers"][0]["moe"]["stacked"]["gate_w"]
    assert len(gw.sharding.device_set) == 8
    # E=8 over 8 devices -> one expert per device
    assert gw.sharding.shard_shape(gw.shape)[0] == 1
    with jax.set_mesh(mesh):
        sout = np.asarray(transformer.forward(cfg, sparams, ids))
    np.testing.assert_allclose(sout, ref, atol=3e-4, rtol=3e-4)


def test_expert_stacking_quantized_w8(rng):
    """LUT experts are recoded to int8 and stacked with output-side scales;
    the stacked einsum must match the per-expert w8 loop."""
    from ganq_tpu.models.transformer import ModelConfig, _moe_forward
    from ganq_tpu.ops import qlinear
    from ganq_tpu.parallel import expert_parallel

    E, H, I = 4, 64, 128
    key = jax.random.PRNGKey(3)

    def lut_lin(k, out_f, in_f):
        k1, k2 = jax.random.split(k)
        lut = jax.random.normal(k1, (out_f, 16), jnp.float32)
        idx = jax.random.randint(k2, (out_f, in_f), 0, 16)
        return qlinear.lut_linear(lut, idx, 4)

    keys = jax.random.split(key, 3 * E + 2)
    experts = [{"gate": lut_lin(keys[3 * e], I, H),
                "up": lut_lin(keys[3 * e + 1], I, H),
                "down": lut_lin(keys[3 * e + 2], H, I)} for e in range(E)]
    router = qlinear.dense_linear(
        jax.random.normal(keys[-2], (E, H), jnp.float32))
    cfg = ModelConfig(
        model_type="mixtral", vocab_size=64, hidden_size=H,
        intermediate_size=I, num_hidden_layers=1, num_attention_heads=4,
        num_key_value_heads=4, head_dim=16, num_experts=E,
        num_experts_per_tok=2)
    h = jax.random.normal(keys[-1], (2, 8, H), jnp.float32)

    # per-expert reference uses the SAME int8 recode as the stacked path
    ref_moe = {"router": router,
               "experts": [{k: qlinear.recode_w8(v) for k, v in e.items()}
                           for e in experts]}
    ref = np.asarray(_moe_forward(cfg, ref_moe, h, None, "reference"))

    lp = expert_parallel.stack_layer_experts(
        {"moe": {"router": router, "experts": experts}})
    st = lp["moe"]["stacked"]
    assert st["gate_w"].dtype == jnp.int8
    assert st["gate_s"].shape == (E, I) and st["down_s"].shape == (E, H)
    out = np.asarray(_moe_forward(cfg, lp["moe"], h, None, "reference"))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-4)


def test_expert_stacking_preserves_shared_and_recodes_uniform(rng):
    from ganq_tpu.models import synthetic
    from ganq_tpu.parallel import expert_parallel
    # uniform (GPTQ-format) experts stack via the int8 recode (recode_w8
    # covers uniform since the W4A8 work) — previously a loud rejection
    params = synthetic.make_model(synthetic.llama_config(
        hidden=64, inter=128, layers=1), kind="uniform", seed=0)
    mlp = params["layers"][0]["mlp"]
    exp = {"gate": mlp["gate"], "up": mlp["up"], "down": mlp["down"]}
    lp = expert_parallel.stack_layer_experts(
        {"moe": {"router": mlp["down"], "experts": [exp], "shared": exp}})
    assert "stacked" in lp["moe"]
    # dense stacking keeps the shared-expert entries (qwen2_moe/deepseek)
    params2 = synthetic.make_model(synthetic.llama_config(
        hidden=64, inter=128, layers=1), kind="dense", seed=0)
    mlp2 = params2["layers"][0]["mlp"]
    exp2 = {"gate": mlp2["gate"], "up": mlp2["up"], "down": mlp2["down"]}
    lp2 = expert_parallel.stack_layer_experts(
        {"moe": {"router": mlp2["down"], "experts": [exp2], "shared": exp2}})
    assert "shared" in lp2["moe"] and "stacked" in lp2["moe"]


def test_pipeline_forward_matches_unsharded(rng):
    """GPipe-style staged forward: stage-sharded layers + microbatch
    circulation must reproduce the plain forward exactly."""
    from ganq_tpu.parallel import pipeline

    hf_cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128)
    torch.manual_seed(5)
    cfg, params = hf_import.params_from_torch_model(
        transformers.LlamaForCausalLM(hf_cfg))
    ids = jnp.asarray(rng.integers(0, 256, size=(8, 12)))
    ref = np.asarray(transformer.forward(cfg, params, ids))

    mesh = pipeline.make_pipe_mesh(4)
    runner = pipeline.PipelineRunner.build(cfg, params, mesh)
    # stage weights really live one-stage-per-device
    leaf = jax.tree_util.tree_leaves(runner.staged)[0]
    assert leaf.sharding.shard_shape(leaf.shape)[0] == 1

    out = np.asarray(runner.forward(ids, microbatches=4))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)
    # more microbatches than stages (bubble-minimizing regime)
    out8 = np.asarray(runner.forward(ids, microbatches=8))
    np.testing.assert_allclose(out8, ref, atol=3e-4, rtol=3e-4)


def test_pipeline_rejects_bad_split(rng):
    from ganq_tpu.parallel import pipeline
    cfg, params = tiny8(6)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline.stage_stack(params, 3)  # layers % stages != 0


def test_pipeline_decode_resident_kv(rng):
    """Decode PP: resident per-stage KV caches + the period-R token
    schedule must reproduce the single-device engine's greedy tokens
    exactly, in every microbatch regime (bubble M<S, M=S, M>S)."""
    from ganq_tpu.parallel.pipeline import PipelineRunner, make_pipe_mesh
    from ganq_tpu.serve.engine import Engine

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(99)
    cfg, params = hf_import.params_from_torch_model(
        transformers.LlamaForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(8, 8)).astype(np.int32)
    ref = Engine(cfg, params, max_seq=32).generate(prompt, max_new_tokens=5)
    pr = PipelineRunner.build(cfg, params, make_pipe_mesh(4))
    for M in (1, 4, 8):
        out = np.asarray(pr.generate_greedy(jnp.asarray(prompt), 5,
                                            microbatches=M))
        np.testing.assert_array_equal(out, ref)


def test_pipeline_x_tensor_2d_mesh(rng):
    """PP x TP composition: a ("pipe", "model") mesh with manual pipe hops
    (shard_map axis_names={"pipe"}) and GSPMD tensor parallelism inside each
    stage. Forward AND resident-KV decode must match the unsharded oracle."""
    from ganq_tpu.parallel import pipeline
    from ganq_tpu.serve.engine import Engine

    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    torch.manual_seed(101)
    cfg, params = hf_import.params_from_torch_model(
        transformers.LlamaForCausalLM(hf_cfg))
    ids = jnp.asarray(rng.integers(0, 128, size=(8, 10)))
    ref = np.asarray(transformer.forward(cfg, params, ids))

    mesh = pipeline.make_pipe_mesh(4, model=2)
    assert mesh.axis_names == ("pipe", "model")
    runner = pipeline.PipelineRunner.build(cfg, params, mesh)
    # a column-parallel weight must be split over BOTH axes: stage axis 0
    # and the output-feature axis over "model"
    wq = runner.staged["attn"]["q"].arrays["weight"]
    shard = wq.sharding.shard_shape(wq.shape)
    assert shard[0] == 1 and shard[2] == wq.shape[2] // 2

    out = np.asarray(runner.forward(ids, microbatches=4))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)

    prompt = rng.integers(0, 128, size=(8, 8)).astype(np.int32)
    ref_toks = Engine(cfg, params, max_seq=32).generate(prompt,
                                                        max_new_tokens=5)
    out_toks = np.asarray(runner.generate_greedy(jnp.asarray(prompt), 5,
                                                 microbatches=4))
    np.testing.assert_array_equal(out_toks, ref_toks)


def test_pipeline_decode_sliding_window_gemma2(rng):
    """Decode PP with per-layer sliding windows riding the staged pytree as
    data (previously NotImplementedError)."""
    from ganq_tpu.parallel.pipeline import PipelineRunner, make_pipe_mesh
    from ganq_tpu.serve.engine import Engine

    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64, query_pre_attn_scalar=16,
        sliding_window=8)
    torch.manual_seed(103)
    cfg, params = hf_import.params_from_torch_model(
        transformers.Gemma2ForCausalLM(hf_cfg))
    prompt = rng.integers(0, 128, size=(4, 12)).astype(np.int32)
    ref = Engine(cfg, params, max_seq=32).generate(prompt, max_new_tokens=6)
    pr = PipelineRunner.build(cfg, params, make_pipe_mesh(4))
    out = np.asarray(pr.generate(jnp.asarray(prompt), 6, microbatches=4,
                                 max_seq=32))
    np.testing.assert_array_equal(out, ref)


def test_pipeline_decode_alibi_bloom(rng):
    from ganq_tpu.parallel.pipeline import PipelineRunner, make_pipe_mesh
    from ganq_tpu.serve.engine import Engine

    hf_cfg = transformers.BloomConfig(
        vocab_size=128, hidden_size=32, n_layer=4, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(104)
    cfg, params = hf_import.params_from_torch_model(
        transformers.BloomForCausalLM(hf_cfg))
    assert cfg.pos == "alibi"
    prompt = rng.integers(0, 128, size=(4, 8)).astype(np.int32)
    ref = Engine(cfg, params, max_seq=32).generate(prompt, max_new_tokens=5)
    pr = PipelineRunner.build(cfg, params, make_pipe_mesh(4))
    out = np.asarray(pr.generate(jnp.asarray(prompt), 5, microbatches=4,
                                 max_seq=32))
    np.testing.assert_array_equal(out, ref)


def test_pipeline_decode_sampled(rng):
    """Sampled decode PP: deterministic per seed, diverse across seeds, and
    the temperature->0 path equals greedy."""
    from ganq_tpu.parallel.pipeline import PipelineRunner, make_pipe_mesh

    cfg, params = tiny8(4)
    prompt = rng.integers(0, 256, size=(4, 8)).astype(np.int32)
    pr = PipelineRunner.build(cfg, params, make_pipe_mesh(2))
    greedy = np.asarray(pr.generate(jnp.asarray(prompt), 6, microbatches=4,
                                    max_seq=32))
    s1a = np.asarray(pr.generate(jnp.asarray(prompt), 6, microbatches=4,
                                 max_seq=32, temperature=1.0, seed=1))
    s1b = np.asarray(pr.generate(jnp.asarray(prompt), 6, microbatches=4,
                                 max_seq=32, temperature=1.0, seed=1))
    s2 = np.asarray(pr.generate(jnp.asarray(prompt), 6, microbatches=4,
                                max_seq=32, temperature=1.0, seed=2))
    np.testing.assert_array_equal(s1a, s1b)
    assert (s1a != s2).any() and (s1a != greedy).any()
    assert s1a.shape == greedy.shape and (s1a >= 0).all()
    assert (s1a < cfg.vocab_size).all()


def test_looper_quantization_row_sharded(rng):
    """The full quantization looper runs with weights ROW-SHARDED over the
    mesh (the 70B-scale quantization story, SURVEY.md §7.2): GPTQ's math is
    row-parallel, so GSPMD shards the solver and results match the
    unsharded run."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ganq_tpu.core.config import QuantizeConfig
    from ganq_tpu.models import synthetic
    from ganq_tpu.models.registry import get_spec
    from ganq_tpu.ops.qlinear import QLinear
    from ganq_tpu.parallel import sharding
    from ganq_tpu.quant.looper import quantize_model

    cfg = synthetic.llama_config(hidden=64, inter=128, layers=2, heads=4,
                                 kv_heads=2, vocab=128, max_pos=64)
    spec = get_spec("llama")
    qcfg = QuantizeConfig(bits=4, group_size=32, quant_method="gptq",
                          act_sort="none", desc_act=False)
    batches = [rng.integers(1, 128, size=(2, 24)).astype(np.int32)
               for _ in range(2)]

    base = quantize_model(cfg, synthetic.make_model(cfg, kind="dense", seed=5),
                          spec, qcfg, batches)

    mesh = sharding.make_mesh(data=1, model=4,
                              devices=jax.devices()[:4])
    params = synthetic.make_model(cfg, kind="dense", seed=5)

    def shard_rows(node):
        if isinstance(node, QLinear) and node.kind == "dense":
            w = node["weight"]
            if w.shape[0] % 4 == 0:
                node["weight"] = jax.device_put(
                    w, NamedSharding(mesh, P("model", None)))
        return node

    for lp in params["layers"]:
        for grp in lp.values():
            if isinstance(grp, dict):
                for v in grp.values():
                    shard_rows(v)

    with jax.set_mesh(mesh):
        out = quantize_model(cfg, params, spec,
                             dataclasses.replace(qcfg), batches)

    assert base.artifacts.keys() == out.artifacts.keys()
    for k in base.artifacts:
        a, b = base.artifacts[k], out.artifacts[k]
        np.testing.assert_allclose(np.asarray(a.scale), np.asarray(b.scale),
                                   rtol=1e-4, atol=1e-5)
        agree = np.mean(np.asarray(a.qidx) == np.asarray(b.qidx))
        assert agree > 0.999, (k, agree)
