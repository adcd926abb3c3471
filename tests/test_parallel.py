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


def test_expert_stacking_rejects_quantized(rng):
    from ganq_tpu.parallel import expert_parallel
    from ganq_tpu.models import synthetic
    params = synthetic.make_model(synthetic.llama_config(
        hidden=64, inter=128, layers=1), kind="lut", seed=0)
    # fabricate a fake moe layer holding a quantized expert
    lp = dict(params["layers"][0])
    lp["moe"] = {"router": params["layers"][0]["mlp"]["down"],
                 "experts": [{"gate": params["layers"][0]["mlp"]["gate"],
                              "up": params["layers"][0]["mlp"]["up"],
                              "down": params["layers"][0]["mlp"]["down"]}]}
    with pytest.raises(ValueError, match="dense"):
        expert_parallel.stack_layer_experts(lp)


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
