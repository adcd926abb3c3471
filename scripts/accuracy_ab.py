"""Whole-model GANQ codebook accuracy A/B (VERDICT r3 #3).

Measures held-out self-sampled ppl (the KL-proxy of the accuracy-contract
suite, tests/test_accuracy_contract.py) for fp / GPTQ g128 / GANQ-free /
GANQ-affine_sym / GANQ-lut8 at ganq_iterations=10 on the LARGEST local
contract model (heavy-tailed random-init llama — no dataset egress exists
here). The measured envelope backs the tightened assert in
test_affine_codebook_whole_model_ab and the PERF.md round-4 table.

Run: PYTHONPATH=/root/repo python scripts/accuracy_ab.py [--small]
(CPU-mesh friendly; pass --small for a quick smoke at the test-suite size.)
Prints one JSON line per config plus a final summary table.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import transformers  # noqa: E402

from ganq_tpu.core.config import QuantizeConfig  # noqa: E402
from ganq_tpu.evals.perplexity import fixed_stride_ppl  # noqa: E402
from ganq_tpu.models import hf_import, transformer  # noqa: E402
from ganq_tpu.models.registry import get_spec  # noqa: E402
from ganq_tpu.quant.looper import quantize_model  # noqa: E402

SMALL = "--small" in sys.argv
VOCAB = 256 if SMALL else 512
SEQ = 128 if SMALL else 256


def _model(seed=41):
    """Heavy-tailed random llama — the contract-model recipe
    (tests/test_accuracy_contract._model) at the largest size this
    environment quantizes in reasonable time."""
    if SMALL:
        hf_cfg = transformers.LlamaConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=SEQ * 2)
    else:
        hf_cfg = transformers.LlamaConfig(
            vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
            num_hidden_layers=8, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=SEQ * 2)
    torch.manual_seed(seed)
    m = transformers.LlamaForCausalLM(hf_cfg)
    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if p.ndim == 2 and "embed" not in name and "lm_head" not in name:
                mask = torch.tensor(rng.random(size=tuple(p.shape)) < 0.03)
                out = torch.tensor(
                    rng.normal(size=tuple(p.shape)) * 6.0, dtype=p.dtype)
                p.add_(torch.where(mask, out * p.abs().mean(),
                                   torch.tensor(0.0)))
    return m


def _sample(cfg, params, n_seqs, seed):
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    ids = jnp.zeros((n_seqs, SEQ), jnp.int32)
    ids = ids.at[:, 0].set(
        jax.random.randint(k0, (n_seqs,), 0, VOCAB, jnp.int32))

    @jax.jit
    def step(ids, t, key):
        logits = transformer.forward(cfg, params, ids)
        lt = jnp.take_along_axis(
            logits, (t - 1)[None, None, None].astype(jnp.int32),
            axis=1)[:, 0, :].astype(jnp.float32)
        nxt = jax.random.categorical(key, lt, axis=-1)
        return ids.at[:, t].set(nxt.astype(jnp.int32))

    for t in range(1, SEQ):
        key, kt = jax.random.split(key)
        ids = step(ids, jnp.int32(t), kt)
    return np.asarray(ids)


def main():
    m = _model()
    cfg, p_fp = hf_import.params_from_torch_model(m)
    spec = get_spec("llama")
    n_calib = 4 if SMALL else 8
    calib = _sample(cfg, p_fp, n_seqs=n_calib, seed=27)
    held = _sample(cfg, p_fp, n_seqs=8, seed=271).reshape(-1)
    batches = [calib[i:i + 2] for i in range(0, n_calib, 2)]

    def ppl(params):
        fwd = lambda p, ids: transformer.forward(cfg, p, ids)
        return fixed_stride_ppl(fwd, params, held, seqlen=SEQ)

    results = {"fp": round(float(ppl(p_fp)), 4)}
    print(json.dumps({"config": "fp", "ppl": results["fp"]}), flush=True)

    ganq_kw = dict(bits=4, quant_method="ganq", ganq_iterations=10,
                   act_sort="asc", l_damp_style="ganq", dead="mean")
    configs = {
        "gptq_g128": QuantizeConfig(bits=4, group_size=128, sym=True,
                                    desc_act=False, act_sort="none"),
        "ganq_free": QuantizeConfig(**ganq_kw),
        "ganq_affine_sym": QuantizeConfig(ganq_codebook="affine_sym",
                                          **ganq_kw),
        "ganq_lut8": QuantizeConfig(ganq_codebook="lut8", **ganq_kw),
        # bits=3 rows (round 5): the TRUE 8-entry per-row codebook the
        # walsh megastep ("wl8") serves EXACTLY at 3 bits/weight — the
        # flagship artifact. GANQ-3's nonuniform win over grouped GPTQ-3
        # is the paper's Table 3 story; the serve path adds ZERO error
        # (walsh decode is exact), so these ppls ARE the serving ppls.
        "gptq3_g128": QuantizeConfig(bits=3, group_size=128, sym=True,
                                     desc_act=False, act_sort="none"),
        "ganq3_free": QuantizeConfig(**dict(ganq_kw, bits=3)),
    }
    for name, qcfg in configs.items():
        _, p = hf_import.params_from_torch_model(m)
        t0 = time.perf_counter()
        out = quantize_model(cfg, p, spec, qcfg, batches)
        v = round(float(ppl(out.params)), 4)
        results[name] = v
        print(json.dumps({"config": name, "ppl": v,
                          "dppl": round(v - results["fp"], 4),
                          "quant_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        if name == "ganq_free":
            # the free checkpoint's FAST-SERVING recode (per-128-group int8
            # -> w8p plane megastep): measure what the recode costs on top
            # of the exact-LUT artifact (VERDICT r3 #2c default decision)
            from ganq_tpu.ops.qlinear import QLinear, recode_uniform8
            from ganq_tpu.quant.looper import packed_params
            pk = packed_params(spec, out)
            pk = jax.tree_util.tree_map(
                lambda x: (recode_uniform8(x)
                           if isinstance(x, QLinear) else x),
                pk, is_leaf=lambda x: isinstance(x, QLinear))
            v8 = round(float(ppl(pk)), 4)
            results["ganq_free_u8recode"] = v8
            print(json.dumps({"config": "ganq_free_u8recode", "ppl": v8,
                              "dppl": round(v8 - results["fp"], 4)}),
                  flush=True)
        if name == "ganq3_free":
            # the bits=3 artifact's W4-BYTES speed recode (round 5): snap
            # the 8-entry codebook onto the row's 16-level affine grid,
            # keep the solve's assignments (ops/qlinear.recode_uniform4 ->
            # the W4 plane megastep at 2.4x-class decode). The measured
            # dppl delta vs the exact walsh serving is the recode's price.
            from ganq_tpu.ops.qlinear import QLinear, recode_uniform4
            from ganq_tpu.quant.looper import packed_params
            pk = packed_params(spec, out)
            pk = jax.tree_util.tree_map(
                lambda x: (recode_uniform4(x)
                           if isinstance(x, QLinear) else x),
                pk, is_leaf=lambda x: isinstance(x, QLinear))
            v4 = round(float(ppl(pk)), 4)
            results["ganq3_free_u4snap"] = v4
            print(json.dumps({"config": "ganq3_free_u4snap", "ppl": v4,
                              "dppl": round(v4 - results["fp"], 4)}),
                  flush=True)

    fp = results["fp"]
    print(json.dumps({
        "summary": {k: results[k] for k in results},
        "deltas": {k: round(results[k] - fp, 4)
                   for k in results if k != "fp"},
        "affine_vs_free_ratio": round(
            (results["ganq_affine_sym"] - fp)
            / max(results["ganq_free"] - fp, 1e-3), 3),
    }))


if __name__ == "__main__":
    main()
