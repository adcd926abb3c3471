"""Mesh + sharding policies: tensor/data parallel quantized serving.

Net-new relative to the reference, which is single-process/single-accelerator
(SURVEY.md §2.4: no distributed runtime anywhere; TP only as a pass-through
arg to external vLLM). TPU-native design: a ``Mesh`` with ``("data",
"model")`` axes; parameters carry ``NamedSharding`` annotations and GSPMD
inserts the collectives:

- attn q/k/v and mlp up/gate: column-parallel (output rows sharded over
  "model") — for packed QLinear that means lut/scales/codes rows;
- attn o and mlp down: row-parallel (input columns sharded; packed codes
  shard on the packed minor dim) with the psum emitted by the partitioner;
- embeddings/lm_head: vocab-sharded; norms replicated;
- KV cache: batch over "data", kv-heads over "model".

Works identically on a virtual CPU mesh (tests / the driver's dryrun) and a
real TPU slice; multi-host needs only ``jax.distributed.initialize`` before
mesh creation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import ModelConfig
from ..ops.qlinear import QLinear


def make_mesh(data: int = 1, model: Optional[int] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if model is None:
        model = len(devices) // data
    if data * model != len(devices):
        raise ValueError(f"mesh {data}x{model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# partition specs for each QLinear array under column/row parallelism
_COL = {  # output rows sharded
    "weight": P("model", None), "bias": P("model"),
    "lut": P("model", None), "idx_packed": P("model", None),
    "qweight": P("model", None), "scales": P("model", None),
    "zeros": P("model", None), "g_idx": P(),
}
_ROW = {  # input columns sharded; bias/out replicated (psum after)
    "weight": P(None, "model"), "bias": P(),
    "lut": P(), "idx_packed": P(None, "model"),
    "qweight": P(None, "model"), "scales": P(None, "model"),
    "zeros": P(None, "model"), "g_idx": P("model"),
}
_REP = {k: P() for k in _COL}


def _linear_spec(kind: str) -> Dict[str, Any]:
    return {"col": _COL, "row": _ROW, "rep": _REP}[kind]


def param_specs(cfg: ModelConfig, params: Dict[str, Any],
                model_size: int = 1) -> Dict[str, Any]:
    """PartitionSpec pytree matching the params structure.

    ``model_size`` bounds head-granular sharding: k/v projections are
    column-parallel only when the kv-head count divides the model axis
    (GQA replicates kv otherwise — the standard TP-vs-GQA trade).
    """
    kv_ok = cfg.num_key_value_heads % model_size == 0
    q_ok = cfg.num_attention_heads % model_size == 0

    def lin(table):
        def build(p):
            if p is None:
                return None
            return QLinear(p.kind, {k: table[k] for k in p.arrays}, p.bits,
                           p.in_features)
        return build

    col, row, rep = lin(_COL), lin(_ROW), lin(_REP)

    specs: Dict[str, Any] = {"layers": []}
    specs["embed_tokens"] = {"weight": P("model", None)}
    if "embed_positions" in params:
        specs["embed_positions"] = {"weight": P()}
    for name in ("project_in", "project_out"):
        if name in params:
            specs[name] = rep(params[name])
    if "final_norm" in params:
        specs["final_norm"] = {k: P() for k in params["final_norm"]}
    if "lm_head" in params:
        specs["lm_head"] = col(params["lm_head"])

    for lp in params["layers"]:
        ls = {
            "input_norm": {k: P() for k in lp["input_norm"]},
            "post_norm": {k: P() for k in lp["post_norm"]},
            "attn": {
                "q": col(lp["attn"]["q"]) if q_ok else rep(lp["attn"]["q"]),
                "k": col(lp["attn"]["k"]) if kv_ok else rep(lp["attn"]["k"]),
                "v": col(lp["attn"]["v"]) if kv_ok else rep(lp["attn"]["v"]),
                "o": row(lp["attn"]["o"]) if q_ok else rep(lp["attn"]["o"]),
            },
            "mlp": {},
        }
        for nk in ("q_norm", "k_norm"):  # qwen3/olmo2 q/k norms: replicated
            if nk in lp["attn"]:
                ls["attn"][nk] = {k: P() for k in lp["attn"][nk]}
        for k in lp["mlp"]:
            ls["mlp"][k] = row(lp["mlp"][k]) if k == "down" else col(lp["mlp"][k])
        if "moe" in lp:
            if "stacked" in lp["moe"]:
                # expert-index parallelism: shard the expert axis over the
                # model dimension when it divides E (each device computes its
                # local experts; XLA reduces the combine). Otherwise replicate.
                E = lp["moe"]["stacked"]["gate_w"].shape[0]
                e_spec = (P("model", None, None) if E % model_size == 0
                          else P(None, None, None))
                ls["moe"] = {
                    "router": rep(lp["moe"]["router"]),
                    "stacked": {k: e_spec for k in lp["moe"]["stacked"]},
                }
            else:
                # tensor-parallel within every expert (router replicated)
                ls["moe"] = {
                    "router": rep(lp["moe"]["router"]),
                    "experts": [
                        {"gate": col(e["gate"]), "up": col(e["up"]),
                         "down": row(e["down"])}
                        for e in lp["moe"]["experts"]
                    ],
                }
        specs["layers"].append(ls)
    return specs


def shard_params(cfg: ModelConfig, params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every parameter according to the TP policy."""
    specs = param_specs(cfg, params, mesh.shape.get("model", 1))

    leaves, treedef = jax.tree_util.tree_flatten(params)
    # flatten specs against the params structure so each PartitionSpec stays
    # a leaf (P is a tuple subclass; a plain tree_map would descend into it)
    spec_leaves = treedef.flatten_up_to(specs)
    placed = [jax.device_put(p, NamedSharding(mesh, s))
              for p, s in zip(leaves, spec_leaves)]
    return jax.tree_util.tree_unflatten(treedef, placed)


def cache_specs(cfg: ModelConfig, n_layers: int, model_size: int = 1):
    """KV cache spec: batch over data, kv heads over model (when divisible)."""
    head_axis = "model" if (model_size > 1 and
                            cfg.num_key_value_heads % model_size == 0) else None
    spec = P("data", None, head_axis, None)
    return [{"k": spec, "v": spec} for _ in range(n_layers)]


def shard_cache(cfg: ModelConfig, cache, mesh: Mesh):
    specs = cache_specs(cfg, len(cache), mesh.shape.get("model", 1))
    return [
        {k: jax.device_put(v, NamedSharding(mesh, s[k])) for k, v in lc.items()}
        for lc, s in zip(cache, specs)
    ]


__all__ = ["make_mesh", "param_specs", "shard_params", "cache_specs", "shard_cache"]
