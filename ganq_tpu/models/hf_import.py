"""HF checkpoint import: safetensors/state-dict -> ganq-tpu params pytree.

Replaces the reference's loader path (``gptqmodel/models/loader.py:116-204``,
accelerate dispatch, tied-weight handling) with a direct name-mapped
conversion driven by the registry's ``name_map``. Works from either an
in-memory state dict (tests: randomly-initialized ``transformers`` models)
or a directory of ``*.safetensors`` shards (real checkpoints).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import qlinear
from .registry import get_spec, resolve_spec
from .transformer import ModelConfig


def load_hf_config(model_dir: str) -> Dict[str, Any]:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def iter_safetensors(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    try:
        from safetensors import safe_open
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("safetensors is required to load checkpoints") from e
    for path in sorted(glob.glob(os.path.join(model_dir, "*.safetensors"))):
        with safe_open(path, framework="numpy") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def _set_nested(params: Dict[str, Any], dotted: str, value) -> None:
    parts = dotted.split(".")
    cur = params
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = value


def _get_nested(params: Dict[str, Any], dotted: str, default=None):
    cur = params
    for p in dotted.split("."):
        if isinstance(cur, list):
            try:
                cur = cur[int(p)]
            except (ValueError, IndexError):
                return default
        elif isinstance(cur, dict) and p in cur:
            cur = cur[p]
        else:
            return default
    return cur


def params_from_state_dict(state: Dict[str, np.ndarray], hf_config: Dict[str, Any],
                           dtype=jnp.float32) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Convert a HF state dict (numpy arrays) into (ModelConfig, params)."""
    spec = resolve_spec(get_spec(hf_config["model_type"]), hf_config)
    if spec.convert_state is not None:
        state = spec.convert_state(dict(state), hf_config)
    cfg = spec.make_config(hf_config)
    spec = spec.expand(cfg.num_experts)
    n_layers = cfg.num_hidden_layers

    raw: Dict[str, Any] = {"layers": {}}
    for ours_tpl, theirs_tpl in spec.name_map.items():
        if "{i}" in ours_tpl:
            for i in range(n_layers):
                theirs = theirs_tpl.format(i=i)
                if theirs in state:
                    ours = ours_tpl.format(i=i)
                    _set_nested(raw, ours, jnp.asarray(state[theirs], dtype=dtype))
        else:
            if theirs_tpl in state:
                _set_nested(raw, ours_tpl, jnp.asarray(state[theirs_tpl], dtype=dtype))

    # promote weight/bias dicts at linear slots into qlinear dense params
    def to_linear(d):
        if d is None or "weight" not in d:
            return None
        return qlinear.dense_linear(d["weight"], d.get("bias"))

    params: Dict[str, Any] = {"layers": []}
    params["embed_tokens"] = raw["embed_tokens"]
    if "embed_positions" in raw:
        params["embed_positions"] = raw["embed_positions"]
    if "embed_norm" in raw:
        params["embed_norm"] = raw["embed_norm"]
    for name in ("project_in", "project_out"):
        lin = to_linear(raw.get(name))
        if lin is not None:
            params[name] = lin
    if "final_norm" in raw:
        params["final_norm"] = raw["final_norm"]

    lm = to_linear(raw.get("lm_head"))
    tied = cfg.tie_word_embeddings
    if lm is not None and tied:
        # composite configs (qwen2_vl) can report tie_word_embeddings=True
        # in to_dict() while the model actually holds a DISTINCT lm_head —
        # trust the tensors over the flag
        emb_name = spec.name_map.get("embed_tokens.weight")
        lm_name = spec.name_map.get("lm_head.weight")
        if (emb_name in state and lm_name in state
                and (state[lm_name].shape != state[emb_name].shape
                     or not np.array_equal(np.asarray(state[lm_name]),
                                           np.asarray(state[emb_name])))):
            tied = False
    if lm is not None and not tied:
        params["lm_head"] = lm
    # tied: unembed falls back to embed_tokens

    for i in range(n_layers):
        rl = raw["layers"][str(i)]
        # missing linear weights are tolerated (their slots are filled from
        # packed artifacts by formats/checkpoint.load_quantized)
        lp: Dict[str, Any] = {
            "input_norm": rl["input_norm"],
            "post_norm": rl["post_norm"],
            "attn": {k: to_linear(rl.get("attn", {}).get(k))
                     for k in ("q", "k", "v", "o")},
        }
        for lk in ("q_a", "q_b", "kv_a", "kv_b"):  # deepseek MLA projections
            if lk in rl.get("attn", {}):
                lp["attn"][lk] = to_linear(rl["attn"][lk])
        for nk in ("q_norm", "k_norm",             # qwen3-family head norms
                   "q_a_norm", "kv_a_norm"):       # MLA bottleneck norms
            if nk in rl.get("attn", {}):
                lp["attn"][nk] = rl["attn"][nk]
        for nk in ("post_attn_norm", "post_mlp_norm"):  # gemma2 sandwich
            if nk in rl:
                lp[nk] = rl[nk]
        if "moe" in rl:
            experts_raw = rl["moe"].get("experts", {})
            experts = []
            for e in range(cfg.num_experts):
                ed = experts_raw.get(str(e), {})
                experts.append({k: to_linear(ed.get(k))
                                for k in ("gate", "up", "down")})
            lp["moe"] = {"router": to_linear(rl["moe"].get("router")),
                         "experts": experts}
            if "shared" in rl["moe"]:  # qwen2_moe always-on shared expert
                lp["moe"]["shared"] = {k: to_linear(rl["moe"]["shared"].get(k))
                                       for k in ("gate", "up", "down")}
            if "shared_gate" in rl["moe"]:
                lp["moe"]["shared_gate"] = to_linear(rl["moe"]["shared_gate"])
            if "router_bias" in rl["moe"]:  # deepseek v3 e_score_correction
                lp["moe"]["router_bias"] = rl["moe"]["router_bias"]
            lp["mlp"] = {}
        else:
            mlp = {}
            for k in ("gate", "up", "down"):
                if k in rl.get("mlp", {}):
                    mlp[k] = to_linear(rl["mlp"][k])
            lp["mlp"] = mlp
        params["layers"].append(lp)

    return cfg, params


def params_from_dir(model_dir: str, dtype=jnp.float32) -> Tuple[ModelConfig, Dict[str, Any]]:
    hf_config = load_hf_config(model_dir)
    state = {k: v for k, v in iter_safetensors(model_dir)}
    if not state:
        raise FileNotFoundError(f"no *.safetensors found in {model_dir}")
    return params_from_state_dict(state, hf_config, dtype=dtype)


def params_from_torch_model(model, dtype=jnp.float32) -> Tuple[ModelConfig, Dict[str, Any]]:
    """Convert a live ``transformers`` model (tests / random init)."""
    state = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    hf_config = model.config.to_dict()
    return params_from_state_dict(state, hf_config, dtype=dtype)


def get_module(params: Dict[str, Any], layer_idx: int, slot: str) -> Dict[str, Any]:
    """Fetch a linear slot like 'attn.q' / 'mlp.down' from layer layer_idx."""
    return _get_nested(params["layers"][layer_idx], slot)


def set_module(params: Dict[str, Any], layer_idx: int, slot: str, value) -> None:
    parts = slot.split(".")
    cur = params["layers"][layer_idx]
    for p in parts[:-1]:
        cur = cur[int(p)] if isinstance(cur, list) else cur[p]
    if isinstance(cur, list):
        cur[int(parts[-1])] = value
    else:
        cur[parts[-1]] = value


__all__ = ["params_from_state_dict", "params_from_dir", "params_from_torch_model",
           "load_hf_config", "get_module", "set_module"]
