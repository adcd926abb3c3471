"""Quantized checkpoint save/load.

Capability parity with the reference writer/loader
(``gptqmodel/models/writer.py:123-243``, ``loader.py:209-612``): sharded
safetensors + ``quantize_config.json`` (+ mirrored
``config.json.quantization_config``) + ``quant_log.csv``, optional sha256
hash verification — with a real packed LUT artifact for GANQ
(``{module}.lut`` fp16 [out, 2^bits] + ``{module}.idx_packed`` int32
[out, in/8]) instead of the reference's fake fp16 weights, and the
ecosystem GPTQ v1/v2 layout for uniform checkpoints (``gptq_compat.py``).
"""

from __future__ import annotations

import csv
import hashlib
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import FORMAT, QUANT_METHOD, QuantizeConfig
from ..models import hf_import
from ..models.registry import ArchSpec, get_spec, resolve_spec
from ..models.transformer import ModelConfig
from ..ops import qlinear
from ..ops.packing import pack_int_rows
from ..utils.logger import get_logger
from . import gptq_compat, qqq_compat

log = get_logger(__name__)

MAX_SHARD_BYTES = 4 * 1024**3  # reference _const.py:38 default


def _module_prefix(spec: ArchSpec, full_name: str) -> str:
    """'model.layers.0.self_attn.q_proj' style HF module prefix for a
    reference-convention module name like 'model.layers.0.self_attn.q_proj'
    — for lm_head it is just the lm_head name."""
    return full_name


def _hf_module_prefix(spec: ArchSpec, layer_idx: int, module_name: str) -> str:
    """Map our (layer, module) to the HF checkpoint module prefix by looking
    at the name_map's weight entry for the module's slot."""
    slot = spec.module_slots[module_name]
    tpl = spec.name_map[f"layers.{{i}}.{slot}.weight"]
    return tpl.format(i=layer_idx).rsplit(".weight", 1)[0]


def save_quantized(save_dir: str, hf_config: Dict[str, Any], qcfg: QuantizeConfig,
                   params: Dict[str, Any], artifacts: Dict[str, Any],
                   quant_log: Optional[List[Any]] = None,
                   max_shard_bytes: int = MAX_SHARD_BYTES,
                   extra_state: Optional[Dict[str, np.ndarray]] = None) -> None:
    """Write a self-contained quantized checkpoint directory.

    ``extra_state``: verbatim HF-named tensors to carry through unquantized —
    e.g. a VL model's ``visual.*`` vision tower (the reference keeps those fp
    in the checkpoint too, definitions/qwen2_vl.py quant_override_files)."""
    spec = resolve_spec(get_spec(hf_config["model_type"]), hf_config)
    cfg = spec.make_config(hf_config)
    spec = spec.expand(cfg.num_experts)
    os.makedirs(save_dir, exist_ok=True)

    state: Dict[str, np.ndarray] = {}

    # ---- non-quantized params under HF names
    def put(ours: str, theirs: str) -> None:
        parts = ours.split(".")
        cur: Any = params
        for p in parts:
            if isinstance(cur, qlinear.QLinear):
                cur = cur.get(p)
            elif isinstance(cur, dict):
                cur = cur.get(p)
            elif isinstance(cur, list):
                cur = cur[int(p)]
            else:
                cur = None
            if cur is None:
                return
        state[theirs] = np.asarray(cur)

    n_layers = cfg.num_hidden_layers
    fake = qcfg.format == FORMAT.FAKE
    quantized_prefixes = set()
    if not fake:  # FAKE saves the dequantized weights themselves
        for li in range(n_layers):
            for mod in spec.module_slots:
                full = f"{spec.layers_prefix}.{li}.{mod}"
                if full in artifacts:
                    quantized_prefixes.add(_hf_module_prefix(spec, li, mod))
    lm_head_quantized = spec.lm_head_name in artifacts and not fake

    for ours_tpl, theirs_tpl in spec.name_map.items():
        is_weight_of_quantized = False
        if "{i}" in ours_tpl:
            for i in range(n_layers):
                theirs = theirs_tpl.format(i=i)
                prefix = theirs.rsplit(".", 1)[0]
                if prefix in quantized_prefixes and theirs.endswith(".weight"):
                    continue  # replaced by packed artifact
                put(ours_tpl.format(i=i), theirs)
        else:
            if ours_tpl == "lm_head.weight" and lm_head_quantized:
                continue
            put(ours_tpl, theirs_tpl)

    # ---- packed artifacts (FAKE keeps fp weights only, reference
    #      qlinear/fake.py:65-89)
    for full_name, art in ([] if fake else artifacts.items()):
        if full_name == spec.lm_head_name:
            prefix = spec.lm_head_name
        else:
            head, mod = full_name.split(".", 2)[-1], None
            # full_name = f"{layers_prefix}.{li}.{module}"
            rest = full_name[len(spec.layers_prefix) + 1:]
            li_s, mod = rest.split(".", 1)
            prefix = _hf_module_prefix(spec, int(li_s), mod)

        if art.method == QUANT_METHOD.GANQ:
            lut = np.asarray(art.lut, np.float16)
            order = np.argsort(lut, axis=1, kind="stable")
            rank = np.argsort(order, axis=1, kind="stable")
            idx = np.asarray(art.idx)
            idx_sorted = np.take_along_axis(rank, idx, axis=1)
            state[f"{prefix}.lut"] = np.take_along_axis(lut, order, axis=1)
            state[f"{prefix}.idx_packed"] = np.asarray(
                pack_int_rows(jnp.asarray(idx_sorted), art.bits))
        elif qcfg.format == FORMAT.QQQ:
            qidx = np.asarray(art.qidx)
            scales = np.asarray(art.scale, np.float32)
            se = art.scale_extra
            if scales.shape[1] > 1:
                if se is None:
                    raise ValueError(
                        f"{full_name}: grouped QQQ needs scale_extra "
                        "(quantize with quant_method='qqq')")
                packed = qqq_compat.pack_qqq(qidx, scales,
                                             np.asarray(se, np.float32))
            else:
                # channel-only layout stores signed codes (zero point 8)
                packed = qqq_compat.pack_qqq(qidx - 8, None, scales[:, 0])
            for k, v in packed.items():
                state[f"{prefix}.{k}"] = v
        else:
            v1 = qcfg.format == FORMAT.GPTQ
            packed = gptq_compat.pack_gptq(
                np.asarray(art.qidx), np.asarray(art.scale), np.asarray(art.zero),
                np.asarray(art.g_idx), art.bits, v1=v1)
            for k, v in packed.items():
                state[f"{prefix}.{k}"] = v

    # ---- shard + write safetensors
    if extra_state:
        for k, v in extra_state.items():
            state.setdefault(k, np.asarray(v))
    _write_sharded(save_dir, state, max_shard_bytes)

    # ---- configs
    qcfg_dict = qcfg.to_dict()
    qcfg_dict.setdefault("meta", {})
    qcfg_dict["meta"]["quantizer"] = "ganq-tpu"
    with open(os.path.join(save_dir, "quantize_config.json"), "w") as f:
        json.dump(qcfg_dict, f, indent=2)
    hf_out = dict(hf_config)
    hf_out["quantization_config"] = qcfg_dict
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(hf_out, f, indent=2)

    # ---- EoRA adapter (reference writer.py:75-121: PEFT-style safetensors)
    lora_state: Dict[str, np.ndarray] = {}
    rank = 0
    target_modules = set()
    for full_name, art in artifacts.items():
        if getattr(art, "lora_a", None) is None:
            continue
        if full_name == spec.lm_head_name:
            prefix = spec.lm_head_name
        else:
            rest = full_name[len(spec.layers_prefix) + 1:]
            li_s, mod = rest.split(".", 1)
            prefix = _hf_module_prefix(spec, int(li_s), mod)
            target_modules.add(mod.rsplit(".", 1)[-1])
        lora_state[f"base_model.model.{prefix}.lora_A.weight"] = (
            np.ascontiguousarray(np.asarray(art.lora_a, np.float16)))
        lora_state[f"base_model.model.{prefix}.lora_B.weight"] = (
            np.ascontiguousarray(np.asarray(art.lora_b, np.float16)))
        rank = art.lora_a.shape[0]
    if lora_state:
        from safetensors.numpy import save_file
        save_file(lora_state, os.path.join(save_dir, "adapter_model.safetensors"))
        with open(os.path.join(save_dir, "adapter_config.json"), "w") as f:
            json.dump({"peft_type": "LORA", "r": rank, "lora_alpha": rank,
                       "target_modules": sorted(target_modules),
                       "task_type": "CAUSAL_LM"}, f, indent=2)

    # ---- quant log csv (reference writer.py:134-139)
    if quant_log:
        _write_quant_log(save_dir, quant_log)
    log.info(f"saved quantized checkpoint to {save_dir}")


def save_adapter(save_dir: str, spec: ArchSpec, params: Dict[str, Any],
                 num_layers: int) -> int:
    """Write post-quant EoRA adapters attached to ``params`` (lora_a/lora_b
    on QLinears) as PEFT-style safetensors (reference writer.py eora_save,
    used by the post-quant `adapter.generate` flow, auto.py:566-618).
    Returns the number of adapted modules."""
    lora_state: Dict[str, np.ndarray] = {}
    rank = 0
    target_modules = set()
    for li in range(num_layers):
        for mod, slot in spec.module_slots.items():
            p = hf_import.get_module(params, li, slot)
            if p is None or "lora_a" not in getattr(p, "arrays", {}):
                continue
            prefix = _hf_module_prefix(spec, li, mod)
            target_modules.add(mod.rsplit(".", 1)[-1])
            lora_state[f"base_model.model.{prefix}.lora_A.weight"] = (
                np.ascontiguousarray(np.asarray(p["lora_a"], np.float16)))
            lora_state[f"base_model.model.{prefix}.lora_B.weight"] = (
                np.ascontiguousarray(np.asarray(p["lora_b"], np.float16)))
            rank = p["lora_a"].shape[0]
    p = params.get("lm_head")
    if p is not None and "lora_a" in getattr(p, "arrays", {}):
        lora_state[f"base_model.model.{spec.lm_head_name}.lora_A.weight"] = (
            np.ascontiguousarray(np.asarray(p["lora_a"], np.float16)))
        lora_state[f"base_model.model.{spec.lm_head_name}.lora_B.weight"] = (
            np.ascontiguousarray(np.asarray(p["lora_b"], np.float16)))
        rank = p["lora_a"].shape[0]
    if not lora_state:
        return 0
    os.makedirs(save_dir, exist_ok=True)
    from safetensors.numpy import save_file
    save_file(lora_state, os.path.join(save_dir, "adapter_model.safetensors"))
    with open(os.path.join(save_dir, "adapter_config.json"), "w") as f:
        json.dump({"peft_type": "LORA", "r": rank, "lora_alpha": rank,
                   "target_modules": sorted(target_modules),
                   "task_type": "CAUSAL_LM"}, f, indent=2)
    return len(lora_state) // 2


def _write_quant_log(save_dir: str, quant_log) -> None:
    with open(os.path.join(save_dir, "quant_log.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["layer", "module", "method", "loss", "damp", "time"])
        for e in quant_log:
            w.writerow([e.layer, e.module, e.method,
                        f"{e.loss:.6f}", f"{e.damp:.5f}", f"{e.duration:.3f}"])


def _write_sharded(save_dir: str, state: Dict[str, np.ndarray],
                   max_shard_bytes: int) -> None:
    from safetensors.numpy import save_file

    # safetensors silently corrupts non-contiguous arrays
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    items = list(state.items())
    shards: List[Dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for k, v in items:
        nbytes = v.nbytes
        if sizes[-1] + nbytes > max_shard_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][k] = v
        sizes[-1] += nbytes

    if len(shards) == 1:
        save_file(shards[0], os.path.join(save_dir, "model.safetensors"))
        return
    index = {"metadata": {"total_size": sum(sizes)}, "weight_map": {}}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = f"model-{i+1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(save_dir, fname))
        for k in shard:
            index["weight_map"][k] = fname
    with open(os.path.join(save_dir, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2)


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_quantized(model_dir: str, verify_hash: Optional[Dict[str, str]] = None
                   ) -> Tuple[ModelConfig, Dict[str, Any], QuantizeConfig]:
    """Load a quantized checkpoint into (ModelConfig, params, QuantizeConfig).

    Quantized modules come back as packed QLinear pytrees; ``verify_hash``
    maps filename -> expected sha256 (reference utils/model.py:642-671).
    """
    hf_config = hf_import.load_hf_config(model_dir)
    qcfg = QuantizeConfig.from_pretrained(model_dir)
    spec = resolve_spec(get_spec(hf_config["model_type"]), hf_config)
    cfg = spec.make_config(hf_config)
    spec = spec.expand(cfg.num_experts)

    if verify_hash:
        for fname, expected in verify_hash.items():
            actual = sha256_file(os.path.join(model_dir, fname))
            if actual != expected:
                raise ValueError(f"hash mismatch for {fname}: {actual} != {expected}")

    state = {k: v for k, v in hf_import.iter_safetensors(model_dir)}

    # base (non-quantized) params — tolerant of missing linear weights
    _, params = hf_import.params_from_state_dict(state, hf_config)

    # fill quantized slots
    def build_qlinear(prefix: str, bits: int) -> Optional[qlinear.QLinear]:
        bias = state.get(f"{prefix}.bias")
        bias = jnp.asarray(bias) if bias is not None else None
        if f"{prefix}.lut" in state:
            lut = jnp.asarray(state[f"{prefix}.lut"]).astype(jnp.bfloat16)
            packed = jnp.asarray(state[f"{prefix}.idx_packed"])
            from ..ops.packing import pack_factor
            ql = qlinear.QLinear("lut", {"lut": lut, "idx_packed": packed},
                                 bits=bits,
                                 in_features=packed.shape[1] * pack_factor(bits))
            if bias is not None:
                ql["bias"] = bias
            return ql
        if f"{prefix}.B" in state:
            # QQQ format (formats/qqq_compat.py): rebuild a uniform QLinear
            q4, gsc, se = qqq_compat.unpack_qqq(
                {"B": state[f"{prefix}.B"],
                 "s_group": state.get(f"{prefix}.s_group"),
                 "s_channel": state[f"{prefix}.s_channel"]})
            out = q4.shape[0]
            if gsc is not None:
                qidx, scales = q4, gsc
            else:
                qidx, scales = q4 + 8, se.reshape(out, 1)
            zeros = np.full_like(scales, 8.0, dtype=np.float32)
            ql = qlinear.uniform_linear(
                jnp.asarray(qidx), jnp.asarray(scales, jnp.float32),
                jnp.asarray(zeros), None, 4, bias)
            if gsc is not None:
                ql["scale_extra"] = jnp.asarray(se, jnp.float32)
            return ql
        if f"{prefix}.qweight" in state:
            v1 = qcfg.format == FORMAT.GPTQ
            qidx, scales, zeros, g_idx = gptq_compat.unpack_gptq(
                {name: state[f"{prefix}.{name}"]
                 for name in ("qweight", "qzeros", "scales", "g_idx")},
                bits, v1=v1)
            return qlinear.uniform_linear(
                jnp.asarray(qidx), jnp.asarray(scales), jnp.asarray(zeros),
                jnp.asarray(g_idx), bits, bias)
        return None

    for li in range(cfg.num_hidden_layers):
        for mod, slot in spec.module_slots.items():
            full = f"{spec.layers_prefix}.{li}.{mod}"
            eff = qcfg.for_module(full)
            bits = eff.bits if eff else qcfg.bits
            prefix = _hf_module_prefix(spec, li, mod)
            ql = build_qlinear(prefix, bits)
            if ql is not None:
                hf_import.set_module(params, li, slot, ql)

    eff = qcfg.for_module(spec.lm_head_name)
    ql = build_qlinear(spec.lm_head_name, eff.bits if eff else qcfg.bits)
    if ql is not None:
        params["lm_head"] = ql

    # attach EoRA adapter if present
    adapter_path = os.path.join(model_dir, "adapter_model.safetensors")
    if os.path.isfile(adapter_path):
        from safetensors import safe_open
        with safe_open(adapter_path, framework="numpy") as f:
            lora = {k: f.get_tensor(k) for k in f.keys()}
        for li in range(cfg.num_hidden_layers):
            for mod, slot in spec.module_slots.items():
                prefix = _hf_module_prefix(spec, li, mod)
                a_key = f"base_model.model.{prefix}.lora_A.weight"
                if a_key in lora:
                    m = hf_import.get_module(params, li, slot)
                    m["lora_a"] = jnp.asarray(lora[a_key], jnp.float32)
                    m["lora_b"] = jnp.asarray(
                        lora[f"base_model.model.{prefix}.lora_B.weight"],
                        jnp.float32)

    return cfg, params, qcfg


__all__ = ["save_quantized", "load_quantized", "save_adapter",
           "sha256_file", "MAX_SHARD_BYTES"]
