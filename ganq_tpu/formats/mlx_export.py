"""MLX (mlx-lm) checkpoint export.

The reference's MLX path dequantizes every module to fp16 and lets mlx
REquantize it — a lossy round trip (``gptqmodel/utils/mlx.py:22-153``,
``models/auto.py:509-523``). Because this framework stores the uniform
format's exact affine parameters, the export here maps them LOSSLESSLY onto
mlx's quantized-linear layout instead:

    mlx dequant:  w = scales_g * q + biases_g
    ours:         w = scale_g * (q - zero_g)
    =>            scales = scale,  biases = -scale * zero   (exact)

plus the mlx little-endian bit packing (``32/bits`` codes per uint32 along
the input dim). Modules whose config mlx cannot represent (non-uniform LUT
codebooks, w8 recode, group sizes outside {32, 64, 128}, 3-bit) are written
as fp16 — mlx-lm loads mixed checkpoints by probing for ``.scales`` keys.
No mlx installation is required: the writer emits plain safetensors +
config.json in mlx-lm's expected schema.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from ..ops.packing import unpack_int_rows
from ..ops.qlinear import QLinear, dequantize_weight
from ..utils.logger import get_logger

log = get_logger(__name__)

MLX_GROUP_SIZES = (32, 64, 128)
MLX_BITS = (2, 4, 8)  # 3-bit uses a non-integer packing in mlx; excluded


def _mlx_pack(q: np.ndarray, bits: int) -> np.ndarray:
    """[out, in] int codes -> [out, in*bits/32] uint32, little-endian along
    the input dim (mx.quantize layout)."""
    out, n = q.shape
    pf = 32 // bits
    q = q.astype(np.uint32).reshape(out, n // pf, pf)
    shifts = (np.arange(pf, dtype=np.uint32) * bits)[None, None, :]
    return np.bitwise_or.reduce(q << shifts, axis=-1).astype(np.uint32)


def _mlx_qparams(p) -> Optional[Dict[str, int]]:
    """(group_size, bits) if this QLinear maps exactly onto mlx, else None
    (cheap gate — no code unpacking)."""
    if not isinstance(p, QLinear) or p.kind != "uniform"             or p.bits not in MLX_BITS:
        return None
    n_groups = p["scales"].shape[1]
    K = p.in_features
    if K % max(n_groups, 1):
        return None
    gs = K // n_groups
    if gs not in MLX_GROUP_SIZES:
        return None
    g_idx = p.arrays.get("g_idx")
    if g_idx is not None and not np.array_equal(
            np.asarray(g_idx), np.arange(K) // gs):
        return None  # desc_act permutation has no mlx analog
    return {"group_size": gs, "bits": p.bits}


def _mlx_quantized(p: QLinear) -> Optional[Dict[str, np.ndarray]]:
    """Exact mlx mapping for a uniform-format QLinear, or None."""
    meta = _mlx_qparams(p)
    if meta is None:
        return None
    from ..ops.qlinear import uniform_zeros
    qweight, scales, zeros = p["qweight"], p["scales"], uniform_zeros(p)
    gs, K = meta["group_size"], p.in_features
    q = np.asarray(unpack_int_rows(qweight, p.bits, K))
    s = np.asarray(scales, np.float32)
    z = np.asarray(zeros, np.float32)
    return {
        "weight": _mlx_pack(q, p.bits),
        "scales": s.astype(np.float16),
        "biases": (-s * z).astype(np.float16),
    }


def export_mlx(save_dir: str, hf_config: Dict[str, Any], spec, params,
               n_layers: int, tokenizer=None) -> Dict[str, int]:
    """Write an mlx-lm-loadable checkpoint. Returns counts per kind."""
    from .checkpoint import _write_sharded

    state: Dict[str, np.ndarray] = {}
    stats = {"quantized": 0, "fp16": 0}

    def node(ours: str):
        cur: Any = params
        for part in ours.split("."):
            if isinstance(cur, QLinear):
                cur = cur.get(part) if part != "weight" else cur
                if part == "weight":
                    return cur
            elif isinstance(cur, dict):
                cur = cur.get(part)
            elif isinstance(cur, list):
                cur = cur[int(part)]
            else:
                return None
            if cur is None:
                return None
        return cur

    def each_name():
        for ours_tpl, theirs_tpl in spec.name_map.items():
            if "{i}" in ours_tpl:
                for i in range(n_layers):
                    yield ours_tpl.format(i=i), theirs_tpl.format(i=i)
            else:
                yield ours_tpl, theirs_tpl

    # mlx's config carries ONE (group_size, bits) pair for the whole model:
    # pick the MAJORITY config across mappable modules (first-encountered
    # order would let an outlier like the 8-bit/g32 lm_head demote the
    # entire body to fp16) and log every module demoted by the choice.
    from collections import Counter
    votes = Counter()
    for ours, _ in each_name():
        v = node(ours)
        meta = _mlx_qparams(v) if isinstance(v, QLinear) else None
        if meta is not None:
            votes[(meta["group_size"], meta["bits"])] += 1
    qparams: Optional[Dict[str, int]] = None
    if votes:
        gs, bits = votes.most_common(1)[0][0]
        qparams = {"group_size": gs, "bits": bits}

    def put(ours: str, theirs: str):
        v = node(ours)
        if v is None:
            return
        if isinstance(v, QLinear):
            prefix = theirs[:-len(".weight")] if theirs.endswith(".weight") \
                else theirs
            meta = _mlx_qparams(v)
            if meta is not None and meta == qparams:
                m = _mlx_quantized(v)
                for k, arr in m.items():
                    state[f"{prefix}.{k}"] = arr
                if "bias" in v.arrays:
                    state[f"{prefix}.bias"] = np.asarray(
                        v["bias"], np.float16)
                stats["quantized"] += 1
                return
            if meta is not None:
                log.info(f"mlx export: {prefix} ({meta['bits']}b/g"
                         f"{meta['group_size']}) differs from the model-wide "
                         f"{qparams} — written fp16")
            state[theirs] = np.asarray(dequantize_weight(v), np.float16)
            if "bias" in v.arrays:
                state[f"{prefix}.bias"] = np.asarray(v["bias"], np.float16)
            stats["fp16"] += 1
        else:
            state[theirs] = np.asarray(v, np.float16)
            stats["fp16"] += 1

    for ours, theirs in each_name():
        put(ours, theirs)

    os.makedirs(save_dir, exist_ok=True)
    _write_sharded(save_dir, state, 4 * 1024**3)
    cfg_out = dict(hf_config)
    # never carry the SOURCE checkpoint's quantization metadata into an
    # export whose tensors may be fp16
    cfg_out.pop("quantization_config", None)
    cfg_out.pop("quantization", None)
    if qparams is not None and stats["quantized"]:
        # mlx-lm reads config["quantization"]; modules without .scales keys
        # load as fp automatically (mlx_lm.utils class_predicate probing)
        cfg_out["quantization"] = dict(qparams)
        cfg_out["quantization_config"] = dict(qparams)
    cfg_out.pop("quantize_config", None)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(cfg_out, f, indent=2)
    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        try:
            tokenizer.save_pretrained(save_dir)
        except Exception as e:  # tokenizer saving is best-effort
            log.warning(f"tokenizer save failed: {e}")
    log.info(f"mlx export: {stats['quantized']} quantized modules, "
             f"{stats['fp16']} fp16 tensors -> {save_dir}")
    return stats


__all__ = ["export_mlx"]
