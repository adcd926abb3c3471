"""Expert-index parallelism: stacked expert arrays sharded over the mesh.

The reference has no distributed backend at all (SURVEY §2.4); its MoE
support is the per-expert module list quantized one expert at a time
(``gptqmodel/models/definitions/mixtral.py`` layer_modules). This module is
the TPU-native serving-side complement: expert weights stacked into one
``[E, ...]`` array per projection, so the expert axis becomes a shardable
tensor dimension. Under GSPMD, placing E on the "model" mesh axis makes each
device hold and compute only its E/m local experts — the collective for the
routing-weighted combine (a reduce over e) is inserted by XLA and rides ICI.

This is a serving transform: quantization keeps the per-expert list (taps
attach per expert); stack after quantize/dequantize for deployment.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def stack_layer_experts(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Replace a layer's moe["experts"] list with moe["stacked"].

    Dense experts -> {"gate_w": [E, I, H], "up_w": [E, I, H],
    "down_w": [E, H, I]} (fp/bf16 — FAKE-format checkpoints or
    ``export_dequantized`` output).

    Quantized (w8/lut) experts -> the weights stay int8 in memory:
    {"gate_w": int8 [E, I, H], "gate_s": f32 [E, I], ...} with the
    per-row dequant scale applied on the OUTPUT side of each einsum
    (y[e] = (x @ w8[e]ᵀ)·s[e] — the same push-dequant-past-the-dot move as
    ops/w8_matmul). LUT experts are recoded to int8 first (the load-time
    serving fast path, ops/qlinear.recode_w8)."""
    moe = lp.get("moe")
    if not moe or "experts" not in moe:
        return lp
    from ..ops.qlinear import recode_w8

    experts = [{k: recode_w8(e[k]) for k in ("gate", "up", "down")}
               for e in moe["experts"]]
    kinds = {e[k].kind for e in experts for k in ("gate", "up", "down")}
    if kinds - {"dense", "w8"}:
        raise ValueError(
            "expert stacking supports dense/w8/lut/uniform experts "
            f"(got {kinds})")
    if len(kinds) != 1:
        raise ValueError(f"experts must share one kind to stack (got {kinds})")
    for e in experts:
        for k in ("gate", "up", "down"):
            if "bias" in e[k].arrays:
                raise ValueError("biased experts are not stackable yet")
    stacked: Dict[str, Any] = {}
    if kinds == {"dense"}:
        for k in ("gate", "up", "down"):
            stacked[f"{k}_w"] = jnp.stack([e[k]["weight"] for e in experts])
    else:
        for k in ("gate", "up", "down"):
            # w8 keeps pack-time K padding; slice to the true width so the
            # einsum contracts exactly over in_features
            kf = experts[0][k].in_features
            stacked[f"{k}_w"] = jnp.stack(
                [e[k]["w8"][:, :kf] for e in experts])
            stacked[f"{k}_s"] = jnp.stack(
                [e[k]["scale"][:, 0] for e in experts])
    out = dict(lp)
    out["moe"] = {k: v for k, v in moe.items() if k != "experts"}
    out["moe"]["stacked"] = stacked
    return out


def stack_experts(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a params copy with every MoE layer's experts stacked."""
    out = dict(params)
    out["layers"] = [stack_layer_experts(lp) for lp in params["layers"]]
    return out


__all__ = ["stack_experts", "stack_layer_experts"]
