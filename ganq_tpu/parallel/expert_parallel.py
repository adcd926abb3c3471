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

from ..ops.qlinear import QLinear


def stack_layer_experts(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Replace a layer's moe["experts"] list with moe["stacked"]:
    {"gate_w": [E, I, H], "up_w": [E, I, H], "down_w": [E, H, I]}.

    Dense experts only (fp/bf16 — FAKE-format checkpoints or
    ``export_dequantized`` output); quantized expert kinds keep the
    per-expert path until stacked quantized kernels exist."""
    moe = lp.get("moe")
    if not moe or "experts" not in moe:
        return lp
    for e in moe["experts"]:
        for k in ("gate", "up", "down"):
            q = e[k]
            if not isinstance(q, QLinear) or q.kind != "dense":
                raise ValueError(
                    "expert stacking requires dense experts "
                    f"(got kind={getattr(q, 'kind', None)!r})")
            if "bias" in q.arrays:
                raise ValueError("biased experts are not stackable yet")
    out = dict(lp)
    out["moe"] = {
        "router": moe["router"],
        "stacked": {
            "gate_w": jnp.stack([e["gate"]["weight"] for e in moe["experts"]]),
            "up_w": jnp.stack([e["up"]["weight"] for e in moe["experts"]]),
            "down_w": jnp.stack([e["down"]["weight"] for e in moe["experts"]]),
        },
    }
    return out


def stack_experts(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a params copy with every MoE layer's experts stacked."""
    out = dict(params)
    out["layers"] = [stack_layer_experts(lp) for lp in params["layers"]]
    return out


__all__ = ["stack_experts", "stack_layer_experts"]
