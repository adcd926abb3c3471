"""Post-quantization EoRA generation.

The reference's ``GPTQModel.adapter.generate`` path (``models/auto.py:566-618``
-> ``_eora_generate`` base.py:461-524: DequantizeProcessor + EoraProcessor):
given an already-quantized model plus the original fp weights, fit per-module
low-rank correctors from calibration activations of the *quantized* model and
attach them (``lora_a``/``lora_b`` on each QLinear, applied in
``ops/qlinear.apply``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..adapter.eora import compute_eora
from ..models import hf_import
from ..models.registry import ArchSpec
from ..models.transformer import (ModelConfig, causal_mask,
                                  rope_for_layer, rope_tables_all)
from ..ops import qlinear
from ..utils.logger import get_logger
from .hessian import HessianAccumulator
from .looper import _embed_fwd, _layer_fwd, _full_name

log = get_logger(__name__)


def generate_eora(cfg: ModelConfig, fp_params: Dict[str, Any],
                  q_params: Dict[str, Any], spec: ArchSpec, rank: int,
                  calib_batches: Sequence[np.ndarray]) -> List[str]:
    """Attach EoRA adapters to every quantized linear of ``q_params``.

    Returns the list of module names that received adapters. The quantized
    model's own activations drive the covariance (dequantize-processor
    semantics, reference dequantize_processor.py:40-52)."""
    acts, ropes, masks = [], [], []
    for batch in calib_batches:
        arr = np.asarray(batch)
        if np.issubdtype(arr.dtype, np.floating):
            # pre-embedded [b, s, hidden] calibration (looper.py semantics)
            b, s = arr.shape[:2]
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
            acts.append(jnp.asarray(
                arr, q_params["embed_tokens"]["weight"].dtype))
        else:
            ids = jnp.asarray(arr)
            b, s = ids.shape
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
            acts.append(_embed_fwd(cfg, q_params, ids, positions))
        ropes.append(rope_tables_all(cfg, positions)
                     if cfg.pos == "rope" else None)
        masks.append(causal_mask(s, s))
    nsamples = sum(int(a.shape[0]) for a in acts)

    done: List[str] = []
    for li in range(cfg.num_hidden_layers):
        lp = q_params["layers"][li]
        slots = [(mod, spec.module_slots[mod]) for sub in spec.layer_modules
                 for mod in sub]
        win = cfg.layer_window(li)
        accs: Dict[str, HessianAccumulator] = {}
        for x, mask, rope in zip(acts, masks, ropes):
            # per-layer rope (dual-rope/NoPE models) + sliding window, like
            # the quantization looper — the covariance must be computed for
            # the function actually served
            _, _, taps = _layer_fwd(cfg, lp, x, mask,
                                    rope_for_layer(cfg, rope, li), True,
                                    window=win)
            for _, slot in slots:
                if slot in taps:
                    accs.setdefault(slot, HessianAccumulator(taps[slot].shape[-1]))
                    accs[slot].update(taps[slot])

        for mod, slot in slots:
            qmod = hf_import.get_module(q_params, li, slot)
            fmod = hf_import.get_module(fp_params, li, slot)
            if qmod is None or fmod is None or qmod.kind == "dense":
                continue
            w_fp = fmod["weight"].astype(jnp.float32)
            w_q = qlinear.dequantize_weight(qmod)
            cov = accs[slot].acc / max(nsamples, 1)
            A, B = compute_eora(w_fp - w_q, cov, rank)
            qmod["lora_a"] = A
            qmod["lora_b"] = B
            done.append(_full_name(spec, li, mod))

        # re-forward with adapters attached so later layers see corrected acts
        acts = [
            _layer_fwd(cfg, lp, x, mask, rope_for_layer(cfg, rope, li),
                       False, window=win)[0]
            for x, mask, rope in zip(acts, masks, ropes)
        ]
        log.info(f"eora: layer {li} done")
    return done


__all__ = ["generate_eora"]
