"""Multimodal (VL) calibration capture.

The reference quantizes only the TEXT decoder layers of VL models
(qwen2-vl/ovis/mllama declare decoder ``layer_modules`` only,
``gptqmodel/models/definitions/qwen2_vl.py:38-44``); the vision tower stays
full-precision and merely produces the image-token embeddings that flow into
layer 0 during calibration. It captures those layer-0 inputs with a forward
pre-hook + aborting exception (``looper/module_looper.py:54-117``).

This module is the same capture, done once on the host: run the original
torch VL model (vision tower included) over multimodal calibration samples,
hook the FIRST decoder layer, and return its inputs as float arrays. Feed
them to ``GanqModel.quantize`` — ``prepare_dataset``/the looper accept
pre-embedded ``[seq, hidden]`` float rows directly (the TPU side then only
runs the text decoder, which is the part being quantized).

Rope caveat: the TPU decoder applies standard 1-D rope positions. For
llava-style models (1-D positions) the captured-calibration Hessians match
the reference exactly; qwen2-vl's mrope assigns 3-D positions to image
spans, so image-token rope differs slightly from HF inside layers 1+ —
calibration statistics shift marginally (text spans are identical). Prefer
text-heavy multimodal calibration there, like the reference's default
datasets.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class _CaptureDone(Exception):
    pass


def _find_decoder_layers(model) -> Any:
    """The largest ModuleList whose children share one class — the decoder
    stack in every HF text/VL model (the reference declares this path
    per-arch as ``layers_node``; a structural search covers remote-code
    models too)."""
    import torch.nn as nn

    best = None
    best_key = (-1, -1)
    for _, mod in model.named_modules():
        if isinstance(mod, nn.ModuleList) and len(mod) > 1:
            kinds = {type(m).__name__ for m in mod}
            if len(kinds) != 1:
                continue
            # prefer language DECODER stacks over vision towers: qwen2-vl's
            # 32 Qwen2VLVisionBlocks outnumber its 28 Qwen2VLDecoderLayers,
            # so size alone picks the wrong stack
            name = next(iter(kinds)).lower()
            is_decoder = int("decoderlayer" in name
                             or ("decoder" in name and "vision" not in name))
            key = (is_decoder, len(mod))
            if key > best_key:
                best, best_key = mod, key
    if best is None:
        raise ValueError("no decoder-layer ModuleList found; pass layers")
    return best


def capture_decoder_inputs(
    model,
    batches: Sequence[Dict[str, Any]],
    layers: Optional[Any] = None,
) -> List[Dict[str, np.ndarray]]:
    """Run ``model(**batch)`` per batch and capture the first decoder
    layer's input hidden states.

    ``batches``: processor outputs (``input_ids``, ``pixel_values``,
    ``attention_mask``, ...) or any kwargs the model's forward accepts.
    Returns rows ``[{"inputs_embeds": [seq, hidden] float32}]`` ready for
    ``GanqModel.quantize``. The forward is aborted right after layer 0's
    pre-hook fires (reference module_looper.py:54-117 semantics), so only
    the embedding + vision path actually runs.
    """
    import torch

    layer0 = (layers if layers is not None
              else _find_decoder_layers(model))[0]
    captured: List[np.ndarray] = []

    def hook(mod, args, kwargs):
        hs = args[0] if args else kwargs["hidden_states"]
        captured.append(hs.detach().to(torch.float32).cpu().numpy())
        raise _CaptureDone

    handle = layer0.register_forward_pre_hook(hook, with_kwargs=True)
    try:
        for batch in batches:
            kwargs = {k: (torch.as_tensor(v) if not torch.is_tensor(v) else v)
                      for k, v in dict(batch).items()}
            try:
                with torch.no_grad():
                    model(**kwargs)
            except _CaptureDone:
                pass
    finally:
        handle.remove()

    rows: List[Dict[str, np.ndarray]] = []
    for arr in captured:
        for row in arr.reshape(-1, arr.shape[-2], arr.shape[-1]):
            rows.append({"inputs_embeds": row})
    return rows


__all__ = ["capture_decoder_inputs"]
