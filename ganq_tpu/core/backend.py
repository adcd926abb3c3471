"""Kernel backend enum + capability-based auto-selection.

The TPU redesign of the reference's kernel-importer system
(``gptqmodel/utils/backend.py:20-42`` BACKEND enum;
``utils/importer.py:45-268`` ``AUTO_SELECT_BACKEND_ORDER`` + per-kernel
``SUPPORTS_*`` validation, ``nn_modules/qlinear/__init__.py:33-372``):
instead of ten kernel classes with class-var capability matrices, each
compute path declares a :class:`Capability` predicate over (format kind,
bits, device platform, shape divisibility), and :func:`select_backend`
walks the priority order picking the first path that validates for *every*
quantized module in the model.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax

from ..utils.logger import get_logger

log = get_logger(__name__)


class BACKEND(str, Enum):
    AUTO = "auto"
    PALLAS_A8 = "pallas_a8"    # int8 MXU path (w8-recoded LUT models)
    PALLAS = "pallas"          # fused dequant-matmul kernels
    REFERENCE = "reference"    # XLA dequant + matmul (the oracle)
    FAKE = "fake"              # dense weights (fp fallback / FAKE format)

    def __str__(self) -> str:
        return self.value


@dataclass
class Capability:
    backend: BACKEND
    requires_tpu: bool
    kinds: Tuple[str, ...]          # QLinear kinds the path accepts
    bits: Tuple[int, ...]
    validate: Optional[Callable[[Any], Optional[str]]] = None  # -> reason or None


CAPABILITIES: List[Capability] = [
    Capability(BACKEND.PALLAS_A8, requires_tpu=True,
               kinds=("w8", "uniform", "dense"), bits=(4, 8, 16)),
    # the fused kernels are total: unaligned shapes / desc_act g_idx
    # silently take the in-module XLA reference path, so no shape predicate
    Capability(BACKEND.PALLAS, requires_tpu=True,
               kinds=("lut", "uniform", "w8", "dense"), bits=(2, 3, 4, 8, 16)),
    Capability(BACKEND.REFERENCE, requires_tpu=False,
               kinds=("lut", "uniform", "w8", "dense"), bits=(2, 3, 4, 8, 16)),
    Capability(BACKEND.FAKE, requires_tpu=False, kinds=("dense",), bits=(16,)),
]

# priority, mirroring importer.py:45-58's marlin->exllama->...->torch order
AUTO_SELECT_BACKEND_ORDER = [BACKEND.PALLAS_A8, BACKEND.PALLAS,
                             BACKEND.REFERENCE, BACKEND.FAKE]


def iter_qlinears(params: Dict[str, Any]):
    from ..ops.qlinear import QLinear

    def walk(node):
        if isinstance(node, QLinear):
            yield node
        elif isinstance(node, dict):
            for v in node.values():
                yield from walk(v)
        elif isinstance(node, list):
            for v in node:
                yield from walk(v)

    yield from walk(params)


def validate_backend(backend: BACKEND, params: Dict[str, Any],
                     on_tpu: Optional[bool] = None) -> Optional[str]:
    """None if every quantized module can run on ``backend``, else the reason."""
    if on_tpu is None:
        on_tpu = jax.default_backend() != "cpu"
    cap = next((c for c in CAPABILITIES if c.backend == backend), None)
    if cap is None:
        return f"unknown backend {backend}"
    if cap.requires_tpu and not on_tpu:
        return f"{backend} requires a TPU device"
    for p in iter_qlinears(params):
        if p.kind == "dense":
            continue
        if p.kind not in cap.kinds:
            return f"{backend} does not support kind={p.kind}"
        if p.bits not in cap.bits:
            return f"{backend} does not support bits={p.bits}"
        if cap.validate is not None:
            reason = cap.validate(p)
            if reason:
                return reason
    return None


def select_backend(params: Dict[str, Any],
                   preference: BACKEND = BACKEND.AUTO,
                   on_tpu: Optional[bool] = None) -> BACKEND:
    """First backend in priority order that validates for the whole model.

    With an explicit preference, validation failures raise (the reference's
    behavior when a user pins an incompatible kernel, importer.py:157-268).
    """
    if preference != BACKEND.AUTO:
        reason = validate_backend(preference, params, on_tpu)
        if reason:
            raise ValueError(f"backend {preference} not usable: {reason}")
        return preference
    for cand in AUTO_SELECT_BACKEND_ORDER:
        reason = validate_backend(cand, params, on_tpu)
        if reason is None:
            log.info(f"auto-selected kernel backend: {cand}")
            return cand
        log.debug(f"backend {cand} rejected: {reason}")
    return BACKEND.REFERENCE


__all__ = ["BACKEND", "Capability", "select_backend", "validate_backend",
           "AUTO_SELECT_BACKEND_ORDER", "CAPABILITIES"]
