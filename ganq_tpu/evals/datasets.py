"""Calibration / evaluation dataset helpers.

The library-surface home of the reference's data plumbing
(``gptqmodel/utils/data.py`` + the example loaders in
``examples/quantization/basic_usage_wikitext2.py:97-120``). All loaders are
gated on the ``datasets`` package and a reachable cache/mirror; fully offline
pods pass pre-tokenized ``.npy`` arrays instead (every consumer in this
framework accepts raw token arrays).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..utils.logger import get_logger

log = get_logger(__name__)


def get_c4_calibration(tokenizer, nsamples: int = 32, seqlen: int = 2048,
                       seed: int = 42) -> List[np.ndarray]:
    """C4 first-shard random windows — the GANQ calibration recipe
    (reference basic_usage_wikitext2.py:97-120; BASELINE.md)."""
    from datasets import load_dataset

    rng = np.random.default_rng(seed)
    ds = load_dataset(
        "allenai/c4",
        data_files="en/c4-train.00000-of-01024.json.gz",
        split="train", streaming=True)
    out: List[np.ndarray] = []
    for row in ds:
        ids = np.asarray(tokenizer(row["text"])["input_ids"], np.int32)
        if len(ids) > seqlen:
            start = int(rng.integers(0, len(ids) - seqlen))
            out.append(ids[start:start + seqlen])
        if len(out) >= nsamples:
            break
    if len(out) < nsamples:
        log.warning(f"only {len(out)}/{nsamples} C4 samples collected")
    return out


def get_wikitext2(tokenizer, split: str = "test") -> np.ndarray:
    """The '\\n\\n'-joined wikitext-2-raw token stream (the ppl recipe input,
    reference basic_usage_wikitext2.py:63-93)."""
    from datasets import load_dataset

    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    return np.asarray(tokenizer("\n\n".join(ds["text"]))["input_ids"], np.int32)


def load_pretokenized(path: str) -> np.ndarray:
    """Offline escape hatch: a .npy of token ids (1-D stream or [rows, seq])."""
    return np.load(path)


__all__ = ["get_c4_calibration", "get_wikitext2", "load_pretokenized"]
