"""Perplexity evaluation.

Two recipes, matching the reference:

- :func:`fixed_stride_ppl` — the GPTQ-paper protocol that produced the
  README accuracy numbers (reference
  ``examples/quantization/basic_usage_wikitext2.py:63-93``): split the token
  stream into non-overlapping windows of ``seqlen``, mean NLL over all
  positions, exp.
- :class:`Perplexity` — the sliding-window tool
  (``gptqmodel/utils/perplexity.py:128-163``): context window of ``n_ctx``
  advanced in chunks, NLL on the second half of each window.

Both operate on a pre-tokenized 1-D token array, so they are tokenizer- and
dataset-agnostic (dataset loading helpers live in ``evals/datasets.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("forward",))
def _window_nll(forward, params, ids: jax.Array) -> jax.Array:
    """Sum NLL of ids[1:] given ids[:-1] for one [1, seqlen] window."""
    logits = forward(params, ids)                     # [1, s, v]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def fixed_stride_ppl(forward: Callable, params, tokens: np.ndarray,
                     seqlen: int = 2048, limit: int | None = None) -> float:
    """GPTQ-style ppl: mean over windows of (mean NLL * seqlen) / seqlen, exp'd.

    ``forward(params, ids[1, s]) -> logits[1, s, v]`` must be jittable.
    """
    tokens = np.asarray(tokens).reshape(-1)
    n_windows = len(tokens) // seqlen
    if limit is not None:
        n_windows = min(n_windows, limit)
    if n_windows == 0:
        raise ValueError(f"need at least {seqlen} tokens, got {len(tokens)}")
    nlls = []
    for i in range(n_windows):
        ids = jnp.asarray(tokens[i * seqlen:(i + 1) * seqlen][None, :])
        nlls.append(float(_window_nll(forward, params, ids)))
    return float(np.exp(np.mean(nlls)))


def sliding_window_ppl(forward: Callable, params, tokens: np.ndarray,
                       n_ctx: int = 512, n_batch: int = 512) -> List[float]:
    """Reference Perplexity.calculate semantics: per-chunk running ppl list.

    Evaluates NLL of the second half of each n_ctx window (the first half is
    context), advancing by n_ctx; returns the running ppl after each chunk.
    """
    tokens = np.asarray(tokens).reshape(-1)
    n_chunk = len(tokens) // n_ctx
    nll_total, count = 0.0, 0
    out: List[float] = []
    for i in range(n_chunk):
        ids = jnp.asarray(tokens[i * n_ctx:(i + 1) * n_ctx][None, :])
        logits = forward(params, ids)
        logp = jax.nn.log_softmax(np.asarray(logits[0], np.float32), axis=-1)
        start = max(n_ctx // 2, 1)
        for j in range(start, n_ctx - 1):
            nll_total += -logp[j, int(tokens[i * n_ctx + j + 1])]
            count += 1
        out.append(float(np.exp(nll_total / count)))
    return out


__all__ = ["fixed_stride_ppl", "sliding_window_ppl"]
