"""Evaluation harness: lm-eval bridge + self-contained tasks.

Parity with the reference's eval stack (``gptqmodel/models/auto.py:318-494``
drives lm-eval / evalplus; ``utils/mmlupro.py`` is a self-rolled CoT loop):

- :class:`GanqLM` — an ``lm_eval.api.model.LM`` implementation over our
  engine, so ``lm_eval.simple_evaluate(model=GanqLM(m), tasks=[...])`` works
  wherever the lm-eval package and task data are available.
- :func:`multiple_choice_eval` — a dependency-free loglikelihood
  multiple-choice evaluator (ARC/HellaSwag/PIQA-style tasks from local JSON),
  usable in fully offline environments.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import forward
from ..utils.logger import get_logger

log = get_logger(__name__)


def sequence_loglikelihood(model, context_ids: Sequence[int],
                           continuation_ids: Sequence[int]) -> Tuple[float, bool]:
    """(sum log P(continuation | context), greedy_exact_match)."""
    ids = np.asarray(list(context_ids) + list(continuation_ids), np.int32)
    logits = forward(model.cfg, model.params, jnp.asarray(ids[None, :]),
                     backend=model.backend)
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    n_ctx = len(context_ids)
    tgt = ids[n_ctx:]
    pred_slice = np.asarray(logp[n_ctx - 1: len(ids) - 1])  # predicts ids[n_ctx:]
    ll = float(np.sum(pred_slice[np.arange(len(tgt)), tgt]))
    greedy = bool(np.all(pred_slice.argmax(axis=-1) == tgt))
    return ll, greedy


def multiple_choice_eval(model, examples: Sequence[Dict[str, Any]],
                         tokenizer=None, length_normalized: bool = True
                         ) -> Dict[str, float]:
    """Accuracy over multiple-choice examples.

    Each example: {"query": str|ids, "choices": [str|ids, ...], "gold": int}.
    Strings require a tokenizer. Returns {"acc": ..., "acc_norm": ...}.
    """
    n_correct = n_correct_norm = 0
    for ex in examples:
        q = ex["query"]
        ctx = (tokenizer(q)["input_ids"] if isinstance(q, str) else list(q))
        lls, lls_norm = [], []
        for ch in ex["choices"]:
            cont = (tokenizer(ch)["input_ids"] if isinstance(ch, str) else list(ch))
            ll, _ = sequence_loglikelihood(model, ctx, cont)
            lls.append(ll)
            lls_norm.append(ll / max(len(cont), 1))
        gold = int(ex["gold"])
        n_correct += int(np.argmax(lls) == gold)
        n_correct_norm += int(np.argmax(lls_norm) == gold)
    n = len(examples)
    return {"acc": n_correct / n, "acc_norm": n_correct_norm / n}


class GanqLM:
    """lm-eval harness adapter: a real ``lm_eval.api.model.LM`` subclass.

    Built against the actual lm-eval package when importable; otherwise
    against :mod:`ganq_tpu.evals.lm_eval_stub`, which pins the same ABC
    surface (three request methods, ``Instance.args`` tuples, return
    shapes) so the adapter is exercised offline rather than dead code.
    Mirrors the reference's lm-eval drive path
    (``gptqmodel/models/auto.py:380-452``).
    """

    def __new__(cls, model, batch_size: int = 1):
        try:
            from lm_eval.api.model import LM
        except ImportError:
            from .lm_eval_stub import LM

        class _Impl(LM):
            def __init__(self, m):
                super().__init__()
                self.m = m
                self.tok = m.tokenizer

            def loglikelihood(self, requests):
                out = []
                for req in requests:
                    ctx, cont = req.args
                    ctx_ids = self.tok(ctx)["input_ids"] if ctx else \
                        [self.tok.eos_token_id]
                    cont_ids = self.tok(cont, add_special_tokens=False)["input_ids"]
                    out.append(sequence_loglikelihood(self.m, ctx_ids, cont_ids))
                return out

            def loglikelihood_rolling(self, requests):
                # returns List[float] (lm_eval.api.model.LM contract; the
                # 0.3.x tuple convention is gone — see evals/lm_eval_vendor)
                out = []
                for req in requests:
                    (text,) = req.args
                    ids = self.tok(text)["input_ids"]
                    ll, _ = sequence_loglikelihood(self.m, ids[:1], ids[1:])
                    out.append(ll)
                return out

            def generate_until(self, requests):
                out = []
                for req in requests:
                    ctx, kwargs = req.args
                    text = self.m.generate(ctx, max_new_tokens=int(
                        kwargs.get("max_gen_toks", 128)))
                    for stop in kwargs.get("until", []):
                        if stop in text:
                            text = text.split(stop)[0]
                    out.append(text)
                return out

        return _Impl(model)


__all__ = ["GanqLM", "multiple_choice_eval", "sequence_loglikelihood"]
