"""Eval harness tests: loglikelihood math, multiple-choice accuracy on a
constructed task where the right answer is known."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ganq_tpu.evals.harness import multiple_choice_eval, sequence_loglikelihood
from ganq_tpu.evals.perplexity import fixed_stride_ppl, sliding_window_ppl
from ganq_tpu.models import synthetic, transformer


class M:
    def __init__(self, cfg, params, backend="reference"):
        self.cfg = cfg
        self.params = params
        self.backend = backend


@pytest.fixture(scope="module")
def model():
    cfg = synthetic.llama_config(hidden=64, inter=128, layers=2, heads=4,
                                 kv_heads=2, vocab=64, max_pos=128)
    return M(cfg, synthetic.make_model(cfg, kind="dense", seed=9))


def test_loglikelihood_matches_manual(model, rng):
    ctx = rng.integers(0, 64, size=(6,)).tolist()
    cont = rng.integers(0, 64, size=(4,)).tolist()
    ll, greedy = sequence_loglikelihood(model, ctx, cont)

    ids = np.asarray(ctx + cont)
    logits = np.asarray(transformer.forward(model.cfg, model.params,
                                            jnp.asarray(ids[None])), np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits[0]), axis=-1)
    manual = sum(float(logp[len(ctx) - 1 + i, cont[i]]) for i in range(4))
    assert abs(ll - manual) < 1e-3
    assert isinstance(greedy, bool)


def test_multiple_choice_prefers_likely_continuation(model, rng):
    """Construct examples whose gold choice is the model's own greedy
    continuation — the evaluator must score them correct."""
    examples = []
    for _ in range(5):
        ctx = rng.integers(0, 64, size=(8,)).tolist()
        logits = transformer.forward(model.cfg, model.params,
                                     jnp.asarray(np.asarray(ctx)[None]))
        best = int(jnp.argmax(logits[0, -1]))
        worst = int(jnp.argmin(logits[0, -1]))
        examples.append({"query": ctx, "choices": [[worst], [best]], "gold": 1})
    res = multiple_choice_eval(model, examples)
    assert res["acc"] == 1.0


def test_sliding_window_ppl(model, rng):
    tokens = rng.integers(0, 64, size=(256,))
    fwd = lambda p, ids: transformer.forward(model.cfg, p, ids)
    out = sliding_window_ppl(fwd, model.params, tokens, n_ctx=64)
    assert len(out) == 4
    assert all(np.isfinite(v) and v > 1 for v in out)


def test_ganq_lm_requires_lm_eval(model):
    from ganq_tpu.evals.harness import GanqLM
    try:
        import lm_eval  # noqa: F401
        pytest.skip("lm_eval installed; adapter constructs")
    except ImportError:
        with pytest.raises(RuntimeError, match="lm-eval is not installed"):
            GanqLM(model)
