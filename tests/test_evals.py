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


def test_ganq_lm_constructs_against_pinned_abc(model):
    # full adapter coverage lives in tests/test_lm_eval_adapter.py
    from ganq_tpu.evals.harness import GanqLM
    from ganq_tpu.evals.lm_eval_stub import LM
    model.tokenizer = None  # construction must not need a tokenizer call
    assert isinstance(GanqLM(model), LM)


# ------------------------------------------------------------------ mmlupro
def test_mmlupro_cot_loop(tmp_path):
    """Prompt assembly (k-shot per category), stop-string truncation, and
    the 3-stage answer-extraction cascade (reference utils/mmlupro.py)."""
    from ganq_tpu.evals import mmlupro

    val = [{"question": "What is 1+1?", "options": ["1", "2", "N/A"],
            "answer": "B", "category": "math",
            "cot_content": "A: Let's think step by step. 1+1=2. "
                           "the answer is (B)."}]
    test = [
        {"question": "What is 2+2?", "options": ["3", "4"], "answer": "B",
         "category": "math"},
        {"question": "Capital of France?", "options": ["Paris", "Rome"],
         "answer": "A", "category": "geo"},
    ]
    import json
    vp = tmp_path / "val.json"
    vp.write_text(json.dumps(val))
    rows = mmlupro.load_rows(str(vp))
    assert rows[0]["options"] == ["1", "2"]  # N/A dropped

    prompts = []

    def gen(p):
        prompts.append(p)
        if "2+2" in p:
            # correct + trailing next-question text that must be truncated
            return (" 2+2 equals 4. the answer is (B).\n\n"
                    "Question:\nGARBAGE the answer is (A)")
        return " Hmm.\nAnswer: C"  # wrong (gold A), 2nd-stage extraction

    out = mmlupro.run_mmlupro(gen, test, rows, ntrain=5)
    assert out["acc"] == 0.5
    assert out["per_category"] == {"math": 1.0, "geo": 0.0}
    # k-shot exemplars only for same category, query block last
    assert "1+1" in prompts[0] and "think step by step" in prompts[0]
    assert "1+1" not in prompts[1]  # geo has no validation exemplars
    assert prompts[0].rstrip().endswith("Answer: Let's think step by step.")
    # extraction cascade stages
    assert mmlupro.extract_answer("blah the answer is (C) done") == "C"
    assert mmlupro.extract_answer("Answer: D") == "D"
    assert mmlupro.extract_answer("pick between A or E please") == "E"
    assert mmlupro.extract_answer("nothing here 123") is None


# ------------------------------------------------------------ evalplus-style
def test_code_eval_pass_at_1(tmp_path):
    from ganq_tpu.evals import codegen_eval

    tasks = [
        {"task_id": "t/0",
         "prompt": "def add(a, b):\n    \"\"\"Add two ints.\"\"\"\n",
         "entry_point": "add",
         "test": "def check(candidate):\n    assert candidate(1, 2) == 3\n"},
        {"task_id": "t/1",
         "prompt": "def sub(a, b):\n",
         "entry_point": "sub",
         "test": "def check(candidate):\n    assert candidate(3, 1) == 2\n"},
    ]

    def gen(prompt):
        if "add" in prompt:
            # correct body + trailing junk that truncation must drop
            return "    return a + b\n\ndef junk():\n    raise Exception()\n"
        return "    return a * b\n"  # wrong

    out = codegen_eval.run_code_eval(gen, tasks)
    assert out["pass@1"] == 0.5
    assert out["results"][0]["pass"] and not out["results"][1]["pass"]
    assert "junk" not in out["results"][0]["completion"]

    # timeout path: infinite loop fails, doesn't hang
    t = [{"task_id": "t/2", "prompt": "def f():\n", "entry_point": "f",
          "test": "def check(candidate):\n    candidate()\n"}]
    out2 = codegen_eval.run_code_eval(
        lambda p: "    while True:\n        pass\n", t, timeout_s=2.0)
    assert out2["pass@1"] == 0.0

    # jsonl loading
    import json
    tp = tmp_path / "tasks.jsonl"
    tp.write_text("\n".join(json.dumps(x) for x in tasks))
    assert len(codegen_eval.load_tasks(str(tp))) == 2
