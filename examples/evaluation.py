"""Evaluation drivers (reference examples/evaluation/*).

Every framework works fully offline:

- ``.perplexity`` — the paper-matching fixed-stride WikiText-2 perplexity
  (the recipe behind the reference README numbers);
- ``framework="mc"`` — offline multiple-choice loglikelihood accuracy
  (ARC-style examples);
- ``framework="mmlupro"`` — self-contained MMLU-Pro CoT loop (k-shot
  prompts, stop-string truncation, 3-stage answer extraction) over local
  JSON(L) rows;
- ``framework="evalplus"`` — evalplus-style pass@1 with subprocess-isolated
  execution over humaneval-schema JSONL;
- ``framework="lm_eval"`` — the lm-eval harness adapter, when the package
  is installed.
"""

from ganq_tpu import GanqModel
from ganq_tpu.evals.datasets import load_pretokenized

QUANT_DIR = "/path/to/llama-1b-ganq-w4"

q = GanqModel.load(QUANT_DIR).optimize()

# 1. paper-recipe perplexity: fixed-stride 2048-token windows
tokens = load_pretokenized("/path/to/wikitext2.test.npy")  # int32 [n_tokens]
print(f"wikitext2 ppl: {q.perplexity(tokens, seqlen=2048):.2f}")

# 2. offline multiple-choice (loglikelihood-ranked, ARC style)
examples = [{"query": "The capital of France is",
             "choices": [" Paris", " Berlin", " Rome"], "gold": 0}]
print("mc acc:", q.eval(framework="mc", examples=examples))

# 3. MMLU-Pro CoT (local JSONL rows)
print(q.eval(framework="mmlupro",
             test_path="/path/to/mmlupro_test.jsonl",
             val_path="/path/to/mmlupro_val.jsonl", ntrain=5))

# 4. code eval (humaneval-schema JSONL, subprocess-isolated execution)
print(q.eval(framework="evalplus", tasks_path="/path/to/humaneval.jsonl"))
