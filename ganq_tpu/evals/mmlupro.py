"""Self-contained MMLU-Pro CoT evaluator (offline).

TPU-native counterpart of the reference's self-rolled loop
(``gptqmodel/utils/mmlupro.py``): k-shot chain-of-thought prompts built from
a validation split per category, generation stopped at the next
"Question:", and the reference's 3-stage answer-extraction regex cascade.

The reference downloads TIGER-Lab/MMLU-Pro via ``datasets``; this
environment has zero egress, so rows come from local JSON(L) files with the
same schema: {"question", "options": [..], "answer": "A".."P",
"cot_content", "category"}.

The model side is a ``generate_fn(prompt: str) -> str`` so the evaluator is
engine-agnostic (tests stub it; ``GanqModel.eval(framework="mmlupro")``
wires ``GanqModel.generate``).
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..utils.logger import get_logger

log = get_logger(__name__)

CHOICES = ["A", "B", "C", "D", "E", "F", "G", "H",
           "I", "J", "K", "L", "M", "N", "O", "P"]
STOP_STRING = "Question:"


def load_rows(path: str) -> List[Dict[str, Any]]:
    """Load rows from a .json (list) or .jsonl file, dropping "N/A" options
    (the reference's preprocess, mmlupro.py:30-40)."""
    rows: List[Dict[str, Any]] = []
    with open(path) as f:
        if path.endswith(".jsonl"):
            rows = [json.loads(line) for line in f if line.strip()]
        else:
            rows = json.load(f)
    for r in rows:
        r["options"] = [o for o in r.get("options", []) if o != "N/A"]
    return rows


def format_cot_example(example: Dict[str, Any],
                       including_answer: bool = True) -> str:
    """One Question/Options/Answer block (reference format_cot_example)."""
    prompt = "Question:\n" + example["question"] + "\n" + "Options:\n"
    for i, opt in enumerate(example["options"]):
        prompt += "{}. {}\n".format(CHOICES[i], opt)
    if including_answer:
        cot = example.get("cot_content", "").replace(
            "A: Let's think step by step.", "Answer: Let's think step by step.")
        prompt += cot + "\n\n"
    else:
        prompt += "Answer: Let's think step by step."
    return prompt


def generate_cot_prompt(val_rows: Sequence[Dict[str, Any]],
                        curr: Dict[str, Any], k: int) -> str:
    """k-shot prompt: same-category validation exemplars + the query."""
    subject = curr["category"]
    head = ("The following are multiple choice questions (with answers) "
            "about {$}. Think step by step and then finish your answer "
            "with 'the answer is (X)' where X is the correct letter "
            "choice.\n\n\n").replace("{$}", subject) + "\n"
    shots = [r for r in val_rows if r.get("category") == subject][:k]
    for ex in shots:
        head += format_cot_example(ex, including_answer=True)
    return head + format_cot_example(curr, including_answer=False)


def extract_answer(text: str) -> Optional[str]:
    """The reference's 3-stage cascade: 'answer is (X)', then 'Answer: X',
    then the last standalone A-J letter."""
    m = re.search(r"answer is \(?([A-J])\)?", text)
    if m:
        return m.group(1)
    m = re.search(r".*[aA]nswer:\s*([A-J])", text)
    if m:
        return m.group(1)
    m = re.search(r"\b[A-J]\b(?!.*\b[A-J]\b)", text, re.DOTALL)
    return m.group(0) if m else None


def run_mmlupro(generate_fn: Callable[[str], str],
                test_rows: Sequence[Dict[str, Any]],
                val_rows: Sequence[Dict[str, Any]],
                ntrain: int = 5,
                limit: Optional[int] = None) -> Dict[str, Any]:
    """Evaluate; returns overall + per-category accuracy and predictions.

    Generation is truncated at the first STOP_STRING occurrence (the
    reference passes stop_strings="Question:" to HF generate)."""
    per_cat: Dict[str, List[bool]] = {}
    preds: List[Dict[str, Any]] = []
    rows = list(test_rows)[:limit] if limit else list(test_rows)
    for row in rows:
        prompt = generate_cot_prompt(val_rows, row, ntrain)
        text = generate_fn(prompt)
        text = text.split(STOP_STRING, 1)[0]
        pred = extract_answer(text)
        ok = pred is not None and pred == row["answer"]
        per_cat.setdefault(row.get("category", "all"), []).append(ok)
        preds.append({"pred": pred, "gold": row["answer"], "correct": ok})
    cat_acc = {c: sum(v) / len(v) for c, v in per_cat.items()}
    total = [ok for v in per_cat.values() for ok in v]
    return {"acc": (sum(total) / len(total)) if total else 0.0,
            "per_category": cat_acc, "predictions": preds}


__all__ = ["run_mmlupro", "load_rows", "generate_cot_prompt",
           "format_cot_example", "extract_answer", "CHOICES", "STOP_STRING"]
