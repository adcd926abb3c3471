"""Evalplus-style generative code evaluation (offline).

The reference drives the external ``evalplus`` package for humaneval/mbpp
(``gptqmodel/utils/evalplus.py``); this environment has no task-data egress,
so this module is a self-contained pass@1 evaluator over local JSONL tasks
with the humaneval schema: {"task_id", "prompt", "entry_point", "test"}
where ``test`` defines ``check(candidate)``.

Generated programs execute in a throwaway subprocess with a wall-clock
timeout and no inherited state — the same isolation model the evalplus
harness uses.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..utils.logger import get_logger

log = get_logger(__name__)

STOP_TOKENS = ["\ndef ", "\nclass ", "\nif __name__", "\nprint(", "\n#"]


def load_tasks(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def truncate_completion(text: str, stops: Sequence[str] = STOP_TOKENS) -> str:
    """Cut the generation at the first top-level continuation marker (the
    standard humaneval post-processing)."""
    cut = len(text)
    for s in stops:
        i = text.find(s)
        if i != -1:
            cut = min(cut, i)
    return text[:cut]


def run_program(program: str, timeout_s: float = 10.0) -> bool:
    """Execute ``program`` in a fresh python subprocess; pass = exit 0."""
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(program)
        path = f.name
    try:
        proc = subprocess.run([sys.executable, path], timeout=timeout_s,
                              capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_code_eval(generate_fn: Callable[[str], str],
                  tasks: Sequence[Dict[str, Any]],
                  timeout_s: float = 10.0,
                  limit: Optional[int] = None) -> Dict[str, Any]:
    """pass@1 over humaneval-schema tasks.

    The executed program is prompt + truncated completion + the task's
    ``check`` suite + a ``check(entry_point)`` call."""
    results: List[Dict[str, Any]] = []
    rows = list(tasks)[:limit] if limit else list(tasks)
    for task in rows:
        completion = truncate_completion(generate_fn(task["prompt"]))
        program = (task["prompt"] + completion + "\n\n" + task["test"]
                   + f"\n\ncheck({task['entry_point']})\n")
        ok = run_program(program, timeout_s=timeout_s)
        results.append({"task_id": task.get("task_id"), "pass": ok,
                        "completion": completion})
    n = len(results)
    return {"pass@1": (sum(r["pass"] for r in results) / n) if n else 0.0,
            "results": results}


__all__ = ["run_code_eval", "load_tasks", "truncate_completion",
           "run_program", "STOP_TOKENS"]
