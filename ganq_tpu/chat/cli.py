"""Interactive chat REPL over a (quantized) checkpoint.

Parity with the reference's ``chat/chat.py``: load a model dir, apply the
tokenizer's chat template, stream turns through ``GanqModel.generate``.

Usage: python -m ganq_tpu.chat.cli <model_dir> [--max-new-tokens N]
       [--temperature T] [--top-k K] [--system PROMPT]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="ganq-tpu chat")
    ap.add_argument("model_dir")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.7)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--system", default=None)
    args = ap.parse_args(argv)

    from ganq_tpu import GanqModel

    model = GanqModel.load(args.model_dir)
    if model.tokenizer is None:
        print("error: no tokenizer found in model dir", file=sys.stderr)
        return 1
    tok = model.tokenizer

    messages = []
    if args.system:
        messages.append({"role": "system", "content": args.system})
    print("ganq-tpu chat — empty line or /exit to quit, /reset to clear")
    while True:
        try:
            user = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not user or user == "/exit":
            break
        if user == "/reset":
            messages = messages[:1] if args.system else []
            continue
        messages.append({"role": "user", "content": user})
        if getattr(tok, "chat_template", None):
            prompt = tok.apply_chat_template(messages, tokenize=False,
                                             add_generation_prompt=True)
        else:
            prompt = "\n".join(f"{m['role']}: {m['content']}" for m in messages)
            prompt += "\nassistant:"
        reply = model.generate(prompt, max_new_tokens=args.max_new_tokens,
                               temperature=args.temperature, top_k=args.top_k)
        reply = reply.strip()
        print(reply)
        messages.append({"role": "assistant", "content": reply})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
