"""The GANQ W4 repro recipe — the accuracy contract from BASELINE.md.

Mirrors the reference's ``examples/quantization/basic_usage_wikitext2.py``:
calibrate on 32 x 2048-token C4 samples, quantize with the GANQ recipe
(bits=4, K=10, act_sort=asc, l_damp_style=ganq, dead=mean), evaluate
fixed-stride WikiText-2 perplexity at seqlen 2048, save the packed LUT
checkpoint.

Requires local copies of the model (HF layout dir) and datasets — this
script is dataset-gated: pass pre-tokenized .npy token files when the HF
datasets cache is unavailable (e.g. fully offline TPU pods):

  python examples/quantize_ganq_wikitext2.py MODEL_DIR OUT_DIR \
      [--calib-tokens calib.npy] [--eval-tokens wikitext_test.npy]
"""

import argparse

import numpy as np


def get_c4_calib(tokenizer, nsamples=32, seqlen=2048, seed=42):
    """C4 first-shard sampling, reference basic_usage_wikitext2.py:97-120."""
    from datasets import load_dataset
    rng = np.random.default_rng(seed)
    ds = load_dataset("allenai/c4", data_files="en/c4-train.00000-of-01024.json.gz",
                      split="train", streaming=True)
    out = []
    for row in ds:
        ids = np.asarray(tokenizer(row["text"])["input_ids"], np.int32)
        if len(ids) > seqlen:
            start = rng.integers(0, len(ids) - seqlen)
            out.append(ids[start:start + seqlen])
        if len(out) >= nsamples:
            break
    return out


def get_wikitext2_test(tokenizer):
    from datasets import load_dataset
    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
    return np.asarray(tokenizer("\n\n".join(ds["text"]))["input_ids"], np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--calib-tokens", default=None,
                    help=".npy [nsamples, seqlen] pre-tokenized calibration")
    ap.add_argument("--eval-tokens", default=None,
                    help=".npy 1-D pre-tokenized wikitext2 test stream")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--nsamples", type=int, default=32)
    args = ap.parse_args()

    from ganq_tpu import GanqModel, QuantizeConfig

    qcfg = QuantizeConfig(
        bits=4,
        quant_method="ganq",
        ganq_iterations=args.iterations,
        act_sort="asc",
        l_damp_style="ganq",
        dead="mean",
    )
    model = GanqModel.load(args.model_dir, qcfg)

    if args.calib_tokens:
        calib = list(np.load(args.calib_tokens))
    else:
        calib = get_c4_calib(model.tokenizer, args.nsamples, args.seqlen)

    model.quantize(calib, batch_size=1)
    model.save(args.out_dir)

    if args.eval_tokens:
        tokens = np.load(args.eval_tokens)
    else:
        tokens = get_wikitext2_test(model.tokenizer)
    ppl = model.perplexity(tokens, seqlen=args.seqlen)
    print(f"wikitext2 fixed-stride ppl @ seqlen {args.seqlen}: {ppl:.4f}")


if __name__ == "__main__":
    main()
