"""GANQ-3: true 8-entry per-row codebooks, served exactly at 3 bits/weight.

The round-5 serving ladder for the paper's GANQ-3 configuration
(paper.md Table 5: 2.39-2.57x decode at 3-bit): quantize with bits=3
(the alternating solver fits an UNCONSTRAINED 8-entry codebook per row),
then pick a serving rung:

  load(...)                      -> exact walsh decode ("wl8" megastep):
                                    lossless, 3 bits/weight streamed;
                                    above bf16 throughput from batch ~64
                                    (PERF.md r5: 3026 vs 2786 tok/s at
                                    the 3B shape, b64)
  load(...).optimize()           -> per-128-group int8 recode (w8p/w8
                                    kernels): +0.15 of a +14.5 ppl delta
                                    measured, 1.7x bf16 at b8
  load(...).optimize(recode="u4")-> snap onto the per-row 16-level grid
                                    (W4 plane megastep, 2.3x-class) —
                                    measured 1.5x the free delta; prefer
                                    the bits=4 affine_sym SOLVE when
                                    W4-bytes speed is the goal

Usage:
  python examples/quantize_ganq3_lut8.py MODEL_DIR OUT_DIR \
      [--calib-tokens calib.npy]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--calib-tokens", default=None,
                    help=".npy int32 [n, seqlen] pre-tokenized rows")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--serve-demo", action="store_true",
                    help="greedy-generate through each serving rung")
    args = ap.parse_args()

    from ganq_tpu import GanqModel, QuantizeConfig

    qcfg = QuantizeConfig(bits=3, quant_method="ganq",
                          ganq_iterations=args.iterations,
                          act_sort="asc", l_damp_style="ganq", dead="mean")
    model = GanqModel.load(args.model_dir, qcfg)
    if args.calib_tokens:
        calib = [r for r in np.load(args.calib_tokens)]
    else:
        from examples.quantize_ganq_wikitext2 import get_c4_calib
        calib = get_c4_calib(model.tokenizer)
    model.quantize(calib)
    model.save(args.out_dir)
    print(f"saved GANQ-3 (8-entry LUT) checkpoint to {args.out_dir}")

    if args.serve_demo:
        prompt = "The capital of France is"
        q = GanqModel.load(args.out_dir)        # exact walsh serving
        print("exact wl8  :", q.generate(prompt, max_new_tokens=16))
        q = GanqModel.load(args.out_dir).optimize()
        print("int8 recode:", q.generate(prompt, max_new_tokens=16))
        q = GanqModel.load(args.out_dir).optimize(recode="u4")
        print("u4 snap    :", q.generate(prompt, max_new_tokens=16))


if __name__ == "__main__":
    main()
