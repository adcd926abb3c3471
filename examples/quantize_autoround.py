"""AutoRound quantization: native signed-gradient rounding optimization.

The reference delegates this method to the external auto-round package
(gptqmodel/models/base.py:638-707); here it is a first-class jitted solver.
Two scopes:
- module (default): per-linear Hessian-weighted objective — cheap, no
  activation replay;
- block: jointly tunes each decoder layer against its output MSE (the
  external package's nblocks=1 default granularity).

Artifacts land in the ecosystem GPTQ format, so the checkpoint loads in
vLLM/SGLang and serves here through the W4A8 / int8-recode kernels.

    PYTHONPATH=/root/repo python examples/quantize_autoround.py <model_dir> <out_dir>
"""
import sys

import numpy as np

from ganq_tpu import GanqModel, QuantizeConfig

model_dir, out_dir = sys.argv[1], sys.argv[2]

qcfg = QuantizeConfig(
    bits=4, group_size=128, quant_method="auto_round",
    autoround_iters=200,          # the package default
    autoround_scope="module",     # or "block" for layer-output MSE
    lm_head=False,
)
m = GanqModel.load(model_dir, qcfg)

# calibration: 32 x 2048-token rows (strings are tokenized when the model
# dir has a tokenizer; raw id arrays and pre-embedded rows also work)
rng = np.random.default_rng(0)
calib = [rng.integers(1, m.cfg.vocab_size, size=(2048,)).astype(np.int32)
         for _ in range(32)]  # replace with real C4 rows
m.quantize(calib, batch_size=4)
m.save(out_dir)

q = GanqModel.load(out_dir)
q.optimize()                      # int8 MXU fast path
print(q.generate(np.asarray([[1, 2, 3, 4]], np.int32), max_new_tokens=8))
