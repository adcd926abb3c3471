"""Minimal quantize -> save -> load -> generate walkthrough (reference
examples/quantization/basic_usage.py)."""

import numpy as np

from ganq_tpu import GanqModel, QuantizeConfig

MODEL_DIR = "/path/to/opt-125m"   # local HF-layout dir
OUT_DIR = "/path/to/opt-125m-ganq-w4"

qcfg = QuantizeConfig(
    bits=4, quant_method="ganq", ganq_iterations=10,
    act_sort="asc", l_damp_style="ganq", dead="mean",
)

model = GanqModel.load(MODEL_DIR, qcfg)
calib = ["ganq-tpu is a TPU-native quantized inference engine."] * 32
model.quantize(calib)
model.save(OUT_DIR)

q = GanqModel.load(OUT_DIR)
print(q.generate("ganq-tpu is", max_new_tokens=32))
