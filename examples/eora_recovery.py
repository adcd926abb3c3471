"""Post-quant EoRA accuracy recovery (reference examples/eora/* suite).

Two ways to get EoRA adapters:

1. **In-loop** — pass ``adapter_rank`` in the QuantizeConfig and the looper
   computes adapters right after each module quantizes (reference
   EoraProcessor);
2. **Post-quant** (this script) — take an already-quantized checkpoint, the
   ORIGINAL fp checkpoint, and a calibration set; ``eora_generate`` runs the
   Dequantize+Eora pipeline (reference ``GPTQModel.adapter.generate``,
   auto.py:566-618) and writes a PEFT-style adapter that ``GanqModel.load``
   re-attaches automatically. The adapters apply FUSED in the serving
   dispatch (y += x @ A @ B per quantized linear).
"""

import numpy as np

from ganq_tpu import GanqModel

FP_DIR = "/path/to/Llama-3.2-1B"            # the original fp checkpoint
QUANT_DIR = "/path/to/llama-1b-ganq-w4"      # produced by .quantize()+.save()

q = GanqModel.load(QUANT_DIR)

# calibration: token rows (np arrays), {"input_ids": ...} dicts, or strings
rng = np.random.default_rng(0)
calib = ["EoRA recovers accuracy lost to quantization with a low-rank "
         "correction fitted on calibration activations."] * 32

adapted = q.eora_generate(FP_DIR, calib, rank=64, save_adapter_to=QUANT_DIR)
print(f"adapters attached to {len(adapted)} modules")

# generation now runs with the fused low-rank correction
print(q.generate("The capital of France is", max_new_tokens=24))

# any later load of QUANT_DIR picks the adapter up automatically
q2 = GanqModel.load(QUANT_DIR)
