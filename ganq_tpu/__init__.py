"""ganq-tpu: TPU-native LUT/uniform post-training quantization toolkit + runtime.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
GPTQModel+GANQ stack (see SURVEY.md): layer-wise PTQ (GPTQ uniform, GANQ
non-uniform per-row LUT), packed W4 checkpoint formats, fused dequant-matmul
Pallas kernels, quantized inference with KV cache and continuous batching,
EoRA adapters, eval tooling, and mesh-sharded multi-chip serving.
"""

from .core.config import FORMAT, QUANT_METHOD, QuantizeConfig

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: keep `import ganq_tpu` light (jax graph code loads on demand)
    if name == "GanqModel":
        from .api import GanqModel
        return GanqModel
    if name == "prepare_dataset":
        from .api import prepare_dataset
        return prepare_dataset
    raise AttributeError(f"module 'ganq_tpu' has no attribute {name!r}")


__all__ = ["FORMAT", "QUANT_METHOD", "QuantizeConfig", "GanqModel",
           "prepare_dataset", "__version__"]
