"""lmrs_tpu — a TPU-native (JAX/XLA/Pallas) quantized LLM inference framework.

Re-implements the full capability surface of samuel-vitorino/lm.rs (weight-only
Q8_0/Q4_0 group-quantized inference for Gemma-2 / Llama-3.2 / Phi-3.5 incl.
Phi-3.5-vision, SentencePiece-style tokenizer with chat templates, top-p
sampling, chat CLI and WebSocket serving) as an idiomatic TPU framework:
fused dequant-matmul kernels, jitted forward passes with an on-device KV
cache, and mesh-sharded weights/KV for multi-chip scaling.
"""

__version__ = "0.1.0"

from lmrs_tpu.config import ModelType, ModelConfig  # noqa: F401
from lmrs_tpu.quant import QuantType, QTensor  # noqa: F401
