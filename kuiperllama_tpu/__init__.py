"""kuiperllama_tpu — a TPU-native LLM inference framework.

Brand-new implementation of the capabilities of zjhellofss/KuiperLLama
(Llama-2/3.x + Qwen2.5 decoder inference, group-wise INT8 weight-only
quantization, llama2.c `.bin` checkpoints, SentencePiece / byte-level-BPE
tokenization, greedy + stochastic sampling) redesigned for TPU: pure
functional JAX forward pass, Pallas kernels for the hot ops, jax.sharding
for multi-chip/multi-host scale-out, and a continuous-batching serving loop.
"""

from .config import ModelConfig, tiny_config
from .quant import QuantArray, quantize_q80, dequantize

__version__ = "0.1.0"
