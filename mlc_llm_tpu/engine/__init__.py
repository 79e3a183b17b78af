"""Inference engine: jitted prefill/decode, generation loop, stats.

Replaces the reference's C++ LLMChatModule runtime loop
(/root/reference/cpp/llm_chat.cc:460-1076) with a JAX engine:
bucketed-static-shape prefill, a fused decode+sample step with donated
KV cache, host dispatch-ahead, and on-device sampling (only token ids
cross the device boundary, vs the reference's per-token vocab-size
logits copy at llm_chat.cc:938-946).
"""

from .engine import InferenceEngine, GenerationConfig
from .stats import RuntimeStats

__all__ = ["InferenceEngine", "GenerationConfig", "RuntimeStats"]
