"""Model families: Llama/Vicuna, GPT-NeoX (Dolly/StableLM/RedPajama), MOSS.

One generic pre-norm decoder (transformer.py) parameterized by
ModelConfig covers all three families; family differences (norm type,
residual wiring, rotary swizzle/pct, activation, biases) are config
flags rather than per-family graph builders — unlike the reference's
three ~650-line relax_model files, the math is identical
(SURVEY.md §2.5).
"""

from .config import ModelConfig, MODEL_REGISTRY, get_config
from .transformer import forward, init_random_params, KVCache, init_kv_cache

__all__ = [
    "ModelConfig",
    "MODEL_REGISTRY",
    "get_config",
    "forward",
    "init_random_params",
    "KVCache",
    "init_kv_cache",
]
