"""Unified model configuration + the reference's supported-model zoo.

Registry contents mirror /root/reference/mlc_llm/utils.py:13-64 (model
list + conv-template mapping) with per-model hyperparameters from
llama.py:12-54, gpt_neox.py:34-117, moss.py:30-69.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str
    family: str  # "llama" | "gpt_neox" | "moss"
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int  # == num_heads for all reference families (GQA-ready)
    max_seq_len: int = 2048
    norm_eps: float = 1e-5
    norm_type: str = "layernorm"  # "rmsnorm" (llama) | "layernorm"
    # rotary
    rotary_pct: float = 1.0
    rotary_base: float = 10000.0
    rotary_style: str = "neox"  # "neox" (rotate-half) | "gptj" (rotate-pairs)
    # block wiring
    parallel_residual: bool = False  # neox flag / always True for moss
    single_norm: bool = False  # moss/GPT-J: one LN feeding both attn & mlp
    # mlp
    act: str = "gelu"  # "silu_gated" | "gelu" | "gelu_new"
    # biases
    qkv_bias: bool = False
    out_bias: bool = False
    mlp_bias: bool = False
    lm_head_bias: bool = False
    # numerics
    fp32_lm_head: bool = False  # neox: embed_out always fp32 (gpt_neox.py:474-479)
    # chat metadata
    conv_template: str = "vicuna_v1.1"
    bos_token_id: Optional[int] = None
    eos_token_id: Optional[int] = None
    stop_tokens: tuple = (2,)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.rotary_pct)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def _llama(name, conv="vicuna_v1.1", **kw) -> ModelConfig:
    base = dict(
        name=name,
        family="llama",
        vocab_size=32000,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        norm_eps=1e-6,
        norm_type="rmsnorm",
        rotary_pct=1.0,
        rotary_style="neox",
        act="silu_gated",
        conv_template=conv,
        bos_token_id=1,
        eos_token_id=2,
        stop_tokens=(2,),
    )
    base.update(kw)
    return ModelConfig(**base)


def _neox(name, conv, **kw) -> ModelConfig:
    base = dict(
        name=name,
        family="gpt_neox",
        vocab_size=50280,
        hidden_size=2560,
        intermediate_size=10240,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        norm_eps=1e-5,
        norm_type="layernorm",
        rotary_pct=0.25,
        rotary_style="neox",
        parallel_residual=True,
        act="gelu",
        qkv_bias=True,
        out_bias=True,
        mlp_bias=True,
        fp32_lm_head=True,
        conv_template=conv,
        bos_token_id=0,
        eos_token_id=0,
        # stop tokens per family: /root/reference/cpp/llm_chat.cc:450-452
        stop_tokens=(0,),
    )
    base.update(kw)
    return ModelConfig(**base)


MODEL_REGISTRY = {
    # Llama family (llama.py:12-54 defaults = 7B)
    "vicuna-v1-7b": _llama("vicuna-v1-7b"),
    "llama-7b": _llama("llama-7b", conv="conv_one_shot"),
    "llama-13b": _llama(
        "llama-13b", conv="conv_one_shot",
        hidden_size=5120, intermediate_size=13824, num_layers=40,
        num_heads=40, num_kv_heads=40,
    ),
    "llama-65b": _llama(
        "llama-65b", conv="conv_one_shot",
        hidden_size=8192, intermediate_size=22016, num_layers=80,
        num_heads=64, num_kv_heads=64,
    ),
    # GPT-NeoX family (gpt_neox.py:49-117)
    "dolly-v2-3b": _neox("dolly-v2-3b", "dolly"),
    "dolly-v2-7b": _neox(
        "dolly-v2-7b", "dolly", hidden_size=4096, intermediate_size=16384
    ),
    "dolly-v2-12b": _neox(
        "dolly-v2-12b", "dolly",
        hidden_size=5120, intermediate_size=20480, num_heads=40,
        num_kv_heads=40, num_layers=36,
    ),
    "stablelm-tuned-alpha-3b": _neox(
        "stablelm-tuned-alpha-3b", "stablelm",
        hidden_size=4096, intermediate_size=16384, num_layers=16,
        vocab_size=50688, stop_tokens=(50278, 50279, 50277, 1, 0),
    ),
    "stablelm-tuned-alpha-7b": _neox(
        "stablelm-tuned-alpha-7b", "stablelm",
        hidden_size=6144, intermediate_size=24576, num_heads=48,
        num_kv_heads=48, num_layers=16, vocab_size=50432,
        stop_tokens=(50278, 50279, 50277, 1, 0),
    ),
    "RedPajama-INCITE-Base-3B-v1": _neox(
        "RedPajama-INCITE-Base-3B-v1", "dolly",
        vocab_size=50432, rotary_pct=1.0, parallel_residual=False,
    ),
    "RedPajama-INCITE-Chat-3B-v1": _neox(
        "RedPajama-INCITE-Chat-3B-v1", "dolly",
        vocab_size=50432, rotary_pct=1.0, parallel_residual=False,
    ),
    "RedPajama-INCITE-Instruct-3B-v1": _neox(
        "RedPajama-INCITE-Instruct-3B-v1", "dolly",
        vocab_size=50432, rotary_pct=1.0, parallel_residual=False,
    ),
    # MOSS family (moss.py:55-69): GPT-J-style block
    "moss-moon-003-sft": ModelConfig(
        name="moss-moon-003-sft",
        family="moss",
        vocab_size=107008,
        hidden_size=6144,
        intermediate_size=24576,
        num_layers=34,
        num_heads=24,
        num_kv_heads=24,
        norm_eps=1e-5,
        norm_type="layernorm",
        rotary_pct=0.25,
        rotary_style="gptj",
        parallel_residual=True,
        single_norm=True,
        act="gelu_new",
        mlp_bias=True,
        lm_head_bias=True,
        conv_template="moss",
        bos_token_id=106028,
        eos_token_id=106068,
        stop_tokens=(106068,),
    ),
}

# tiny configs for tests / CI (not in the reference zoo)
for _fam, _base in [
    ("llama", "llama-7b"),
    ("gpt_neox", "dolly-v2-3b"),
    ("moss", "moss-moon-003-sft"),
]:
    MODEL_REGISTRY[f"tiny-{_fam}"] = MODEL_REGISTRY[_base].replace(
        name=f"tiny-{_fam}",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128 if _fam == "llama" else 256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        max_seq_len=128,
    )


def get_config(name: str) -> ModelConfig:
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}"
        ) from None
