"""HuggingFace checkpoint -> param pytree (+ offline quantization).

Replaces the reference's trace-time weight import + param-transform VM
run (/root/reference/mlc_llm/relax_model/llama.py:651-691,
utils.py:98-110). Family-specific remappings mirror the reference:

- GPT-NeoX: fused query_key_value is stored per-head as [nh, 3, d, H]
  and must be split into q/k/v (gpt_neox.py:648-667)
- MOSS: fused qkv_proj is interleaved with mp_num=4 in q/v/k order
  (moss.py:593-603); plain GPT-J checkpoints (separate q/k/v) are also
  accepted since MOSS is GPT-J-architecture
- Llama: separate projections, no remap

All weights are transposed to the engine's [k, n] reduction-major
layout and group-quantized offline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..quant.groupwise import quantize
from ..quant.spec import QuantSpec, resolve_spec
from .config import ModelConfig
from .layers import make_rotary_tables
from .transformer import _stack_layers

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().to("cpu").float().numpy()  # torch tensor


def _state_dict_np(hf_model) -> Dict[str, np.ndarray]:
    return {k: _np(v) for k, v in hf_model.state_dict().items()}


def _maybe_quant(w_kn: np.ndarray, spec: QuantSpec):
    if spec.is_quantized:
        from ..quant.spec import spec_for_k

        return quantize(jnp.asarray(w_kn), spec_for_k(spec, w_kn.shape[0]))
    return jnp.asarray(w_kn, dtype=jnp.dtype(spec.dtype))


def _linear(sd, name: str, spec: QuantSpec):
    """HF Linear weight [out, in] -> quantized [in, out]."""
    return _maybe_quant(sd[f"{name}.weight"].T, spec)


def _bias(sd, name: str, dtype):
    key = f"{name}.bias"
    return jnp.asarray(sd[key], dtype=dtype) if key in sd else None


def params_from_hf(hf_model, cfg: ModelConfig, quant) -> Params:
    spec = resolve_spec(quant)
    if cfg.family == "llama":
        return _load_llama(_state_dict_np(hf_model), cfg, spec)
    if cfg.family == "gpt_neox":
        return _load_neox(_state_dict_np(hf_model), cfg, spec)
    if cfg.family == "moss":
        return _load_moss(_state_dict_np(hf_model), cfg, spec)
    raise ValueError(f"unknown family {cfg.family}")


def _common(cfg: ModelConfig, spec: QuantSpec, embed_vh, layers, final_w, final_b,
            head_w_vh, head_b):
    dtype = jnp.dtype(spec.dtype)
    if spec.is_quantized:
        embed = quantize(jnp.asarray(embed_vh.T), spec)  # stored [H, V]
    else:
        embed = jnp.asarray(embed_vh, dtype=dtype)
    head_spec = spec
    if cfg.fp32_lm_head:
        head_spec = (
            dataclasses.replace(spec, dtype="float32")
            if spec.is_quantized
            else resolve_spec("f32")
        )
    params: Params = {
        "embed": {"w": embed},
        "layers": _stack_layers(layers),
        "final_ln": {"w": jnp.asarray(final_w, dtype=dtype)},
        "lm_head": {"w": _maybe_quant(head_w_vh.T, head_spec)},
        "rotary": {},
    }
    if final_b is not None:
        params["final_ln"]["b"] = jnp.asarray(final_b, dtype=dtype)
    if head_b is not None:
        params["lm_head"]["b"] = jnp.asarray(
            head_b, dtype=jnp.float32 if cfg.fp32_lm_head else dtype
        )
    cos, sin = make_rotary_tables(
        cfg.head_dim, cfg.rotary_pct, cfg.rotary_base, cfg.max_seq_len,
        cfg.rotary_style,
    )
    params["rotary"] = {"cos": cos, "sin": sin}
    return params


def _load_llama(sd, cfg: ModelConfig, spec: QuantSpec) -> Params:
    dtype = jnp.dtype(spec.dtype)
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        wq = sd[f"{p}.self_attn.q_proj.weight"]
        wk = sd[f"{p}.self_attn.k_proj.weight"]
        wv = sd[f"{p}.self_attn.v_proj.weight"]
        gate = sd[f"{p}.mlp.gate_proj.weight"]
        up = sd[f"{p}.mlp.up_proj.weight"]
        layers.append({
            "ln1_w": jnp.asarray(sd[f"{p}.input_layernorm.weight"], dtype=dtype),
            "ln2_w": jnp.asarray(sd[f"{p}.post_attention_layernorm.weight"], dtype=dtype),
            "wqkv": _maybe_quant(np.concatenate([wq, wk, wv], axis=0).T, spec),
            "wo": _maybe_quant(sd[f"{p}.self_attn.o_proj.weight"].T, spec),
            "w_in": _maybe_quant(np.concatenate([gate, up], axis=0).T, spec),
            "w_out": _maybe_quant(sd[f"{p}.mlp.down_proj.weight"].T, spec),
        })
    return _common(
        cfg, spec,
        embed_vh=sd["model.embed_tokens.weight"],
        layers=layers,
        final_w=sd["model.norm.weight"], final_b=None,
        head_w_vh=sd["lm_head.weight"], head_b=None,
    )


def _load_neox(sd, cfg: ModelConfig, spec: QuantSpec) -> Params:
    dtype = jnp.dtype(spec.dtype)
    nh, d, H = cfg.num_heads, cfg.head_dim, cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        p = f"gpt_neox.layers.{i}"
        # fused [3H, H] laid out per-head [nh, 3, d, H] -> split
        # (/root/reference/mlc_llm/relax_model/gpt_neox.py:648-667)
        wqkv = sd[f"{p}.attention.query_key_value.weight"].reshape(nh, 3, d, H)
        wq, wk, wv = (wqkv[:, j].reshape(nh * d, H) for j in range(3))
        bqkv = sd[f"{p}.attention.query_key_value.bias"].reshape(nh, 3, d)
        bq, bk, bv = (bqkv[:, j].reshape(nh * d) for j in range(3))
        layers.append({
            "ln1_w": jnp.asarray(sd[f"{p}.input_layernorm.weight"], dtype=dtype),
            "ln1_b": jnp.asarray(sd[f"{p}.input_layernorm.bias"], dtype=dtype),
            "ln2_w": jnp.asarray(sd[f"{p}.post_attention_layernorm.weight"], dtype=dtype),
            "ln2_b": jnp.asarray(sd[f"{p}.post_attention_layernorm.bias"], dtype=dtype),
            "wqkv": _maybe_quant(np.concatenate([wq, wk, wv], axis=0).T, spec),
            "bqkv": jnp.asarray(np.concatenate([bq, bk, bv]), dtype=dtype),
            "wo": _maybe_quant(sd[f"{p}.attention.dense.weight"].T, spec),
            "bo": jnp.asarray(sd[f"{p}.attention.dense.bias"], dtype=dtype),
            "w_in": _maybe_quant(sd[f"{p}.mlp.dense_h_to_4h.weight"].T, spec),
            "b_in": jnp.asarray(sd[f"{p}.mlp.dense_h_to_4h.bias"], dtype=dtype),
            "w_out": _maybe_quant(sd[f"{p}.mlp.dense_4h_to_h.weight"].T, spec),
            "b_out": jnp.asarray(sd[f"{p}.mlp.dense_4h_to_h.bias"], dtype=dtype),
        })
    return _common(
        cfg, spec,
        embed_vh=sd["gpt_neox.embed_in.weight"],
        layers=layers,
        final_w=sd["gpt_neox.final_layer_norm.weight"],
        final_b=sd["gpt_neox.final_layer_norm.bias"],
        head_w_vh=sd["embed_out.weight"], head_b=None,
    )


def _split_moss_qkv(w_fused: np.ndarray, H: int) -> tuple:
    """De-interleave MOSS's mp_num=4 fused qkv (q/v/k chunk order!)
    into separate q, k, v [H, H] — moss.py:593-603."""
    mp = 4
    blocks = w_fused.reshape(mp, 3 * H // mp, -1)
    per = H // mp
    q = np.concatenate([b[:per] for b in blocks], axis=0)
    v = np.concatenate([b[per : 2 * per] for b in blocks], axis=0)
    k = np.concatenate([b[2 * per :] for b in blocks], axis=0)
    return q, k, v


def _load_moss(sd, cfg: ModelConfig, spec: QuantSpec) -> Params:
    dtype = jnp.dtype(spec.dtype)
    H = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        p = f"transformer.h.{i}"
        if f"{p}.attn.qkv_proj.weight" in sd:  # true MOSS checkpoint
            q, k, v = _split_moss_qkv(sd[f"{p}.attn.qkv_proj.weight"], H)
            wqkv = np.concatenate([q, k, v], axis=0)
        else:  # plain GPT-J layout
            wqkv = np.concatenate(
                [sd[f"{p}.attn.{x}_proj.weight"] for x in "qkv"], axis=0
            )
        layers.append({
            "ln1_w": jnp.asarray(sd[f"{p}.ln_1.weight"], dtype=dtype),
            "ln1_b": jnp.asarray(sd[f"{p}.ln_1.bias"], dtype=dtype),
            "wqkv": _maybe_quant(wqkv.T, spec),
            "wo": _maybe_quant(sd[f"{p}.attn.out_proj.weight"].T, spec),
            "w_in": _maybe_quant(sd[f"{p}.mlp.fc_in.weight"].T, spec),
            "b_in": jnp.asarray(sd[f"{p}.mlp.fc_in.bias"], dtype=dtype),
            "w_out": _maybe_quant(sd[f"{p}.mlp.fc_out.weight"].T, spec),
            "b_out": jnp.asarray(sd[f"{p}.mlp.fc_out.bias"], dtype=dtype),
        })
    return _common(
        cfg, spec,
        embed_vh=sd["transformer.wte.weight"],
        layers=layers,
        final_w=sd["transformer.ln_f.weight"],
        final_b=sd["transformer.ln_f.bias"],
        head_w_vh=sd["lm_head.weight"],
        head_b=sd.get("lm_head.bias"),
    )
