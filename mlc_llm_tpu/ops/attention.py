"""Attention with a preallocated KV cache (jnp reference path).

Semantics mirror the reference attention stack: QK^T/sqrt(d), causal
mask over history + current block, softmax in fp32, then V matmul
(/root/reference/mlc_llm/relax_model/llama.py:290-330,
gpt_neox.py:225-270). The reference's growable KV-cache runtime objects
(vm.builtin.attention_kv_cache_*) become static [Smax] buffers updated
with dynamic_update_slice — XLA-friendly, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def attend(
    q: Array,
    k: Array,
    v: Array,
    q_pos: Array,
    *,
    mask_value: float = -1e30,
) -> Array:
    """Masked attention of a query block against full K/V buffers.

    q:      [B, Hq, Sq, D]
    k, v:   [B, Hkv, Smax, D] (cache contents; positions >= q_pos+Sq are junk)
    q_pos:  [B] int32 — absolute position of the first query token.
    Returns [B, Hq, Sq, D] in q.dtype; softmax accumulates in fp32.
    """
    B, Hq, Sq, D = q.shape
    Hkv, Smax = k.shape[1], k.shape[2]
    if Hq != Hkv:
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    scale = 1.0 / (D**0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale  # [B, Hq, Sq, Smax] fp32

    kpos = jnp.arange(Smax, dtype=jnp.int32)[None, None, :]  # [1, 1, Smax]
    qabs = q_pos[:, None, None] + jnp.arange(Sq, dtype=jnp.int32)[None, :, None]
    valid = kpos <= qabs  # [B, Sq, Smax]
    scores = jnp.where(valid[:, None, :, :], scores, mask_value)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
