"""Attention with a preallocated KV cache (jnp reference path).

Semantics mirror the reference attention stack: QK^T/sqrt(d), causal
mask over history + current block, softmax in fp32, then V matmul
(/root/reference/mlc_llm/relax_model/llama.py:290-330,
gpt_neox.py:225-270). The reference's growable KV-cache runtime objects
(vm.builtin.attention_kv_cache_*) become static [Smax] buffers updated
with dynamic_update_slice — XLA-friendly, no dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

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
    v_transposed: bool = False,
) -> Array:
    """Masked attention of a query block against full K/V buffers.

    q:      [B, Hq, Sq, D]
    k:      [B, Hkv, Smax, D] (cache contents; positions >= q_pos+Sq are junk)
    v:      [B, Hkv, Smax, D], or [B, Hkv, D, Smax] when v_transposed
            (the KV cache's D-major V layout — both einsums then
            contract minor dims, so XLA never relayouts the cache)
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
    if v_transposed:
        out = jnp.einsum(
            "bhqk,bhdk->bhqd", probs.astype(q.dtype), v,
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
            preferred_element_type=jnp.float32,
        )
    return out.astype(q.dtype)


def attend_cache(
    q: Array,
    kc: Array,
    vc: Array,
    ksc: Optional[Array],
    vsc: Optional[Array],
    q_pos: Array,
) -> Array:
    """Attention of a query block against the (possibly int8) cache.

    q: [B, Hq, Sq, D]; kc: [B, Hkv, Smax, D]; vc: [B, Hkv, D, Smax]
    (cache layouts; current tokens already written); ksc/vsc: int8-mode
    scales [B, Hkv, Smax]. Routes the Sq==1 decode case to the
    flash-decode Pallas kernel when forced; falls back to dense jnp
    attention with the no-relayout transposed-V einsum.
    """
    # Slot-contiguous decode stays on the XLA einsum: the windowed
    # dynamic_slice fuses into the attention dots (both contractions hit
    # minor dims with the D-major V cache), so XLA reads the KV bytes
    # once at bandwidth — round 1's [B,H,S,D]-layout flash kernel made
    # 256-byte DMAs (~112 GB/s), lost to this path, and was deleted.
    # The PAGED cache decode, where the jnp gather would copy the whole
    # window per layer, routes to the substrate's paged flash kernel
    # instead (models/paged_cache.py paged_flash_decode).
    if ksc is not None:
        k = (kc.astype(jnp.float32) * ksc[..., None]).astype(q.dtype)
        v = (vc.astype(jnp.float32) * vsc[:, :, None, :]).astype(q.dtype)
    else:
        k = kc.astype(q.dtype)
        v = vc.astype(q.dtype)
    return attend(q, k, v, q_pos, v_transposed=True)


def flash_prefill_shape_ok(S: int, D: int) -> bool:
    """Pure shape/threshold gate for the flash-prefill route — no
    backend query, so it is directly testable on any platform.

    Rules (each measured or structural):
      S >= 1024 — flash wins -6% at ctx 1024 and -17% at ctx 2048 but
        LOSES below (per-invocation overhead of the (b, h, q-block)
        grid outweighs the saved softmax work when the [Sq, Sq] score
        tile is small); the windowed jnp path stays faster at ctx<=512
      S % 128 == 0 — the kernel's q/kv block size
      D % 128 == 0 — lane alignment of the head dim
    """
    return S >= 1024 and S % 128 == 0 and D % 128 == 0


def flash_prefill_supported(S: int, D: int) -> bool:
    """Reset-prefill flash path: TPU only (the Pallas kernel has no
    interpret mode) + the pure shape gate above."""
    return jax.default_backend() == "tpu" and flash_prefill_shape_ok(S, D)


def flash_prefill(q: Array, k: Array, v: Array) -> Array:
    """Causal self-attention over the current block via the Pallas TPU
    flash kernel (online fp32 softmax — same accumulation semantics as
    `attend`).

    Valid ONLY for reset prefill (start == 0): the block IS the whole
    context, so attention never touches the cache buffers at all —
    replacing the [Sq, W]-scores jnp path that dominated long-context
    TTFT. q/k/v: [B, H, S, D] (k/v pre-cache-write, post-rotary).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    Hq, Hkv = q.shape[1], k.shape[1]
    if Hq != Hkv:
        rep = Hq // Hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    D = q.shape[-1]
    return flash_attention(
        q, k, v, causal=True, sm_scale=1.0 / (D**0.5)
    ).astype(q.dtype)
