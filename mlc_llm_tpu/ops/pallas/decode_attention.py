"""Flash-decode attention Pallas kernel (single query token per slot).

Replaces the jnp decode-attention path that reads the FULL Smax cache
every step with a kernel that reads exactly ceil(len/BS) blocks per
slot: the per-slot lengths ride in as scalar-prefetch, the KV tiles are
manually double-buffered HBM->VMEM DMAs, and softmax is the online
(flash) recurrence. int8 KV (KVCache int8 mode) is dequantized in-VMEM
from per-(head, position) scales, so the HBM read is 1 byte/element.

The reference has no analog (its TVM attention reads the growable
cache fully, llama.py:290-330); this is the TPU-native design from
SURVEY.md §7.1 (paged/flash decode attention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    lengths_ref,
    # inputs
    q_ref,      # [1, H, D] VMEM
    k_hbm,      # [B, H, S, D] ANY
    v_hbm,
    ks_hbm,     # [B, H, S] ANY (int8 mode) — aliased to k_hbm if fp
    vs_hbm,
    # output
    o_ref,      # [1, H, D] VMEM
    # scratch
    kbuf, vbuf, ksbuf, vsbuf, sems,
    *,
    block_s: int,
    int8_kv: bool,
    max_len: int,
):
    b = pl.program_id(0)
    H, D = q_ref.shape[1], q_ref.shape[2]
    L = jnp.maximum(lengths_ref[b], 1)
    nb = pl.cdiv(L, block_s)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(i * block_s, block_s), :],
            kbuf.at[slot],
            sems.at[slot, 0],
        )

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(i * block_s, block_s), :],
            vbuf.at[slot],
            sems.at[slot, 1],
        )

    def ks_dma(slot, i):
        return pltpu.make_async_copy(
            ks_hbm.at[b, :, pl.ds(i * block_s, block_s)],
            ksbuf.at[slot],
            sems.at[slot, 2],
        )

    def vs_dma(slot, i):
        return pltpu.make_async_copy(
            vs_hbm.at[b, :, pl.ds(i * block_s, block_s)],
            vsbuf.at[slot],
            sems.at[slot, 3],
        )

    def start_all(slot, i):
        k_dma(slot, i).start()
        v_dma(slot, i).start()
        if int8_kv:
            ks_dma(slot, i).start()
            vs_dma(slot, i).start()

    def wait_all(slot, i):
        k_dma(slot, i).wait()
        v_dma(slot, i).wait()
        if int8_kv:
            ks_dma(slot, i).wait()
            vs_dma(slot, i).wait()

    start_all(0, 0)

    # [H, 1, D]: Mosaic's batched dot needs a non-empty lhs
    # non-contracting dim set, so q keeps an explicit singleton M axis
    q = q_ref[0].astype(jnp.float32)[:, None, :]
    scale = 1.0 / (D ** 0.5)

    def body(i, carry):
        m_i, l_i, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            start_all(1 - slot, i + 1)

        wait_all(slot, i)

        if int8_kv:
            ks = ksbuf[slot].astype(jnp.float32)  # [H, BS]
            k_tile = kbuf[slot].astype(jnp.float32) * ks[:, :, None]
            vs = vsbuf[slot].astype(jnp.float32)
            v_tile = vbuf[slot].astype(jnp.float32) * vs[:, :, None]
        else:
            k_tile = kbuf[slot].astype(jnp.float32)  # [H, BS, D]
            v_tile = vbuf[slot].astype(jnp.float32)

        # scores[h, 0, j] = q[h, 0, :] . k[h, j, :]
        s = jax.lax.dot_general(
            q, k_tile, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [H, 1, BS]
        col = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (H, 1, block_s), 2
        )
        s = jnp.where(col < L, s, NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=2, keepdims=True))  # [H, 1, 1]
        p = jnp.exp(s - m_new)  # [H, 1, BS]
        corr = jnp.exp(m_i - m_new)
        l_new = l_i * corr + jnp.sum(p, axis=2, keepdims=True)
        pv = jax.lax.dot_general(
            p, v_tile, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, 1, D]
        acc = acc * corr + pv
        return m_new, l_new, acc

    m0 = jnp.full((H, 1, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, 1, 1), jnp.float32)
    a0 = jnp.zeros((H, 1, D), jnp.float32)
    m_i, l_i, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, a0))

    o_ref[0] = (acc[:, 0, :] / jnp.maximum(l_i[:, 0, :], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_s", "interpret")
)
def _decode_attention(
    q: Array,         # [B, H, D]
    k: Array,         # [B, H, S, D]
    v: Array,
    lengths: Array,   # [B] — INCLUSIVE of the current token
    k_scale: Optional[Array],
    v_scale: Optional[Array],
    block_s: int,
    interpret: bool,
) -> Array:
    B, H, D = q.shape
    S = k.shape[2]
    int8_kv = k_scale is not None
    if k_scale is None:
        k_scale = jnp.zeros((B, H, S), jnp.float32)  # unused placeholder
        v_scale = k_scale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, H, block_s, D), k.dtype),
            pltpu.VMEM((2, H, block_s, D), v.dtype),
            pltpu.VMEM((2, H, block_s), jnp.float32),
            pltpu.VMEM((2, H, block_s), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kernel = functools.partial(
        _kernel, block_s=block_s, int8_kv=int8_kv, max_len=S
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lengths, q, k, v, k_scale, v_scale)


def decode_attention_supported(S: int, D: int, block_s: int = 128) -> bool:
    return S % block_s == 0 and D % 128 == 0


def decode_attention(
    q: Array,
    k: Array,
    v: Array,
    lengths: Array,
    k_scale: Optional[Array] = None,
    v_scale: Optional[Array] = None,
    block_s: int = 128,
) -> Array:
    """Single-token attention against a [B, H, S, D] cache.

    lengths counts valid positions INCLUDING the current token (which
    must already be written into the cache). Returns [B, H, D].
    """
    interpret = jax.default_backend() == "cpu"
    return _decode_attention(
        q, k, v, lengths.astype(jnp.int32), k_scale, v_scale,
        block_s, interpret,
    )
