"""Paged KV cache: page-pool storage + per-slot page tables.

The reference grows per-sequence KV buffers at runtime
(vm.builtin.attention_kv_cache_create/append,
/root/reference/mlc_llm/relax_model/llama.py:259-289,614-638); the
slot-contiguous TPU cache (transformer.KVCache) preallocates
[B, Smax] per slot, which wastes HBM when many concurrent sequences
have mixed lengths. The paged cache (north star: "dynamic-shape-free
paged KV-cache in fp16/int8") keeps ONE shared pool of fixed-size pages
plus an [B, max_pages] page table:

- k_pages: [L, P, Hkv, ps, D]; v_pages: [L, P, Hkv, D, ps] (D-major,
  same relayout-avoidance as KVCache.v)
- page_table: [B, max_pages] int32 — page ids per slot, host-allocated
  (engine.PageAllocator); unused entries point at page 0, whose
  contents are garbage but always masked (positions >= length)
- lengths: [B] valid tokens per slot (same semantics as KVCache)
- int8 mode: per-(L, P, H, position) absmax scales, like KVCache

All shapes are static: reads gather pages with a take (TPU Pallas
fast path: scalar-prefetch page indices, ops/pallas/), writes scatter
(page, offset) pairs computed from lengths. XLA sees no dynamic shape
anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k_pages: Array            # [L, P, Hkv, ps, D]
    v_pages: Array            # [L, P, Hkv, D, ps]
    page_table: Array         # [B, max_pages] int32
    lengths: Array            # [B] int32
    k_scale: Optional[Array] = None  # [L, P, Hkv, ps] (int8 mode)
    v_scale: Optional[Array] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def batch(self) -> int:
        return self.page_table.shape[0]

    @property
    def max_len(self) -> int:
        return self.page_table.shape[1] * self.page_size


def init_paged_kv_cache(
    cfg: ModelConfig,
    batch: int,
    num_pages: int,
    page_size: int = 64,
    max_pages_per_slot: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> PagedKVCache:
    if max_pages_per_slot is None:
        max_pages_per_slot = -(-cfg.max_seq_len // page_size)
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    dtype = jnp.dtype(dtype)
    scales = None
    if dtype == jnp.int8:
        scales = jnp.zeros((L, num_pages, H, page_size), jnp.float32)
    return PagedKVCache(
        k_pages=jnp.zeros((L, num_pages, H, page_size, D), dtype),
        v_pages=jnp.zeros((L, num_pages, H, D, page_size), dtype),
        page_table=jnp.zeros((batch, max_pages_per_slot), jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
        k_scale=scales,
        v_scale=None if scales is None else jnp.zeros(
            (L, num_pages, H, page_size), jnp.float32
        ),
    )


# ----------------------------------------------------------------- reads

def gather_pages_k(pages: Array, l: Array, table: Array, maxp: int) -> Array:
    """pages [L, P, H, ps, D] -> [B, H, maxp*ps, D] for layer l."""
    layer = jax.lax.dynamic_index_in_dim(pages, l, 0, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=0)  # [B, maxp, H, ps, D]
    B, mp, H, ps, D = sub.shape
    return sub.transpose(0, 2, 1, 3, 4).reshape(B, H, mp * ps, D)


def gather_pages_v(pages: Array, l: Array, table: Array, maxp: int) -> Array:
    """pages [L, P, H, D, ps] -> [B, H, D, maxp*ps] for layer l."""
    layer = jax.lax.dynamic_index_in_dim(pages, l, 0, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=0)  # [B, maxp, H, D, ps]
    B, mp, H, D, ps = sub.shape
    return sub.transpose(0, 2, 3, 1, 4).reshape(B, H, D, mp * ps)


def gather_pages_scale(scales: Array, l: Array, table: Array, maxp: int) -> Array:
    """[L, P, H, ps] -> [B, H, maxp*ps]."""
    layer = jax.lax.dynamic_index_in_dim(scales, l, 0, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=0)  # [B, maxp, H, ps]
    B, mp, H, ps = sub.shape
    return sub.transpose(0, 2, 1, 3).reshape(B, H, mp * ps)


# ---------------------------------------------------------------- writes

def _page_offsets(table: Array, start: Array, S: int, ps: int):
    """Physical (page_id, offset) for S new tokens per slot.

    table [B, maxp]; start [B]. Returns pages [B, S], offs [B, S]."""
    pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # [B, S]
    slot_page = pos // ps
    slot_page = jnp.minimum(slot_page, table.shape[1] - 1)
    pages = jnp.take_along_axis(table, slot_page, axis=1)  # [B, S]
    return pages, pos % ps


def write_tokens_paged_k(pages: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """pages [L, P, H, ps, D]; new [B, H, S, D]; start [B]."""
    B, H, S, D = new.shape
    pids, offs = _page_offsets(table, start, S, pages.shape[3])
    # scatter [B, S] (page, offset) pairs; layer index is traced scalar
    vals = new.transpose(0, 2, 1, 3)  # [B, S, H, D]
    return pages.at[l, pids, :, offs, :].set(
        vals.astype(pages.dtype), mode="drop"
    )


def write_tokens_paged_v(pages: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """pages [L, P, H, D, ps]; new [B, H, D, S]; start [B]."""
    B, H, D, S = new.shape
    pids, offs = _page_offsets(table, start, S, pages.shape[4])
    vals = new.transpose(0, 3, 1, 2)  # [B, S, H, D]
    return pages.at[l, pids, :, :, offs].set(
        vals.astype(pages.dtype), mode="drop"
    )


def write_scales_paged(scales: Array, new: Array, l: Array, table: Array,
                       start: Array) -> Array:
    """scales [L, P, H, ps]; new [B, H, S]."""
    B, H, S = new.shape
    pids, offs = _page_offsets(table, start, S, scales.shape[3])
    vals = new.transpose(0, 2, 1)  # [B, S, H]
    return scales.at[l, pids, :, offs].set(vals, mode="drop")


# ------------------------------------------------------------- allocator

class PageAllocator:
    """Host-side free-list page allocator.

    Page 0 is reserved as the null page (page_table's padding value),
    so unused table entries always reference valid storage."""

    def __init__(self, num_pages: int):
        assert num_pages >= 2
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))  # stack; 0 reserved

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def can_alloc(self, n: int) -> bool:
        return n <= len(self._free)

    def alloc(self, n: int):
        if n > len(self._free):
            raise MemoryError(f"paged KV: need {n} pages, {len(self._free)} free")
        return [self._free.pop() for _ in range(n)]

    def free(self, pages) -> None:
        for p in pages:
            assert 0 < p < self.num_pages
            self._free.append(p)
