"""Paged KV cache: page-pool storage + per-slot page tables.

The reference grows per-sequence KV buffers at runtime
(vm.builtin.attention_kv_cache_create/append,
/root/reference/mlc_llm/relax_model/llama.py:259-289,614-638); the
slot-contiguous TPU cache (transformer.KVCache) preallocates
[B, Smax] per slot, which wastes HBM when many concurrent sequences
have mixed lengths. The paged cache (north star: "dynamic-shape-free
paged KV-cache in fp16/int8") keeps ONE shared pool of fixed-size pages
plus an [B, max_pages] page table:

- k_pages / v_pages: [Hkv, L, P, ps, D] (kv-head-major, V row-major).
  This is the layout the TPU paged-attention flash kernel wants
  ([num_kv_heads, total_pages, page_size, head_dim] after the free
  reshape folding L into the page axis); decode attention reads pages
  IN PLACE via the kernel's per-page DMAs, with the layer selected by
  offsetting the page table (flat_page = layer * P + page).
- page_table: [B, max_pages] int32 — page ids per slot, host-allocated
  (engine.PageAllocator); unused entries point at page 0, whose
  contents are garbage but always masked (positions >= length)
- lengths: [B] valid tokens per slot (same semantics as KVCache)
- int8 mode: per-(H, L, P, position) absmax scales, like KVCache

All shapes are static: the prefill/CPU path gathers pages with a take,
decode on TPU rides the flash kernel, and writes walk the touched
pages with in-place dynamic_update_slices. XLA sees no dynamic shape
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
    k_pages: Array            # [Hkv, L, P, ps, D]
    v_pages: Array            # [Hkv, L, P, ps, D]
    page_table: Array         # [B, max_pages] int32
    lengths: Array            # [B] int32
    k_scale: Optional[Array] = None  # [Hkv, L, P, ps] (int8 mode)
    v_scale: Optional[Array] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[2]

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
        scales = jnp.zeros((H, L, num_pages, page_size), jnp.float32)
    return PagedKVCache(
        k_pages=jnp.zeros((H, L, num_pages, page_size, D), dtype),
        v_pages=jnp.zeros((H, L, num_pages, page_size, D), dtype),
        page_table=jnp.zeros((batch, max_pages_per_slot), jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
        k_scale=scales,
        v_scale=None if scales is None else jnp.zeros(
            (H, L, num_pages, page_size), jnp.float32
        ),
    )


# ----------------------------------------------------------------- reads

def gather_pages_k(pages: Array, l: Array, table: Array, maxp: int) -> Array:
    """pages [H, L, P, ps, D] -> [B, H, maxp*ps, D] for layer l."""
    layer = jax.lax.dynamic_index_in_dim(pages, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [H, B, maxp, ps, D]
    H, B, mp, ps, D = sub.shape
    return sub.transpose(1, 0, 2, 3, 4).reshape(B, H, mp * ps, D)


def gather_pages_v(pages: Array, l: Array, table: Array, maxp: int) -> Array:
    """pages [H, L, P, ps, D] -> [B, H, D, maxp*ps] (D-major, the
    attend_cache layout) for layer l."""
    layer = jax.lax.dynamic_index_in_dim(pages, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [H, B, maxp, ps, D]
    H, B, mp, ps, D = sub.shape
    return sub.transpose(1, 0, 4, 2, 3).reshape(B, H, D, mp * ps)


def gather_pages_scale(scales: Array, l: Array, table: Array, maxp: int) -> Array:
    """[H, L, P, ps] -> [B, H, maxp*ps]."""
    layer = jax.lax.dynamic_index_in_dim(scales, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [H, B, maxp, ps]
    H, B, mp, ps = sub.shape
    return sub.transpose(1, 0, 2, 3).reshape(B, H, mp * ps)


# ---------------------------------------------------------------- writes

def write_tokens_paged_k(pages: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """pages [H, L, P, ps, D]; new [B, H, S, D]; start [B].

    All writes are dynamic_update_slices — XLA provably aliases DUS in
    place, where a general scatter forced a copy of the WHOLE pool
    every layer (profiled at 103 ms/step per pool at 7B b8 — 20x the
    step time; docs/PERF.md r2). Decode (S == 1) is one DUS per slot;
    prefill walks the touched pages, read-merge-writing each so an
    unaligned append keeps the page's earlier tokens intact."""
    B, H, S, D = new.shape
    ps = pages.shape[3]
    maxcol = table.shape[1] - 1
    vals = new.astype(pages.dtype)
    if S == 1:
        for b in range(B):
            pos = start[b]
            pid = table[b, jnp.minimum(pos // ps, maxcol)]
            blk = vals[b][:, None, None, :, :]  # [H, 1, 1, 1, D]
            pages = jax.lax.dynamic_update_slice(
                pages, blk, (0, l, pid, pos % ps, 0)
            )
        return pages
    nchunks = S // ps + 1
    lane = jnp.arange(ps, dtype=jnp.int32)
    for b in range(B):
        sb = start[b]
        off0 = sb % ps
        # front/back zero-pad so every chunk's dynamic_slice stays in
        # range (no XLA offset clamping, which would shift values)
        newp = jnp.pad(vals[b], ((0, 0), (ps, ps), (0, 0)))
        for i in range(nchunks):
            pi = sb // ps + i
            pid = table[b, jnp.minimum(pi, maxcol)]
            pos0 = pi * ps
            chunk = jax.lax.dynamic_slice(
                newp, (0, i * ps - off0 + ps, 0), (H, ps, D)
            )
            old = jax.lax.dynamic_slice(
                pages, (0, l, pid, 0, 0), (H, 1, 1, ps, D)
            )[:, 0, 0]
            posv = pos0 + lane
            keep = (posv >= sb) & (posv < sb + S)
            upd = jnp.where(keep[None, :, None], chunk, old)
            pages = jax.lax.dynamic_update_slice(
                pages, upd[:, None, None], (0, l, pid, 0, 0)
            )
    return pages


def write_tokens_paged_v(pages: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """pages [H, L, P, ps, D]; new [B, H, D, S] (the transposed
    activation layout); start [B]."""
    B, H, D, S = new.shape
    return write_tokens_paged_k(pages, new.transpose(0, 1, 3, 2), l, table,
                                start)


def write_scales_paged(scales: Array, new: Array, l: Array, table: Array,
                       start: Array) -> Array:
    """scales [H, L, P, ps]; new [B, H, S]."""
    B, H, S = new.shape
    ps = scales.shape[3]
    maxcol = table.shape[1] - 1
    vals = new.astype(scales.dtype)
    if S == 1:
        for b in range(B):
            pos = start[b]
            pid = table[b, jnp.minimum(pos // ps, maxcol)]
            blk = vals[b][:, None, None, :]  # [H, 1, 1, 1]
            scales = jax.lax.dynamic_update_slice(
                scales, blk, (0, l, pid, pos % ps)
            )
        return scales
    nchunks = S // ps + 1
    lane = jnp.arange(ps, dtype=jnp.int32)
    for b in range(B):
        sb = start[b]
        off0 = sb % ps
        newp = jnp.pad(vals[b], ((0, 0), (ps, ps)))
        for i in range(nchunks):
            pi = sb // ps + i
            pid = table[b, jnp.minimum(pi, maxcol)]
            chunk = jax.lax.dynamic_slice(newp, (0, i * ps - off0 + ps), (H, ps))
            old = jax.lax.dynamic_slice(
                scales, (0, l, pid, 0), (H, 1, 1, ps)
            )[:, 0, 0]
            posv = pi * ps + lane
            keep = (posv >= sb) & (posv < sb + S)
            upd = jnp.where(keep[None, :], chunk, old)
            scales = jax.lax.dynamic_update_slice(
                scales, upd[:, None, None], (0, l, pid, 0)
            )
    return scales


# ------------------------------------------------- decode flash attention

def paged_flash_enabled(dtype) -> bool:
    """Route paged decode through the TPU flash kernel? (int8 pages
    stay on the gather path: the kernel's quantized mode streams
    broadcast f32 scale pages — 4 bytes/elem of extra traffic that
    defeats int8; CPU has no Mosaic lowering; GSPMD-sharded params
    get no partitioning rule for the kernel.)"""
    from ..ops import kernel_mode, sharded_params

    return (
        dtype != jnp.int8
        and kernel_mode() in ("pallas", "auto")
        and jax.default_backend() not in ("cpu",)
        and not sharded_params()
    )


def paged_flash_decode(
    q: Array,            # [B, Hq, 1, D]
    k_pages: Array,      # [Hkv, L, P, ps, D]
    v_pages: Array,
    page_table: Array,   # [B, maxp] int32
    lengths: Array,      # [B] int32 POST-advance valid token counts
    layer: Array,        # scalar int32
    *,
    num_pages_window: int,
) -> Array:
    """One decode step of paged attention via the TPU flash kernel.

    Uses jax.experimental.pallas.ops.tpu.paged_attention — the
    substrate's production paged-attention kernel (per-(batch, kv-head)
    grid, multi-page double-buffered DMAs) — with the layer selected by
    offsetting the page table into the [Hkv, L*P, ...] flat pool view.
    A from-scratch per-(b, head, page) pallas grid measured 27x slower
    than the XLA slot-contiguous einsum at b8/w256 (docs/PERF.md r2):
    decode paged attention is per-invocation-overhead-bound, and the
    library kernel's blocking is the right one. Returns [B, Hq, 1, D].
    """
    from jax.experimental.pallas.ops.tpu.paged_attention import (
        paged_attention,
    )

    B, Hq, S, D = q.shape
    assert S == 1
    Hkv, L, P, ps, _ = k_pages.shape
    maxp = min(num_pages_window, page_table.shape[1])
    flat_k = k_pages.reshape(Hkv, L * P, ps, D)
    flat_v = v_pages.reshape(Hkv, L * P, ps, D)
    flat_table = page_table[:, :maxp] + layer.astype(jnp.int32) * P
    lens = jnp.minimum(lengths, maxp * ps)
    ppcb = next(c for c in (8, 4, 2, 1) if maxp % c == 0)
    out = paged_attention(
        q[:, :, 0, :],
        flat_k,
        flat_v,
        lens,
        flat_table,
        pages_per_compute_block=ppcb,
    )
    return out[:, :, None, :]


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
