"""Paged KV cache: head-packed page-pool storage + per-slot page tables.

The reference grows per-sequence KV buffers at runtime
(vm.builtin.attention_kv_cache_create/append,
/root/reference/mlc_llm/relax_model/llama.py:259-289,614-638); the
slot-contiguous TPU cache (transformer.KVCache) preallocates
[B, Smax] per slot, which wastes HBM when many concurrent sequences
have mixed lengths. The paged cache (north star: "dynamic-shape-free
paged KV-cache in fp16/int8") keeps ONE shared pool of fixed-size pages
plus an [B, max_pages] page table:

- k_pages / v_pages: [G, L, P, ps, hb*D] — hb kv-heads interleaved in
  the lane dimension (G = Hkv/hb head groups). Each (group, page) tile
  is one contiguous [ps, hb*D] block: the decode flash kernel
  (ops/pallas/paged_attention.py) DMAs whole head-blocks per grid step
  and dots them against block-diagonal queries, and decode writes are
  single 2*hb*D-byte-row dynamic_update_slices per slot.
- page_table: [B, max_pages] int32 — page ids per slot, host-allocated
  (engine.PageAllocator); unused entries point at page 0, whose
  contents are garbage but always masked (positions >= length)
- lengths: [B] valid tokens per slot (same semantics as KVCache)
- int8 mode: per-(head, position) absmax scales at [ps] granularity,
  k-scales [G, L, P, hb, ps] (score-row aligned) and v-scales
  [G, L, P, ps, hb] (value-column aligned) — see the kernel docstring.

All shapes are static: the prefill/CPU path gathers pages with a take,
decode rides the flash kernel, and writes walk the touched pages with
in-place dynamic_update_slices (a general scatter forced XLA to copy
the WHOLE pool every layer: 103 ms/step per pool at 7B b8,
docs/PERF.md r2). XLA sees no dynamic shape anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from ..ops.pallas.paged_attention import paged_flash_decode  # noqa: F401

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k_pages: Array            # [G, L, P, ps, hb*D]
    v_pages: Array            # [G, L, P, ps, hb*D]
    page_table: Array         # [B, max_pages] int32
    lengths: Array            # [B] int32
    k_scale: Optional[Array] = None  # [G, L, P, hb, ps] (int8 mode)
    v_scale: Optional[Array] = None  # [G, L, P, ps, hb] (int8 mode)

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


def default_head_block(num_kv_heads: int) -> int:
    """Heads interleaved per page lane-block. 8 fills the sublanes of
    the kernel's per-group query block at MHA and keeps the
    block-diagonal MXU waste (~hb x on idle FLOPs) modest."""
    for hb in (8, 4, 2, 1):
        if num_kv_heads % hb == 0:
            return min(hb, num_kv_heads)
    return 1


def init_paged_kv_cache(
    cfg: ModelConfig,
    batch: int,
    num_pages: int,
    page_size: int = 128,
    max_pages_per_slot: Optional[int] = None,
    dtype=jnp.bfloat16,
    head_block: Optional[int] = None,
) -> PagedKVCache:
    if max_pages_per_slot is None:
        max_pages_per_slot = -(-cfg.max_seq_len // page_size)
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    hb = head_block or default_head_block(H)
    assert H % hb == 0
    G = H // hb
    dtype = jnp.dtype(dtype)
    kshape = (G, L, num_pages, page_size, hb * D)
    k_scale = v_scale = None
    if dtype == jnp.int8:
        k_scale = jnp.zeros((G, L, num_pages, hb, page_size), jnp.float32)
        v_scale = jnp.zeros((G, L, num_pages, page_size, hb), jnp.float32)
    return PagedKVCache(
        k_pages=jnp.zeros(kshape, dtype),
        v_pages=jnp.zeros(kshape, dtype),
        page_table=jnp.zeros((batch, max_pages_per_slot), jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
        k_scale=k_scale,
        v_scale=v_scale,
    )


# ----------------------------------------------------------------- reads

def gather_pages_k(pages: Array, l: Array, table: Array, maxp: int,
                   head_dim: int) -> Array:
    """pages [G, L, P, ps, hb*D] -> [B, H, maxp*ps, D] for layer l."""
    G, L, P, ps, hbD = pages.shape
    hb = hbD // head_dim
    layer = jax.lax.dynamic_index_in_dim(pages, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [G, B, mp, ps, hbD]
    B, mp = table.shape[0], min(maxp, table.shape[1])
    sub = sub.reshape(G, B, mp, ps, hb, head_dim)
    return sub.transpose(1, 0, 4, 2, 3, 5).reshape(
        B, G * hb, mp * ps, head_dim
    )


def gather_pages_v(pages: Array, l: Array, table: Array, maxp: int,
                   head_dim: int) -> Array:
    """pages [G, L, P, ps, hb*D] -> [B, H, D, maxp*ps] (D-major, the
    attend_cache layout) for layer l."""
    G, L, P, ps, hbD = pages.shape
    hb = hbD // head_dim
    layer = jax.lax.dynamic_index_in_dim(pages, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [G, B, mp, ps, hbD]
    B, mp = table.shape[0], min(maxp, table.shape[1])
    sub = sub.reshape(G, B, mp, ps, hb, head_dim)
    return sub.transpose(1, 0, 4, 5, 2, 3).reshape(
        B, G * hb, head_dim, mp * ps
    )


def gather_pages_scale_k(scales: Array, l: Array, table: Array,
                         maxp: int) -> Array:
    """[G, L, P, hb, ps] -> [B, H, maxp*ps]."""
    G, L, P, hb, ps = scales.shape
    layer = jax.lax.dynamic_index_in_dim(scales, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [G, B, mp, hb, ps]
    B, mp = table.shape[0], min(maxp, table.shape[1])
    return sub.transpose(1, 0, 3, 2, 4).reshape(B, G * hb, mp * ps)


def gather_pages_scale_v(scales: Array, l: Array, table: Array,
                         maxp: int) -> Array:
    """[G, L, P, ps, hb] -> [B, H, maxp*ps]."""
    G, L, P, ps, hb = scales.shape
    layer = jax.lax.dynamic_index_in_dim(scales, l, 1, keepdims=False)
    sub = jnp.take(layer, table[:, :maxp], axis=1)  # [G, B, mp, ps, hb]
    B, mp = table.shape[0], min(maxp, table.shape[1])
    return sub.transpose(1, 0, 4, 2, 3).reshape(B, G * hb, mp * ps)


# ---------------------------------------------------------------- writes

def write_tokens_paged_k(pages: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """pages [G, L, P, ps, hb*D]; new [B, H, S, D]; start [B].

    All writes are dynamic_update_slices — XLA provably aliases DUS in
    place, where a general scatter forced a copy of the WHOLE pool
    every layer (103 ms/step per pool at 7B b8; docs/PERF.md r2).
    Decode (S == 1) is one DUS per slot (a contiguous 2*hb*D-byte row
    per group); prefill walks the touched pages, read-merge-writing
    each so an unaligned append keeps the page's earlier tokens."""
    B, H, S, D = new.shape
    G, _, _, ps, hbD = pages.shape
    hb = hbD // D
    maxcol = table.shape[1] - 1
    vals = new.astype(pages.dtype)
    if S == 1:
        rows = vals[:, :, 0, :].reshape(B, G, 1, 1, 1, hbD)
        for b in range(B):
            pos = start[b]
            pid = table[b, jnp.minimum(pos // ps, maxcol)]
            pages = jax.lax.dynamic_update_slice(
                pages, rows[b], (0, l, pid, pos % ps, 0)
            )
        return pages
    # ceil(S/ps)+1 pages can be touched by an unaligned append (an
    # S//ps+1 count dropped the tail tokens when off0 + S crossed the
    # last counted page boundary); extra chunks are fully masked
    nchunks = -(-S // ps) + 1
    lane = jnp.arange(ps, dtype=jnp.int32)
    for b in range(B):
        sb = start[b]
        off0 = sb % ps
        cap = table.shape[1] * ps
        # [H, S, D] -> [G, S, hb*D]; front/back zero-pad so every
        # chunk's dynamic_slice stays in range (no XLA offset clamping,
        # which would shift values)
        rows = vals[b].reshape(G, hb, S, D).transpose(0, 2, 1, 3).reshape(
            G, S, hbD
        )
        newp = jnp.pad(rows, ((0, 0), (ps, ps), (0, 0)))
        for i in range(nchunks):
            pi = sb // ps + i
            pid = table[b, jnp.minimum(pi, maxcol)]
            chunk = jax.lax.dynamic_slice(
                newp, (0, i * ps - off0 + ps, 0), (G, ps, hbD)
            )
            old = jax.lax.dynamic_slice(
                pages, (0, l, pid, 0, 0), (G, 1, 1, ps, hbD)
            )[:, 0, 0]
            posv = pi * ps + lane
            # also bound by table capacity: when a padded bucket
            # overruns the slot's pages, pi clamps to the LAST page
            # and unmasked pad rows would destroy its valid KV
            keep = (posv >= sb) & (posv < sb + S) & (posv < cap)
            upd = jnp.where(keep[None, :, None], chunk, old)
            pages = jax.lax.dynamic_update_slice(
                pages, upd[:, None, None], (0, l, pid, 0, 0)
            )
    return pages


def write_tokens_paged_v(pages: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """pages [G, L, P, ps, hb*D]; new [B, H, D, S] (the transposed
    activation layout); start [B]. V pages share K's layout."""
    return write_tokens_paged_k(pages, new.transpose(0, 1, 3, 2), l, table,
                                start)


def write_scales_paged_k(scales: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """scales [G, L, P, hb, ps]; new [B, H, S]."""
    B, H, S = new.shape
    G, _, _, hb, ps = scales.shape
    maxcol = table.shape[1] - 1
    vals = new.astype(scales.dtype)
    if S == 1:
        cols = vals.reshape(B, G, 1, 1, hb, 1)
        for b in range(B):
            pos = start[b]
            pid = table[b, jnp.minimum(pos // ps, maxcol)]
            scales = jax.lax.dynamic_update_slice(
                scales, cols[b], (0, l, pid, 0, pos % ps)
            )
        return scales
    # ceil(S/ps)+1 pages can be touched by an unaligned append (an
    # S//ps+1 count dropped the tail tokens when off0 + S crossed the
    # last counted page boundary); extra chunks are fully masked
    nchunks = -(-S // ps) + 1
    lane = jnp.arange(ps, dtype=jnp.int32)
    for b in range(B):
        sb = start[b]
        off0 = sb % ps
        cap = table.shape[1] * ps
        rows = vals[b].reshape(G, hb, S)
        newp = jnp.pad(rows, ((0, 0), (0, 0), (ps, ps)))
        for i in range(nchunks):
            pi = sb // ps + i
            pid = table[b, jnp.minimum(pi, maxcol)]
            chunk = jax.lax.dynamic_slice(
                newp, (0, 0, i * ps - off0 + ps), (G, hb, ps)
            )
            old = jax.lax.dynamic_slice(
                scales, (0, l, pid, 0, 0), (G, 1, 1, hb, ps)
            )[:, 0, 0]
            posv = pi * ps + lane
            # also bound by table capacity: when a padded bucket
            # overruns the slot's pages, pi clamps to the LAST page
            # and unmasked pad rows would destroy its valid KV
            keep = (posv >= sb) & (posv < sb + S) & (posv < cap)
            upd = jnp.where(keep[None, None, :], chunk, old)
            scales = jax.lax.dynamic_update_slice(
                scales, upd[:, None, None], (0, l, pid, 0, 0)
            )
    return scales


def write_scales_paged_v(scales: Array, new: Array, l: Array, table: Array,
                         start: Array) -> Array:
    """scales [G, L, P, ps, hb]; new [B, H, S]."""
    B, H, S = new.shape
    G, _, _, ps, hb = scales.shape
    maxcol = table.shape[1] - 1
    vals = new.astype(scales.dtype)
    if S == 1:
        rows = vals.reshape(B, G, 1, 1, 1, hb)
        for b in range(B):
            pos = start[b]
            pid = table[b, jnp.minimum(pos // ps, maxcol)]
            scales = jax.lax.dynamic_update_slice(
                scales, rows[b], (0, l, pid, pos % ps, 0)
            )
        return scales
    # ceil(S/ps)+1 pages can be touched by an unaligned append (an
    # S//ps+1 count dropped the tail tokens when off0 + S crossed the
    # last counted page boundary); extra chunks are fully masked
    nchunks = -(-S // ps) + 1
    lane = jnp.arange(ps, dtype=jnp.int32)
    for b in range(B):
        sb = start[b]
        off0 = sb % ps
        cap = table.shape[1] * ps
        rows = vals[b].reshape(G, hb, S).transpose(0, 2, 1)  # [G, S, hb]
        newp = jnp.pad(rows, ((0, 0), (ps, ps), (0, 0)))
        for i in range(nchunks):
            pi = sb // ps + i
            pid = table[b, jnp.minimum(pi, maxcol)]
            chunk = jax.lax.dynamic_slice(
                newp, (0, i * ps - off0 + ps, 0), (G, ps, hb)
            )
            old = jax.lax.dynamic_slice(
                scales, (0, l, pid, 0, 0), (G, 1, 1, ps, hb)
            )[:, 0, 0]
            posv = pi * ps + lane
            # also bound by table capacity: when a padded bucket
            # overruns the slot's pages, pi clamps to the LAST page
            # and unmasked pad rows would destroy its valid KV
            keep = (posv >= sb) & (posv < sb + S) & (posv < cap)
            upd = jnp.where(keep[None, :, None], chunk, old)
            scales = jax.lax.dynamic_update_slice(
                scales, upd[:, None, None], (0, l, pid, 0, 0)
            )
    return scales


# ------------------------------------------------- decode flash routing

def paged_flash_enabled(dtype) -> bool:
    """Route paged decode through the flash kernel? (CPU runs it in
    interpret mode only under forced 'pallas' tests — auto mode keeps
    the gather path there; GSPMD-sharded params take the explicit
    shard_map route below instead.)"""
    from ..ops import kernel_mode, sharded_params

    return (
        kernel_mode() in ("pallas", "auto")
        and jax.default_backend() not in ("cpu",)
        and not sharded_params()
    )


def paged_flash_tp_enabled(G: int, Hq: int, mesh) -> bool:
    """Route SHARDED paged decode through shard_map(paged_flash_decode)?

    Requires a mesh with a 'tp' axis whose size divides both the pool's
    head-group count G and the query head count Hq (pick head_block =
    num_kv_heads // tp at engine init so G == tp at 7B tp=8). Without
    this route, sharded paged decode falls back to gather_pages_*, which
    materializes the whole window per layer (measured 103 ms/step per
    pool at 7B b8 — docs/PERF.md r2)."""
    from ..ops import kernel_mode

    if mesh is None or "tp" not in mesh.axis_names:
        return False
    tp = mesh.shape["tp"]
    if tp < 1 or G % tp != 0 or Hq % tp != 0:
        return False
    if jax.default_backend() == "cpu":
        # interpret-mode only under forced 'pallas' (parity tests) or the
        # narrow env opt-in (dryrun: forcing 'pallas' globally would also
        # misroute the sharded quantized matmuls, which must stay jnp)
        import os

        return (kernel_mode() == "pallas"
                or os.environ.get("MLC_PAGED_TP_INTERPRET") == "1")
    return kernel_mode() in ("pallas", "auto")


def paged_flash_decode_tp(
    q: Array,            # [B, Hq, 1, D]
    k_pages: Array,      # [G, L, P, ps, hb*D]
    v_pages: Array,
    k_scale: Optional[Array],
    v_scale: Optional[Array],
    page_table: Array,   # [B, maxp]
    lengths: Array,      # [B]
    layer: Array,        # scalar
    *,
    num_pages_window: int,
    head_dim: int,
    mesh,
    interpret: bool = False,
) -> Array:
    """paged_flash_decode under GSPMD: explicit shard_map over the mesh.

    pallas_call has no SPMD partitioning rule, so the kernel re-enters
    manual-sharding land: head groups ride 'tp' (G is the pool's natural
    shard dim — each group's pages + scales are self-contained), batch
    rides the non-'tp' axes when divisible. Each device runs the SAME
    kernel on its local [G/tp, ...] pool shard and [B(/dp), Hq/tp, 1, D]
    queries; no collectives are needed inside — the head-sharded output
    feeds the row-parallel o-proj, whose all-reduce GSPMD already places
    (tests/test_sharding.py::test_sharded_decode_places_all_reduces).
    """
    from jax.sharding import PartitionSpec as P

    B, Hq = q.shape[0], q.shape[1]
    G, _, _, ps, _ = k_pages.shape
    tp_ax = "tp" if (
        "tp" in mesh.axis_names
        and G % mesh.shape["tp"] == 0
        and Hq % mesh.shape["tp"] == 0
    ) else None
    batch_axes = tuple(
        a for a in mesh.axis_names if a != "tp" and mesh.shape[a] > 1
    )
    bprod = 1
    for a in batch_axes:
        bprod *= mesh.shape[a]
    b_ax = batch_axes if (batch_axes and B % bprod == 0) else None

    # int8 is a dtype property, NOT a scale-shape property: detecting
    # "dummy" scales by shape[0]==1 would silently drop REAL scales on
    # a single-head-group pool (G==1) and zero the attention output
    int8 = k_pages.dtype == jnp.int8
    if not int8 or k_scale is None:
        # replicated dummies (the kernel only reads them in int8 mode)
        hb = k_pages.shape[4] // head_dim
        k_scale = jnp.zeros((1, 1, 1, hb, ps), jnp.float32)
        v_scale = jnp.zeros((1, 1, 1, ps, hb), jnp.float32)

    pool_spec = P(tp_ax, None, None, None, None)
    sc_spec = P(tp_ax if int8 else None, None, None, None, None)

    def local(q_, kp, vp, ks, vs, tbl, ln, lt):
        return paged_flash_decode(
            q_, kp, vp,
            ks if int8 else None, vs if int8 else None,
            tbl, ln, lt,
            num_pages_window=num_pages_window, head_dim=head_dim,
            interpret=interpret,
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(b_ax, tp_ax, None, None),   # q
            pool_spec,                    # k_pages
            pool_spec,                    # v_pages
            sc_spec,                      # k_scale
            sc_spec,                      # v_scale
            P(b_ax, None),                # page_table
            P(b_ax),                      # lengths
            P(),                          # layer scalar
        ),
        out_specs=P(b_ax, tp_ax, None, None),
        check_vma=False,
    )(q, k_pages, v_pages, k_scale, v_scale, page_table, lengths,
      jnp.asarray(layer, jnp.int32))


# ------------------------------------------------------------- allocator

class PageAllocator:
    """Host-side refcounted free-list page allocator.

    Page 0 is reserved as the null page (page_table's padding value),
    so unused table entries always reference valid storage.

    Refcounts enable PREFIX SHARING: a page can back multiple slots'
    page tables (and a PrefixCache entry) at once; free() decrements and
    only returns the page to the pool at zero."""

    def __init__(self, num_pages: int):
        assert num_pages >= 2
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, 0, -1))  # stack; 0 reserved
        self._refs = [0] * num_pages

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def can_alloc(self, n: int) -> bool:
        return n <= len(self._free)

    def alloc(self, n: int):
        if n > len(self._free):
            raise MemoryError(f"paged KV: need {n} pages, {len(self._free)} free")
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._refs[p] = 1
        return pages

    def ref(self, pages) -> None:
        """Take an additional reference on already-allocated pages."""
        for p in pages:
            assert 0 < p < self.num_pages and self._refs[p] > 0, p
            self._refs[p] += 1

    def free(self, pages) -> None:
        for p in pages:
            assert 0 < p < self.num_pages
            assert self._refs[p] > 0, f"double free of page {p}"
            self._refs[p] -= 1
            if self._refs[p] == 0:
                self._free.append(p)


class PrefixCache:
    """Page-granular prompt-prefix cache (automatic prefix caching).

    Absent in the reference (its runtime serves one session and clears
    the cache between them, llm_chat.cc:507-516); for batch serving the
    dominant TTFT cost of requests sharing a system prompt is
    re-prefilling that prefix. Pages make sharing free: a cached prefix
    is just a list of page ids that multiple slots' page tables (and
    this cache) reference concurrently — and because entries only cover
    FULL pages, a new request's suffix prefill always starts writing in
    a fresh page, so no copy-on-write is ever needed.

    Entries are keyed by the exact token tuple of each page-aligned
    prefix; lookup probes aligned lengths longest-first. The cache holds
    its own reference on every entry's pages (they survive slot
    recycling); evict() releases LRU entries — the scheduler calls it
    under pool pressure before deferring admission."""

    def __init__(self, allocator: PageAllocator, page_size: int,
                 max_pages: Optional[int] = None):
        self.allocator = allocator
        self.page_size = page_size
        self.max_pages = max_pages
        self._entries: dict = {}  # token tuple -> [pages]
        self._clock = 0
        self._last_used: dict = {}
        self.hits = 0
        self.misses = 0

    @property
    def pages_held(self) -> int:
        """UNIQUE pages referenced by the cache (nested prefix entries
        share their underlying pages)."""
        return len({p for pages in self._entries.values() for p in pages})

    def lookup(self, prompt) -> tuple:
        """(shared_pages, shared_len): the longest cached page-aligned
        prefix STRICTLY shorter than the prompt (the last prompt token
        must still be prefilled to produce first-token logits)."""
        ps = self.page_size
        max_len = (len(prompt) - 1) // ps * ps
        for L in range(max_len, 0, -ps):
            key = tuple(prompt[:L])
            pages = self._entries.get(key)
            if pages is not None:
                self._clock += 1
                self._last_used[key] = self._clock
                self.hits += 1
                return list(pages), L
        self.misses += 1
        return [], 0

    def insert(self, prompt, slot_pages) -> None:
        """Register every page-aligned prefix of a fully-prefilled
        prompt (slot_pages = the slot's page-id list, page i backing
        positions [i*ps, (i+1)*ps))."""
        ps = self.page_size
        for L in range(ps, len(prompt) + 1, ps):
            key = tuple(prompt[:L])
            if key in self._entries:
                continue
            npages = L // ps
            if self.max_pages is not None:
                held = {p for ps_ in self._entries.values() for p in ps_}
                new = len(set(slot_pages[:npages]) - held)
                while (len(held) + new > self.max_pages and self._entries):
                    if not self.evict(1):
                        break
                    held = {p for ps_ in self._entries.values() for p in ps_}
                    new = len(set(slot_pages[:npages]) - held)
                if len(held) + new > self.max_pages:
                    return
            pages = list(slot_pages[:npages])
            self.allocator.ref(pages)
            self._entries[key] = pages
            self._clock += 1
            self._last_used[key] = self._clock

    def evict(self, n_entries: int = 1) -> int:
        """Release up to n_entries LRU entries; returns how many."""
        done = 0
        for key in sorted(self._entries, key=lambda k: self._last_used[k]):
            if done >= n_entries:
                break
            self.allocator.free(self._entries.pop(key))
            self._last_used.pop(key, None)
            done += 1
        return done

    def clear(self) -> None:
        while self._entries:
            self.evict(len(self._entries))
