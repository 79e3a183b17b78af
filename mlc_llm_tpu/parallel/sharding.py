"""Mesh construction + NamedSharding rules for params and KV cache.

Megatron-style placement, expressed declaratively and compiled by
GSPMD (no hand-written collectives):

- wqkv, w_in (and their biases): column-parallel — output dim over 'tp'
- wo, w_out: row-parallel — reduction dim over 'tp' (GSPMD inserts the
  all-reduce after the matmul, i.e. after o_proj and down_proj, exactly
  the overlap points named in SURVEY.md §2.9)
- embedding / lm_head: vocab-sharded
- KV cache: heads over 'tp', batch over 'dp'
- norms, rotary tables, row-parallel biases: replicated

QuantizedTensor leaves shard like their logical [k, n] weight; the
group-scale arrays [n_groups, n] inherit the same column/row spec
(k-sharding requires the per-shard k to be a multiple of group_size
for collective-free dequant — true for all real configs at tp<=8).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import KVCache


def make_mesh(
    tp: Optional[int] = None, dp: int = 1, devices=None
) -> Mesh:
    """Mesh with ('dp', 'tp') axes. Default: all devices on 'tp'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None:
        tp = n // dp
    assert dp * tp <= n, f"dp({dp}) * tp({tp}) > devices({n})"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# param-key -> (spec for the [k, n] weight). L-stacked leaves get None
# prepended automatically for the layer axis.
_COL = P(None, "tp")  # column-parallel: shard n
_ROW = P("tp", None)  # row-parallel: shard k
_REP = P(None, None)

_WEIGHT_RULES = [
    (r"layers/wqkv", _COL),
    (r"layers/w_in", _COL),
    (r"layers/wo", _ROW),
    (r"layers/w_out", _ROW),
    (r"embed/w", _COL),     # quantized embed stored [H, V]: shard vocab
    (r"lm_head/w", _COL),   # [H, V]: shard vocab (logits vocab-sharded)
]
_BIAS_RULES = [
    (r"layers/bqkv", P("tp")),
    (r"layers/b_in", P("tp")),
    (r"layers/bo", P(None)),
    (r"layers/b_out", P(None)),
    (r"lm_head/b", P("tp")),
]
# dense (unquantized) embedding is [V, H]: shard vocab = dim 0
_DENSE_EMBED = P("tp", None)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def _spec_for(path_s: str, leaf, is_layer_stacked: bool) -> P:
    for pat, spec in _WEIGHT_RULES:
        if re.search(pat, path_s):
            # dense embedding is [V, H] (leaf path exactly "embed/w");
            # quantized embedding leaves are "embed/w/data" etc in [H, V]
            if path_s == "embed/w":
                spec = _DENSE_EMBED
            # QuantizedTensor sub-leaves (data/scale/zero) all share the
            # weight's [.., n]-style spec; scale/zero are [g, n]
            if is_layer_stacked:
                return P(None, *spec)
            return spec
    for pat, spec in _BIAS_RULES:
        if re.search(pat, path_s):
            if is_layer_stacked:
                return P(None, *spec)
            return spec
    # norms, rotary, everything else: replicated
    ndim = getattr(leaf, "ndim", 1)
    if is_layer_stacked:
        return P(*([None] * ndim))
    return P(*([None] * ndim))


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching `params` (QuantizedTensor-aware)."""

    axis_size = {name: mesh.shape[name] for name in mesh.axis_names}

    def assign(path, leaf):
        path_s = _path_str(path)
        stacked = path_s.startswith("layers/") or "/layers/" in path_s
        spec = _spec_for(path_s, leaf, stacked)
        # trim/extend spec to leaf rank
        ndim = leaf.ndim
        dims = list(spec)
        if len(dims) < ndim:
            dims = dims + [None] * (ndim - len(dims))
        elif len(dims) > ndim:
            # e.g. 1-D bias under a 2-D rule; keep the sharded axes that fit
            dims = dims[:ndim]
        # replicate any axis the sharding doesn't divide (tiny test
        # configs; real configs keep group/head boundaries aligned)
        for i, ax in enumerate(dims):
            if ax is not None and leaf.shape[i] % axis_size[ax] != 0:
                dims[i] = None
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh):
    from ..ops import set_current_mesh, set_sharded_params

    if any(mesh.shape[ax] > 1 for ax in mesh.axis_names):
        # fused Pallas kernels have no SPMD partitioning rule; flip auto
        # kernel routing to the GSPMD-partitioned jnp path (ADVICE r1).
        # The paged flash-decode kernel is the exception: it re-enters
        # Pallas through an explicit shard_map over this mesh.
        set_sharded_params(True)
        set_current_mesh(mesh)
        params = _repack_hsplit_for_sharding(params)
    return jax.device_put(params, param_shardings(params, mesh))


def _repack_hsplit_for_sharding(params):
    """hsplit's element order is global in k, so row-sharding an hsplit
    tensor would make every dequantize reshard dequantized weights
    across devices; repack to the shard-local pair order once at load
    (exact — same codes/scales, different bit slots)."""
    from ..quant.groupwise import QuantizedTensor, to_pair_layout

    return jax.tree_util.tree_map(
        lambda x: to_pair_layout(x) if isinstance(x, QuantizedTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor))


def cache_shardings(
    mesh: Mesh, int8: bool = False, shapes: Optional[KVCache] = None
) -> KVCache:
    """[L, B, H, Smax, D]: batch over dp, heads over tp.

    shapes (a KVCache of arrays) enables the same replicate-on-indivisible
    fallback as param_shardings (tiny test configs with heads < tp)."""
    axis_size = {name: mesh.shape[name] for name in mesh.axis_names}

    def ns(spec, arr=None):
        dims = list(spec)
        if arr is not None:
            for i, ax in enumerate(dims):
                if ax is not None and arr.shape[i] % axis_size[ax] != 0:
                    dims[i] = None
        return NamedSharding(mesh, P(*dims))

    kv_spec = (None, "dp", "tp", None, None)
    sc_spec = (None, "dp", "tp", None)
    k = ns(kv_spec, None if shapes is None else shapes.k)
    v = ns(kv_spec, None if shapes is None else shapes.v)
    sc_k = ns(sc_spec, None if shapes is None else shapes.k_scale) if int8 else None
    sc_v = ns(sc_spec, None if shapes is None else shapes.v_scale) if int8 else None
    lengths = ns(("dp",), None if shapes is None else shapes.lengths)
    return KVCache(k=k, v=v, lengths=lengths, k_scale=sc_k, v_scale=sc_v)


def paged_cache_shardings(mesh: Mesh, cache) -> "PagedKVCache":
    """Paged pools [G, L, P, ps, hb*D]: head GROUPS over 'tp' (G is the
    pool's natural shard dim — each group's pages are self-contained,
    including its int8 scales), page table + lengths over 'dp'.

    Same replicate-on-indivisible fallback as param_shardings: a pool
    whose G doesn't divide by tp stays replicated (pick head_block so
    G = num_kv_heads/head_block is a multiple of tp to avoid that —
    engine/init_paged_kv_cache expose head_block)."""
    from ..models.paged_cache import PagedKVCache

    axis_size = {name: mesh.shape[name] for name in mesh.axis_names}

    def ns(spec, arr):
        if arr is None:
            return None
        dims = list(spec)
        for i, ax in enumerate(dims):
            if ax is not None and arr.shape[i] % axis_size.get(ax, 1) != 0:
                dims[i] = None
        return NamedSharding(mesh, P(*dims))

    pool_spec = ("tp", None, None, None, None)
    dp = "dp" if "dp" in mesh.axis_names else None
    return PagedKVCache(
        k_pages=ns(pool_spec, cache.k_pages),
        v_pages=ns(pool_spec, cache.v_pages),
        page_table=ns((dp, None), cache.page_table),
        lengths=ns((dp,), cache.lengths),
        k_scale=ns(pool_spec, cache.k_scale),
        v_scale=ns(pool_spec, cache.v_scale),
    )


def shard_paged_cache(cache, mesh: Mesh):
    from ..models.paged_cache import PagedKVCache

    s = paged_cache_shardings(mesh, cache)
    put = lambda a, sh: None if a is None else jax.device_put(a, sh)
    return PagedKVCache(
        k_pages=put(cache.k_pages, s.k_pages),
        v_pages=put(cache.v_pages, s.v_pages),
        page_table=put(cache.page_table, s.page_table),
        lengths=put(cache.lengths, s.lengths),
        k_scale=put(cache.k_scale, s.k_scale),
        v_scale=put(cache.v_scale, s.v_scale),
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    s = cache_shardings(mesh, int8=cache.k_scale is not None, shapes=cache)
    put = lambda a, sh: None if a is None else jax.device_put(a, sh)
    return KVCache(
        k=jax.device_put(cache.k, s.k),
        v=jax.device_put(cache.v, s.v),
        lengths=jax.device_put(cache.lengths, s.lengths),
        k_scale=put(cache.k_scale, s.k_scale),
        v_scale=put(cache.v_scale, s.v_scale),
    )
