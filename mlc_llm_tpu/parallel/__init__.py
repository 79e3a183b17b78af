"""Tensor/data-parallel sharding over a jax.sharding.Mesh.

The reference has NO distributed layer (SURVEY.md §2.9); this package
is the TPU-native addition from the north star: weights + KV cache
tensor-sharded over ICI, batch over DP, collectives inserted by
GSPMD/pjit from NamedSharding annotations.
"""

from .sharding import (
    make_mesh,
    param_shardings,
    shard_params,
    cache_shardings,
    shard_cache,
    paged_cache_shardings,
    shard_paged_cache,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "shard_params",
    "cache_shardings",
    "shard_cache",
    "paged_cache_shardings",
    "shard_paged_cache",
]
