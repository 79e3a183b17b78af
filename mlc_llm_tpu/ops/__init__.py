"""Compute ops: quantized matmul, attention, sampling.

Every op has a pure-jnp reference path (always correct, any backend) and
a Pallas TPU kernel path for the hot cases, selected via `kernel_mode`:

- "auto": Pallas on TPU when the shape/format is supported, else jnp
- "jnp":  always the jnp fallback
- "pallas": force Pallas (errors if unsupported) — used by kernel tests
"""

import os
from contextlib import contextmanager

_KERNEL_MODE = os.environ.get("MLC_TPU_KERNELS", "auto")


def kernel_mode() -> str:
    return _KERNEL_MODE


def set_kernel_mode(mode: str) -> None:
    global _KERNEL_MODE
    assert mode in ("auto", "jnp", "pallas"), mode
    _KERNEL_MODE = mode


# Set when weights are GSPMD-sharded over a >1-device mesh axis
# (parallel.sharding.shard_params). pallas_call has no SPMD partitioning
# rule for the fused dequant kernels, so auto mode must fall back to the
# jnp path (which GSPMD partitions correctly) — forcing mode="pallas" on
# sharded params is a user error. (ADVICE r1, medium.)
_SHARDED_PARAMS = False


def sharded_params() -> bool:
    return _SHARDED_PARAMS


def set_sharded_params(flag: bool) -> None:
    global _SHARDED_PARAMS
    _SHARDED_PARAMS = bool(flag)


# The mesh the params were sharded over (parallel.sharding.shard_params).
# The paged flash-decode kernel re-enters Pallas under GSPMD through an
# explicit shard_map over this mesh (head groups on 'tp'), which needs
# the mesh object at trace time — a NamedSharding annotation alone can't
# partition a pallas_call.
_CURRENT_MESH = None


def current_mesh():
    return _CURRENT_MESH


def set_current_mesh(mesh) -> None:
    global _CURRENT_MESH
    _CURRENT_MESH = mesh


@contextmanager
def use_kernels(mode: str):
    prev = kernel_mode()
    set_kernel_mode(mode)
    try:
        yield
    finally:
        set_kernel_mode(prev)


from .matmul import qmatmul  # noqa: E402
from .attention import attend  # noqa: E402
from .sampling import sample_token, sample_top_p  # noqa: E402

__all__ = [
    "kernel_mode",
    "set_kernel_mode",
    "use_kernels",
    "qmatmul",
    "attend",
    "sample_token",
    "sample_top_p",
]
