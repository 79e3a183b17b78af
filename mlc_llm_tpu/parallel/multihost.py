"""Multi-host serving over ICI + DCN.

The reference is strictly single-device (SURVEY.md §2.9/§5.8); this is
the north-star scale-out path:

- `initialize()` wraps jax.distributed.initialize (coordinator
  discovery via env or explicit args)
- `make_pod_mesh()` builds a ('dcn', 'dp', 'tp') mesh where 'tp' spans
  chips WITHIN a host slice (collectives ride ICI) and 'dcn' spans
  hosts — weights are tp-sharded intra-host and replicated across the
  dcn axis, so decode all-reduces never cross DCN; requests are
  data-parallel across hosts (cross-host continuous batching routes
  whole requests, not activations)
- param/cache shardings reuse parallel.sharding rules with the dcn
  axis prepended as replication

Multi-host hardware is not reachable in this environment; dryrun tests
exercise the mesh/sharding logic on the virtual CPU mesh with a
dcn axis of size >= 1 (the GSPMD program is identical modulo axis
sizes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .sharding import param_shardings as _tp_param_shardings


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed bring-up. No-op when single-process and no
    coordinator is configured.

    Must run before anything touches the XLA backend — so the
    already-initialized check reads jax.distributed's client state
    instead of calling jax.process_count() (which would itself
    initialize the backend)."""
    if jax.distributed.is_initialized():
        return
    coord = coordinator_address or os.environ.get("MLC_COORDINATOR")
    if coord is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
    )


def recommended_xla_flags() -> str:
    """XLA flags for real TPU pods: enable the latency-hiding scheduler
    and async collective fusion so the decode-step all-reduces (GSPMD
    places one after o_proj and one after down_proj per layer — see
    tests/test_sharding.py::test_sharded_decode_places_all_reduces)
    overlap with the next matmuls. Single-chip and CPU runs ignore
    these. Set as XLA_FLAGS before process start:

        XLA_FLAGS="$(python -c 'from mlc_llm_tpu.parallel import \
            multihost; print(multihost.recommended_xla_flags())')"
    """
    return " ".join(
        [
            "--xla_tpu_enable_async_collective_fusion=true",
            "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
            "--xla_tpu_enable_async_collective_fusion_multiple_steps=true",
            "--xla_tpu_overlap_compute_collective_tc=true",
            "--xla_enable_async_all_gather=true",
            "--xla_enable_async_collective_permute=true",
        ]
    )


def make_pod_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    dcn: Optional[int] = None,
    devices=None,
) -> Mesh:
    """('dcn', 'dp', 'tp') mesh.

    tp defaults to local_device_count (one host's chips = one TP group);
    dcn defaults to process_count. Device order follows jax.devices(),
    which groups by process — so the dcn axis maps to host boundaries
    and tp stays inside a host's ICI domain.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn is None:
        dcn = max(1, jax.process_count())
    if tp is None:
        tp = n // (dcn * dp)
    assert dcn * dp * tp <= n, (dcn, dp, tp, n)
    arr = np.asarray(devices[: dcn * dp * tp]).reshape(dcn, dp, tp)
    return Mesh(arr, ("dcn", "dp", "tp"))


def pod_param_shardings(params, mesh: Mesh):
    """TP rules with replication over the 'dcn' axis (weights are
    replicated per host group; only 'tp'/'dp' appear in specs, which
    GSPMD interprets as replicated over the remaining 'dcn' axis)."""
    return _tp_param_shardings(params, mesh)


def shard_params_pod(params, mesh: Mesh):
    from .sharding import _repack_hsplit_for_sharding

    if any(mesh.shape[ax] > 1 for ax in mesh.axis_names):
        params = _repack_hsplit_for_sharding(params)
    return jax.device_put(params, pod_param_shardings(params, mesh))


def process_local_slots(total_slots: int) -> range:
    """Partition continuous-batching slots across hosts (each host's
    scheduler owns a contiguous slot range; requests never migrate)."""
    pc = max(1, jax.process_count())
    pid = jax.process_index()
    per = total_slots // pc
    start = pid * per
    end = start + per if pid < pc - 1 else total_slots
    return range(start, end)
