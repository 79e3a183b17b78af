"""Pod-mesh (dcn axis) sharding tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
from mlc_llm_tpu.parallel.multihost import (
    make_pod_mesh,
    process_local_slots,
    shard_params_pod,
)


def test_pod_mesh_axes():
    mesh = make_pod_mesh(tp=4, dp=1, dcn=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    assert mesh.shape["dcn"] == 2 and mesh.shape["tp"] == 4


def test_pod_sharded_forward_matches_single_device():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    ref, _ = forward(params, cfg, toks, init_kv_cache(cfg, 1, 8, jnp.float32))

    mesh = make_pod_mesh(tp=4, dp=1, dcn=2)
    sp = shard_params_pod(params, mesh)
    got, _ = jax.jit(lambda p, t: forward(p, cfg, t, init_kv_cache(cfg, 1, 8, jnp.float32)))(sp, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    # weights replicated across dcn: each dcn group holds a full copy
    wqkv = sp["layers"]["wqkv"]
    assert len(wqkv.addressable_shards) == 8
    shard_cols = {s.data.shape[2] for s in wqkv.addressable_shards}
    assert shard_cols == {wqkv.shape[2] // 4}


def test_process_local_slots_single_process():
    assert list(process_local_slots(8)) == list(range(8))
