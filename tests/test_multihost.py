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


def test_llama65b_sharded_decode_lowers_abstractly():
    """North-star config 5 (llama-65b sharded) cannot materialize on
    test hardware; verify the full sharded decode program TRACES AND
    LOWERS with abstract inputs over a ('dcn','dp','tp') mesh."""
    import jax.numpy as jnp

    from mlc_llm_tpu.models import get_config
    from mlc_llm_tpu.models.transformer import forward, init_random_params

    from mlc_llm_tpu.models import init_kv_cache

    cfg = get_config("llama-65b")
    # full-size ABSTRACT pytrees (no memory): eval_shape of the real
    # constructors preserves structure + dtypes + shapes
    params_aval = jax.eval_shape(lambda: init_random_params(cfg, "bf16", seed=0))
    cache_aval = jax.eval_shape(lambda: init_kv_cache(cfg, 1, 512))
    tokens = jax.ShapeDtypeStruct((1, 1), jnp.int32)

    lowered = jax.jit(
        lambda p, t, c: forward(p, cfg, t, c, last_only=True)
    ).lower(params_aval, tokens, cache_aval)
    text = lowered.as_text()
    assert "stablehlo" in text[:2000] or "module" in text[:2000]
