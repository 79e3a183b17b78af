"""TP/DP sharding tests on the 8-device virtual CPU mesh.

Checks that sharded execution is NUMERICALLY IDENTICAL to single-device
execution and that weights actually land distributed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
from mlc_llm_tpu.parallel import make_mesh, shard_cache, shard_params


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4), (1, 8)])
def test_sharded_forward_matches_single_device(dp, tp):
    if dp * tp > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = get_config("tiny-llama")  # 4 heads -> tp<=4 head-aligned; tp=8 pads
    if tp > cfg.num_heads:
        cfg = cfg.replace(num_heads=8, num_kv_heads=8)
    params = init_random_params(cfg, "f32", seed=0)
    toks = jnp.asarray([[1, 5, 9, 2]] * dp, jnp.int32)

    cache = init_kv_cache(cfg, batch=dp, max_len=16, dtype=jnp.float32)
    ref, _ = forward(params, cfg, toks, cache, last_only=True)

    mesh = make_mesh(tp=tp, dp=dp)
    sp = shard_params(params, mesh)
    sc = shard_cache(init_kv_cache(cfg, batch=dp, max_len=16, dtype=jnp.float32), mesh)
    got, new_cache = jax.jit(
        lambda p, t, c: forward(p, cfg, t, c, last_only=True)
    )(sp, toks, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)
    assert int(new_cache.lengths[0]) == 4


def test_quantized_sharded_forward():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "q4bf16", seed=1)
    toks = jnp.asarray([[3, 1, 4]], jnp.int32)
    cache = init_kv_cache(cfg, batch=1, max_len=16)
    ref, _ = forward(params, cfg, toks, cache, last_only=True)

    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    sc = shard_cache(init_kv_cache(cfg, batch=1, max_len=16), mesh)
    got, _ = jax.jit(lambda p, t, c: forward(p, cfg, t, c, last_only=True))(
        sp, toks, sc
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_weights_actually_distributed():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(params, mesh)
    wqkv = sp["layers"]["wqkv"]  # [L, H, 3HD] column-parallel
    shard_shapes = {s.data.shape for s in wqkv.addressable_shards}
    full = wqkv.shape
    assert all(ss[2] == full[2] // 4 for ss in shard_shapes), shard_shapes
    # row-parallel down-proj
    wout = sp["layers"]["w_out"]
    assert all(
        s.data.shape[1] == wout.shape[1] // 4 for s in wout.addressable_shards
    )


def test_engine_runs_with_sharded_params():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=2)
    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    eng = InferenceEngine(cfg, sp, max_batch=1, max_seq_len=32)
    eng.cache = shard_cache(eng.cache, mesh)
    out = eng.generate([[5, 6, 7]], GenerationConfig(max_new_tokens=4, temperature=0.0))
    ref_eng = InferenceEngine(cfg, params, max_batch=1, max_seq_len=32)
    ref = ref_eng.generate([[5, 6, 7]], GenerationConfig(max_new_tokens=4, temperature=0.0))
    assert out == ref


def test_sharded_params_gates_pallas_routing(monkeypatch):
    """shard_params over a >1-device mesh must flip auto kernel routing
    to the GSPMD-partitioned jnp path: pallas_call has no SPMD rule for
    the fused dequant kernels (ADVICE r1, medium)."""
    import jax as _jax
    import numpy as _np

    from mlc_llm_tpu import ops
    from mlc_llm_tpu.ops.matmul import qmatmul
    from mlc_llm_tpu.parallel.sharding import make_mesh, shard_params
    from mlc_llm_tpu.quant import quantize

    ops.set_sharded_params(False)
    mesh = make_mesh(tp=4, dp=2)
    # k=128 -> 4 groups (the qsplit default needs a 4-divisible count)
    w = quantize(_np.random.default_rng(0)
                 .standard_normal((128, 256)).astype(_np.float32), "q4bf16")
    try:
        shard_params({"layers/wqkv": w}, mesh)
        assert ops.sharded_params()
        # auto mode now routes to jnp even when the backend looks like a
        # TPU (where the un-partitionable pallas path would be chosen)
        monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
        y = qmatmul(jnp.ones((1, 128), jnp.bfloat16), w)
        assert y.shape == (1, 256)
    finally:
        ops.set_sharded_params(False)


def test_sharded_decode_places_all_reduces():
    """The north star puts the TP all-reduces after o_proj and down_proj
    (SURVEY §2.9). Verify GSPMD actually placed them in the OPTIMIZED
    sharded decode program: expect >= 2 all-reduce ops per layer (plus
    possibly one for the vocab-sharded logits). Async overlap itself is
    a TPU-pod scheduler property (multihost.recommended_xla_flags);
    placement is what is checkable on the virtual mesh."""
    from mlc_llm_tpu.models import forward

    cfg = get_config("tiny-llama")
    mesh = make_mesh(tp=8, dp=1)
    params = shard_params(init_random_params(cfg, "f32", seed=0), mesh)
    cache = shard_cache(
        init_kv_cache(cfg, batch=1, max_len=32, dtype=jnp.float32), mesh
    )
    toks = jnp.zeros((1, 1), jnp.int32)

    @jax.jit
    def decode(p, t, c):
        return forward(p, cfg, t, c, last_only=True)

    hlo = decode.lower(params, toks, cache).compile().as_text()
    n_ar = hlo.count("all-reduce")
    # the layer stack is a scan: its body should carry the two
    # per-layer all-reduces (attention out-proj + MLP down-proj)
    assert n_ar >= 2, f"expected >=2 all-reduce in sharded decode, got {n_ar}"


def test_shard_params_repacks_hsplit_to_pair():
    """hsplit's element order is global in k; shard_params must repack
    such tensors to the shard-local pair order (exact relayout) so
    row-sharded dequantize never reshards weights across devices."""
    import numpy as np

    from mlc_llm_tpu.parallel import make_mesh, shard_params
    from mlc_llm_tpu.quant import dequantize, quantize

    rng = np.random.default_rng(3)
    w = (rng.standard_normal((256, 256)) * 0.05).astype(np.float32)
    qt = quantize(w, "q4bf16_hs")
    mesh = make_mesh(tp=2)
    tree = shard_params({"layers/wo": qt}, mesh)
    out = tree["layers/wo"]
    assert out.spec.layout == "pair"
    np.testing.assert_array_equal(
        np.asarray(dequantize(out, "float32")),
        np.asarray(dequantize(qt, "float32")))
