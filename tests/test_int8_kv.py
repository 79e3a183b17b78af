"""int8 KV cache + build driver tests."""

import jax.numpy as jnp
import numpy as np

from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params


def test_int8_kv_close_to_fp32():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    toks = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)

    ref, _ = forward(params, cfg, toks, init_kv_cache(cfg, 1, 16, jnp.float32))
    got, cache = forward(params, cfg, toks, init_kv_cache(cfg, 1, 16, jnp.int8))
    assert cache.k.dtype == jnp.int8 and cache.k_scale is not None
    ref, got = np.asarray(ref), np.asarray(got)
    rel = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel
    assert np.argmax(ref, -1) == np.argmax(got, -1)


def test_int8_kv_prefill_decode_consistency():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=1)
    toks = jnp.asarray([[5, 6, 7, 8, 9, 10]], jnp.int32)

    full, _ = forward(params, cfg, toks, init_kv_cache(cfg, 1, 16, jnp.int8))
    cache = init_kv_cache(cfg, 1, 16, jnp.int8)
    _, cache = forward(params, cfg, toks[:, :3], cache)
    out = None
    for i in range(3, 6):
        out, cache = forward(params, cfg, toks[:, i : i + 1], cache)
    # int8 requant between paths is identical (same per-token scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-4, rtol=1e-4)


def test_engine_with_int8_cache():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "q4bf16", seed=2)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64,
                          cache_dtype=jnp.int8)
    out = eng.generate([[5, 6, 7], [8, 9]],
                       GenerationConfig(max_new_tokens=5, temperature=0.0))
    assert len(out[0]) > 0 and len(out[1]) > 0


def test_scheduler_with_int8_cache():
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=3)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64,
                          cache_dtype=jnp.int8)
    sched = ContinuousBatchingScheduler(eng)
    reqs = [sched.submit([i + 1, i + 2], GenerationConfig(max_new_tokens=3, temperature=0.0))
            for i in range(4)]
    sched.run()
    assert all(r.done for r in reqs)
    want = eng.generate([[1, 2]], GenerationConfig(max_new_tokens=3, temperature=0.0))[0]
    assert reqs[0].output == want


def test_build_driver_random(tmp_path):
    from mlc_llm_tpu import build as build_mod
    from mlc_llm_tpu.utils.checkpoint import load_params

    out = str(tmp_path / "ck")
    build_mod.main([
        "--model", "tiny-gpt_neox", "--random", "--quantization", "q4bf16",
        "-o", out, "--platform", "cpu",
    ])
    params, meta = load_params(out)
    assert meta["model"] == "tiny-gpt_neox"
    assert meta["quantization"] == "q4bf16"
    cfg = get_config("tiny-gpt_neox")
    toks = jnp.asarray([[1, 2]], jnp.int32)
    logits, _ = forward(params, cfg, toks, init_kv_cache(cfg, 1, 8))
    assert np.isfinite(np.asarray(logits)).all()
