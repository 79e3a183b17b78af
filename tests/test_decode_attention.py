"""Flash-decode attention kernel vs jnp reference (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlc_llm_tpu.ops.attention import attend
from mlc_llm_tpu.ops.pallas.decode_attention import decode_attention


def _mk(shape, seed=0, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * scale


@pytest.mark.parametrize("B,H,S,D", [(1, 4, 256, 128), (3, 8, 384, 128)])
def test_matches_jnp_attend(B, H, S, D):
    k = _mk((B, H, S, D), 1).astype(jnp.bfloat16)
    v = _mk((B, H, S, D), 2).astype(jnp.bfloat16)
    q = _mk((B, H, 1, D), 3).astype(jnp.bfloat16)
    lengths = jnp.asarray([(S // 2 + 17 * b) % S + 1 for b in range(B)], jnp.int32)

    got = decode_attention(q[:, :, 0, :], k, v, lengths)
    want = attend(q, k, v, lengths - 1)[:, :, 0, :]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_length_one_and_full():
    B, H, S, D = 2, 4, 256, 128
    k = _mk((B, H, S, D), 5).astype(jnp.bfloat16)
    v = _mk((B, H, S, D), 6).astype(jnp.bfloat16)
    q = _mk((B, H, 1, D), 7).astype(jnp.bfloat16)
    for L in (1, S):
        lengths = jnp.full((B,), L, jnp.int32)
        got = decode_attention(q[:, :, 0, :], k, v, lengths)
        want = attend(q, k, v, lengths - 1)[:, :, 0, :]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=3e-2, rtol=3e-2,
        )


def test_int8_kv_kernel():
    B, H, S, D = 2, 4, 256, 128
    kf = np.asarray(_mk((B, H, S, D), 8))
    vf = np.asarray(_mk((B, H, S, D), 9))
    ks = np.maximum(np.abs(kf).max(-1) / 127.0, 1e-8)
    vs = np.maximum(np.abs(vf).max(-1) / 127.0, 1e-8)
    kq = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    vq = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    q = _mk((B, H, 1, D), 10).astype(jnp.bfloat16)
    lengths = jnp.asarray([100, 256], jnp.int32)

    got = decode_attention(
        q[:, :, 0, :], jnp.asarray(kq), jnp.asarray(vq), lengths,
        jnp.asarray(ks, jnp.float32), jnp.asarray(vs, jnp.float32),
    )
    kd = (kq.astype(np.float32) * ks[..., None]).astype(np.float32)
    vd = (vq.astype(np.float32) * vs[..., None]).astype(np.float32)
    want = attend(q, jnp.asarray(kd, jnp.bfloat16), jnp.asarray(vd, jnp.bfloat16),
                  lengths - 1)[:, :, 0, :]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=4e-2, rtol=4e-2,
    )


def test_forward_with_forced_kernel_matches_jnp():
    from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
    from mlc_llm_tpu.ops import use_kernels

    # head_dim must be 128 for the kernel (tiny-llama's is 16)
    cfg = get_config("tiny-llama").replace(
        max_seq_len=128, hidden_size=512, num_heads=4, num_kv_heads=4,
        intermediate_size=256,
    )
    params = init_random_params(cfg, "f32", seed=0)
    cache1 = init_kv_cache(cfg, 1, 128, jnp.float32)
    toks = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    with use_kernels("jnp"):
        _, cache1 = forward(params, cfg, toks, cache1)
        ref, _ = forward(params, cfg, jnp.asarray([[9]], jnp.int32), cache1)
    cache2 = init_kv_cache(cfg, 1, 128, jnp.float32)
    with use_kernels("pallas"):
        _, cache2 = forward(params, cfg, toks, cache2)
        got, _ = forward(params, cfg, jnp.asarray([[9]], jnp.int32), cache2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3
    )
