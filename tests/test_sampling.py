"""Sampling op tests: greedy cutoff, nucleus truncation, top-k fast path."""

import jax
import jax.numpy as jnp
import numpy as np

from mlc_llm_tpu.ops.sampling import sample_token, sample_top_p


def _logits(B=2, V=1000, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, V)) * 3.0


def test_greedy_cutoff_matches_argmax():
    lg = _logits()
    tok = sample_token(lg, jax.random.PRNGKey(1), temperature=0.0, top_p=0.95)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(jnp.argmax(lg, -1)))


def test_topk_fast_path_draws_from_exact_nucleus():
    lg = _logits(B=1, V=512, seed=2)
    # analytic nucleus at top_p=0.9, temperature 0.8
    probs = np.asarray(jax.nn.softmax(lg / 0.8, axis=-1))[0]
    order = np.argsort(probs)[::-1]
    cum = np.cumsum(probs[order])
    ncut = int(np.searchsorted(cum, 0.9)) + 1
    nucleus = set(order[:ncut].tolist())
    assert ncut < 64  # precondition: top-k window covers the nucleus

    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    for top_k in (64, 0):
        draws = np.asarray(
            jax.vmap(lambda k: sample_top_p(lg, k, 0.8, 0.9, top_k=top_k))(keys)
        ).ravel()
        assert set(draws.tolist()) <= nucleus, (top_k, set(draws) - nucleus)


def test_top_p_limits_support():
    # one dominant token with p > top_p -> always chosen
    lg = jnp.zeros((1, 100)).at[0, 7].set(50.0)
    keys = jax.random.split(jax.random.PRNGKey(3), 50)
    toks = np.asarray(jax.vmap(lambda k: sample_top_p(lg, k, 1.0, 0.9))(keys))
    assert (toks == 7).all()


def test_per_slot_params():
    lg = jnp.stack([
        jnp.zeros((100,)).at[3].set(10.0),
        jnp.zeros((100,)).at[5].set(10.0),
    ])
    t = jnp.asarray([0.0, 0.0])  # both greedy via per-slot temps
    tok = sample_token(lg, jax.random.PRNGKey(0), t, jnp.asarray([0.9, 0.9]))
    assert tok.tolist() == [3, 5]


def test_high_temperature_spreads():
    lg = _logits(B=1, V=50, seed=4)
    keys = jax.random.split(jax.random.PRNGKey(5), 200)
    toks = np.asarray(jax.vmap(lambda k: sample_top_p(lg, k, 2.0, 1.0))(keys))
    assert len(set(toks.ravel().tolist())) > 5
