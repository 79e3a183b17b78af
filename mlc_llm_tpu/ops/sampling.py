"""On-device sampling: temperature softmax + nucleus (top-p) / top-k.

Replaces the reference's CPU sampler round-trip
(vm.builtin sample_top_p_from_{prob,logits}, used at
/root/reference/cpp/llm_chat.cc:848-855,963-975, which copies the full
vocab logits device->host every token). Here sampling runs on the
accelerator and only the token id leaves the device.

Greedy cutoff matches the runtime: temperature < 1e-6 => argmax
(/root/reference/cpp/llm_chat.cc:666-671,930-936).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def sample_top_p(
    logits: Array,
    key: Array,
    temperature: Array | float,
    top_p: Array | float,
    top_k: int = 64,
) -> Array:
    """Nucleus sampling. logits: [B, V] fp32; returns [B] int32.

    Keeps the smallest prefix of the descending-prob distribution whose
    cumulative mass reaches top_p (the token that crosses the threshold
    is kept), renormalizes, samples.

    top_k > 0 prefilters the distribution with lax.top_k before the
    nucleus cut — a full-vocab sort costs ~13 ms/step on a 32k vocab on
    TPU, while the nucleus virtually never needs more than a few dozen
    tokens at practical temperatures. top_k=0 gives the exact
    full-vocab path.
    """
    logits = logits.astype(jnp.float32)
    if top_k and top_k < logits.shape[-1]:
        return _sample_top_p_topk(logits, key, temperature, top_p, top_k)
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    # scalar or per-slot [B] parameters both broadcast over the vocab
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    if top_p.ndim == 1:
        top_p = top_p[:, None]
    scaled = logits / jnp.maximum(temperature, 1e-6)
    probs = jax.nn.softmax(scaled, axis=-1)

    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]  # descending
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens where the mass BEFORE them is < top_p
    keep_sorted = (cum - sorted_probs) < top_p
    # threshold prob: smallest kept probability per row
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_probs, jnp.inf), axis=-1, keepdims=True
    )
    masked = jnp.where(probs >= thresh, scaled, -jnp.inf)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def _sample_top_p_topk(logits, key, temperature, top_p, top_k: int):
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    if top_p.ndim == 1:
        top_p = top_p[:, None]
    scaled = logits / jnp.maximum(temperature, 1e-6)
    vals, idx = jax.lax.top_k(scaled, top_k)  # [B, K] descending
    # probabilities under the FULL softmax (one cheap logsumexp pass),
    # so the nucleus threshold matches the exact path
    lse = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
    probs = jnp.exp(vals - lse)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p
    masked = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, masked, axis=-1)  # [B] in [0,K)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)


def sample_token(
    logits: Array,
    key: Array,
    temperature: Array | float = 0.7,
    top_p: Array | float = 0.95,
    greedy: Optional[bool] = None,
    top_k: int = 64,
) -> Array:
    """Temperature/top-p sample with the reference's greedy cutoff.

    `greedy` must be a Python bool (trace-time branch) when given;
    otherwise temperature < 1e-6 selects argmax via lax.cond-free
    select (both branches are cheap).

    top_k (static) bounds the nucleus prefilter; 0 = exact full-vocab
    top-p (the reference's sample_top_p_from_prob semantics). The
    prefilter is an approximation only when the nucleus needs more than
    top_k tokens (flat distributions / top_p near 1) — expose it via
    GenerationConfig.top_k when that matters.
    """
    logits = logits.astype(jnp.float32)
    argmax = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy is True:
        return argmax
    sampled = sample_top_p(logits, key, temperature, top_p, top_k=top_k)
    if greedy is False:
        return sampled
    t = jnp.asarray(temperature, jnp.float32)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (logits.shape[0],))
    return jnp.where(t < 1e-6, argmax, sampled)


def sample_token_perslot(
    logits: Array,
    keys: Array,
    temperature: Array,
    top_p: Array,
    top_k: int = 64,
) -> Array:
    """Per-slot-key sampling for the continuous-batching decode step.

    keys: [B] PRNG keys (one per slot). Each slot draws from its OWN
    key stream, so a request's sampling is reproducible from its seed
    regardless of which other requests share the batch (the reference
    is batch-1 so gets this for free; llm_chat.cc:963-975).
    """
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (logits.shape[0],)
    )
    top_p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (logits.shape[0],))

    def one(lg, k, t, p):
        return sample_token(lg[None], k, t[None], p[None], top_k=top_k)[0]

    return jax.vmap(one)(logits, keys, temperature, top_p)
