"""Paged vs slot-contiguous decode throughput (VERDICT r1 gate:
paged within 10% of slot-contiguous at batch 8).

One process, same methodology as bench.py (on-device fori_loop,
long-minus-short).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mlc_llm_tpu  # noqa: F401
from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
from mlc_llm_tpu.models.paged_cache import PageAllocator, init_paged_kv_cache
from mlc_llm_tpu.ops.sampling import sample_token
from mlc_llm_tpu.quant.groupwise import QuantizedTensor, pad_quantized_groups

B = int(os.environ.get("PB_BATCH", "8"))
CTX = 128
WINDOW = 256
PS = int(os.environ.get("PB_PS", "128"))

cfg = get_config("vicuna-v1-7b")
params = init_random_params(cfg, "q4bf16", seed=0, fabricate=True)
params = jax.tree.map(
    lambda x: pad_quantized_groups(x) if isinstance(x, QuantizedTensor) else x,
    params, is_leaf=lambda x: isinstance(x, QuantizedTensor))


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("window",))
def decode_n(params, tok, cache, key, n, window=None):
    def body(_, carry):
        tok, cache, key = carry
        logits, cache = forward(params, cfg, tok, cache, last_only=True,
                                attn_window=window)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, 0.7, 0.95)
        return (nxt[:, None], cache, key)

    tok, cache, key = jax.lax.fori_loop(0, n, body, (tok, cache, key))
    return tok, cache


@partial(jax.jit, donate_argnames=("cache",))
def prefill(params, tokens, seq_lens, cache):
    return forward(params, cfg, tokens, cache, seq_lens=seq_lens, last_only=True)


def rb(x):
    return float(jnp.asarray(x).reshape(-1)[0])


@jax.jit
def decode_logits(params, tok, cache):
    logits, cache = forward(params, cfg, tok, cache, last_only=True,
                            attn_window=WINDOW)
    return logits, cache


def check_parity(slot_cache, paged_cache):
    """Slot-contiguous (XLA einsum attention) vs paged (flash kernel)
    decode logits on identical state — the on-chip numerics check for
    the substrate paged-attention kernel (CPU tests mock it)."""
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(10, 1000, (B, CTX)), jnp.int32)
    lens = jnp.full((B,), CTX, jnp.int32)
    ls, slot_cache = prefill(params, prompt, lens, slot_cache)
    lp, paged_cache = prefill(params, prompt, lens, paged_cache)
    tok = jnp.argmax(ls, -1).astype(jnp.int32)[:, None]
    ls2, _ = decode_logits(params, tok, slot_cache)
    lp2, _ = decode_logits(params, tok, paged_cache)
    a, b = np.asarray(ls2, np.float32), np.asarray(lp2, np.float32)
    amax = np.argmax(a, -1), np.argmax(b, -1)
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    print(f"decode logits parity: max rel diff {rel:.2e}, "
          f"argmax match {np.mean(amax[0] == amax[1]):.2f}", flush=True)
    assert rel < 5e-2 and np.all(amax[0] == amax[1]), "paged parity FAILED"


def run(cache, label):
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(10, 1000, (B, CTX)), jnp.int32)
    lens = jnp.full((B,), CTX, jnp.int32)
    logits, cache = prefill(params, prompt, lens, cache)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    key = jax.random.PRNGKey(0)
    t = {}
    for n in (2, 8, 72):
        t0 = time.perf_counter()
        tok2, cache = decode_n(params, tok, cache, key, n, window=WINDOW)
        rb(tok2)
        t[n] = time.perf_counter() - t0
    per = (t[72] - t[8]) / 64
    print(f"{label}: {per*1e3:.2f} ms/step -> {B/per:.1f} tok/s aggregate",
          flush=True)
    return per


import dataclasses


def make_paged():
    paged = init_paged_kv_cache(cfg, B, num_pages=B * (512 // PS) + 1,
                                page_size=PS, max_pages_per_slot=512 // PS)
    alloc = PageAllocator(paged.num_pages)
    table = np.zeros(paged.page_table.shape, np.int32)
    for b in range(B):
        pg = alloc.alloc(512 // PS)
        table[b, : len(pg)] = pg
    return dataclasses.replace(paged, page_table=jnp.asarray(table))


check_parity(init_kv_cache(cfg, batch=B, max_len=512), make_paged())

slot = init_kv_cache(cfg, batch=B, max_len=512)
per_slot = run(slot, f"slot-contiguous b{B}")
del slot

per_paged = run(make_paged(), f"paged b{B} ps{PS}")
print(f"paged/slot step ratio: {per_paged/per_slot:.3f} "
      f"(gate: <= 1.10)", flush=True)
