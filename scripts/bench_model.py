"""Single-config decode benchmark for any registered model/preset.

Same methodology as bench.py (on-device fori_loop, long-minus-short,
best-of-3): the root bench.py stays pinned to the headline vicuna-7b
configs; this covers the remaining BASELINE.md config matrix (e.g.
config 2: RedPajama-INCITE-Chat-3B q4 single chip).

  python scripts/bench_model.py --model RedPajama-INCITE-Chat-3B-v1
"""

import argparse
import json
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
from mlc_llm_tpu.ops.sampling import sample_token
from mlc_llm_tpu.quant.groupwise import QuantizedTensor, pad_quantized_groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="RedPajama-INCITE-Chat-3B-v1")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--kv-dtype", default="bf16")
    args = ap.parse_args()

    cfg = get_config(args.model)
    params = init_random_params(cfg, args.quantization, seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: pad_quantized_groups(x) if isinstance(x, QuantizedTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    kv_dtype = {"bf16": jnp.bfloat16, "f16": jnp.float16, "int8": jnp.int8}[
        args.kv_dtype]
    # cache/window sized for prompt + every decode step of the run
    # (2 + 3*(8+72) = 242 steps): forward requires lengths + S <= window
    max_len = args.ctx + 256
    cache = init_kv_cache(cfg, batch=args.batch, max_len=max_len,
                          dtype=kv_dtype)

    @jax.jit
    def prefill(params, tokens, seq_lens, cache):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=True)

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

    B = args.batch
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        10, 1000, (B, args.ctx)), jnp.int32)
    lens = jnp.full((B,), args.ctx, jnp.int32)
    logits, cache = prefill(params, prompt, lens, cache)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    key = jax.random.PRNGKey(0)
    window = max_len

    def timed(n):
        nonlocal cache, tok
        t0 = time.perf_counter()
        tok2, cache = decode_n(params, tok, cache, key, n, window=window)
        float(jnp.asarray(tok2).reshape(-1)[0])
        return time.perf_counter() - t0

    timed(2)  # compile
    cands = []
    for _ in range(3):
        a, b = timed(8), timed(72)
        if b - a > 0:
            cands.append((b - a) / 64)
    wbytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(params) if hasattr(leaf, "dtype"))
    if not cands:
        # same rule as bench.py: a failed measurement is a structured
        # record, never a fabricated throughput
        print(json.dumps({
            "model": args.model, "quant": args.quantization, "batch": B,
            "decode_tok_s": None,
            "decode_error": "all long-minus-short deltas non-positive",
            "weight_bytes": wbytes,
        }))
        return
    per = min(cands)
    print(json.dumps({
        "model": args.model, "quant": args.quantization, "batch": B,
        "decode_tok_s": round(B / per, 2),
        "weight_bytes": wbytes,
        "pct_of_spec_roofline": round(100 * (1 / per) / (819e9 / wbytes), 1)
        if B == 1 else None,
    }))


if __name__ == "__main__":
    main()
