"""Interleaved b8 long-window A/B: slot-bf16 vs slot-int8 vs paged-int8.

Round-4 verdict item 2: int8 KV at batch 8 LOST on the slot path
(the einsum materializes the dequantized window: int8 read + bf16
write + bf16 re-read > reading bf16 directly), while the paged flash
kernel dequantizes int8 IN the attention dots at [ps] granularity.
This measures all three paths interleaved in one process at window
1024+ (where KV bytes dominate), deciding the engine's kv_layout
"auto" routing rule and bench.py's batch8_int8kv field.

    python scripts/b8_int8_ab.py [--visits 2] [--ctx 1024]
"""

import argparse
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--visits", type=int, default=2)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--steps", type=int, nargs=2, default=(8, 40))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mlc_llm_tpu.models import (
        forward, get_config, init_kv_cache, init_random_params,
    )
    from mlc_llm_tpu.models.paged_cache import (
        PageAllocator, init_paged_kv_cache,
    )
    from mlc_llm_tpu.ops.sampling import sample_token
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    cfg = get_config("vicuna-v1-7b")
    B, ctx = 8, args.ctx
    n_short, n_long = args.steps
    if args.cpu:
        cfg = cfg.replace(num_layers=2)
        B, ctx, n_short, n_long = 2, 32, 2, 6
    window = ctx + n_long + 88  # static decode window bucket
    ps = 128
    window = -(-window // ps) * ps
    params = init_random_params(cfg, "q4bf16", seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x, params,
        is_leaf=lambda x: isinstance(x, _QT))

    @partial(jax.jit, donate_argnames=("cache",),
             static_argnames=("attn_window",))
    def prefill(params, tokens, seq_lens, cache, attn_window=None):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=True, attn_window=attn_window)

    @partial(jax.jit, donate_argnames=("cache",), static_argnames=("win",))
    def decode_n(params, tok, cache, key, n, win=None):
        def body(_, carry):
            tok, cache, key = carry
            logits, cache = forward(params, cfg, tok, cache,
                                    last_only=True, attn_window=win)
            key, sub = jax.random.split(key)
            nxt = sample_token(logits, sub, 0.7, 0.95)
            return (nxt[:, None], cache, key)
        tok, cache, key = jax.lax.fori_loop(0, n, body, (tok, cache, key))
        return tok, cache

    prompt = jnp.asarray(np.random.default_rng(0).integers(
        10, 1000, size=(B, ctx)), jnp.int32)
    lens = jnp.full((B,), ctx, jnp.int32)
    key = jax.random.PRNGKey(0)
    ppsl = window // ps

    def mk_cache(kind):
        dt = jnp.int8 if "int8" in kind else jnp.bfloat16
        if kind.startswith("paged"):
            paged = init_paged_kv_cache(
                cfg, B, num_pages=B * ppsl + 1, page_size=ps,
                max_pages_per_slot=ppsl, dtype=dt)
            alloc = PageAllocator(paged.num_pages)
            table = np.zeros(paged.page_table.shape, np.int32)
            for b in range(B):
                pg = alloc.alloc(ppsl)
                table[b, :len(pg)] = pg
            return dataclasses.replace(paged,
                                       page_table=jnp.asarray(table))
        return init_kv_cache(cfg, B, window, dt)

    def run_leg(kind):
        cache = mk_cache(kind)
        logits, cache = prefill(params, prompt, lens, cache,
                                attn_window=ctx)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]

        def timed(n):
            nonlocal cache
            t0 = time.perf_counter()
            out, cache2 = decode_n(params, tok, cache, key, n, win=window)
            cache = cache2
            float(jnp.asarray(out).reshape(-1)[0])
            return time.perf_counter() - t0

        timed(2)  # compile + warm
        best = None
        for _ in range(2):
            d = (timed(n_long) - timed(n_short)) / (n_long - n_short)
            if d > 0 and (best is None or d < best):
                best = d
        del cache
        return best

    kinds = ("slot_bf16", "slot_int8", "paged_int8")
    out = {k: [] for k in kinds}
    for v in range(args.visits):
        for kind in kinds:
            d = run_leg(kind)
            tok_s = round(B / d, 1) if d else None
            out[kind].append(tok_s)
            print(json.dumps({"visit": v, "kind": kind,
                              "tok_s": tok_s}), flush=True)
    summary = {k: {"tok_s_per_visit": v,
                   "best": max([x for x in v if x], default=None)}
               for k, v in out.items()}
    b_bf, b_pi = summary["slot_bf16"]["best"], summary["paged_int8"]["best"]
    if b_bf and b_pi:
        summary["paged_int8_over_slot_bf16"] = round(b_pi / b_bf, 3)
    print(json.dumps({"b8_int8_ab": summary, "ctx": ctx,
                      "window": window}), flush=True)


if __name__ == "__main__":
    main()
