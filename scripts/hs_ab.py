"""Same-process A/B: two quantization presets (packing layouts) on the
full vicuna-7b decode step + ctx-512 prefill (TTFT proxy).

    python scripts/hs_ab.py                       # pair vs half-split
    python scripts/hs_ab.py q4bf16 q4bf16_qs      # hsplit vs qsplit
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_leg(preset: str, n_short=8, n_long=72):
    from mlc_llm_tpu.models import (
        forward, get_config, init_kv_cache, init_random_params,
    )
    from mlc_llm_tpu.ops.sampling import sample_token
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    cfg = get_config("vicuna-v1-7b")
    params = init_random_params(cfg, preset, seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x, params,
        is_leaf=lambda x: isinstance(x, _QT),
    )
    cache = init_kv_cache(cfg, batch=1, max_len=2048)

    @partial(jax.jit, donate_argnames=("cache",), static_argnames=("window",))
    def decode_n(params, tok, cache, key, n, window=None):
        def body(_, carry):
            tok, cache, key = carry
            logits, cache = forward(
                params, cfg, tok, cache, last_only=True, attn_window=window)
            key, sub = jax.random.split(key)
            nxt = sample_token(logits, sub, 0.7, 0.95)
            return (nxt[:, None], cache, key)
        tok, cache, key = jax.lax.fori_loop(0, n, body, (tok, cache, key))
        return tok, cache

    @partial(jax.jit, static_argnames=("attn_window",))
    def prefill(params, tokens, seq_lens, cache, attn_window=None):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=True, attn_window=attn_window)

    prompt = jnp.asarray(np.random.default_rng(0).integers(
        10, 1000, size=(1, 128)), jnp.int32)
    logits, cache = prefill(params, prompt, jnp.full((1,), 128, jnp.int32),
                            cache, attn_window=128)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    key = jax.random.PRNGKey(0)

    def timed(n):
        nonlocal cache
        t0 = time.perf_counter()
        out_tok, cache = decode_n(params, tok, cache, key, n, window=256)
        float(jnp.asarray(out_tok).reshape(-1)[0])
        return time.perf_counter() - t0

    timed(2)
    best = float("inf")
    for _ in range(3):
        d = (timed(n_long) - timed(n_short)) / (n_long - n_short)
        if d > 0:
            best = min(best, d)

    # ctx-512 prefill (pairs-kernel path) wall, RTT-uncorrected but
    # identical protocol per leg
    p512 = jnp.asarray(np.random.default_rng(1).integers(
        10, 1000, size=(1, 512)), jnp.int32)
    sl = jnp.full((1,), 512, jnp.int32)
    c2 = init_kv_cache(cfg, batch=1, max_len=2048)
    lg, c2 = prefill(params, p512, sl, c2, attn_window=512)  # compile
    float(jnp.asarray(jnp.argmax(lg, -1)).reshape(-1)[0])
    pf = []
    for _ in range(3):
        c2 = init_kv_cache(cfg, batch=1, max_len=2048)
        t0 = time.perf_counter()
        lg, c2 = prefill(params, p512, sl, c2, attn_window=512)
        float(jnp.asarray(jnp.argmax(lg, -1)).reshape(-1)[0])
        pf.append(time.perf_counter() - t0)
    del params, cache, c2
    return best, min(pf)


def main():
    # interleaved visits (A, B, A, B): single sequential legs measured a
    # phantom table regression in round 3 via compile-cache asymmetry
    # (see scripts/table_ab.py docstring); report per-visit spread
    presets = sys.argv[1:] or ["q4bf16", "q4bf16_hs"]
    out = {p: {"decode_tok_s": [], "prefill512_ms": [], "leg_wall_s": []}
           for p in presets}
    for visit in range(2):
        for preset in presets:
            t0 = time.perf_counter()
            per_step, pf = run_leg(preset)
            out[preset]["decode_tok_s"].append(
                round(1.0 / per_step, 2) if per_step else None)
            out[preset]["prefill512_ms"].append(round(pf * 1e3, 1))
            out[preset]["leg_wall_s"].append(
                round(time.perf_counter() - t0, 1))
            print(json.dumps({preset: {k: v[-1] for k, v in
                                       out[preset].items()}}), flush=True)
    for p, d in out.items():
        ds = [x for x in d["decode_tok_s"] if x]
        d["decode_best"] = max(ds) if ds else None
        d["prefill_best_ms"] = min(d["prefill512_ms"])
    print(json.dumps({"hs_ab": out}))


if __name__ == "__main__":
    main()
