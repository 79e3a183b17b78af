"""Same-process A/B of tuned-block tables on the FULL b1 decode step.

The ultimate arbiter for block picks: microbenchmarks (even stacked
ones) measure a kernel alone; this times the complete vicuna-7b q4bf16
decode step (bench.py's exact protocol) once per table file, in ONE
process so chip contention can't skew the comparison.

    python scripts/table_ab.py old.json new.json [more.json ...]

Each leg clears the Pallas jit caches (block sizes are read at trace
time, not static args) — expect ~2-4 min of tunnel compile per leg.
"""
import importlib
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_leg(table_path: str, n_short=8, n_long=72,
            model="vicuna-v1-7b", tiny=False) -> float:
    os.environ["MLC_TUNED_BLOCKS"] = table_path
    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
    dm._TUNED = None
    for fn in (dm._dequant_matmul_2d, dm._dequant_matmul_gp_2d,
               dm._dequant_matmul_gp3_2d, dm._dequant_matmul_stacked_2d,
               dm._dequant_matmul_stacked_generic_2d):
        fn.clear_cache()

    from mlc_llm_tpu.models import (
        forward, get_config, init_kv_cache, init_random_params,
    )
    from mlc_llm_tpu.ops.sampling import sample_token
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    cfg = get_config(model)
    if tiny:
        cfg = cfg.replace(num_layers=2, max_seq_len=256)
        n_short, n_long = 2, 6
    context_len = 128
    params = init_random_params(cfg, "q4bf16", seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x, params,
        is_leaf=lambda x: isinstance(x, _QT),
    )
    cache = init_kv_cache(cfg, batch=1, max_len=min(cfg.max_seq_len, 2048))

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

    logits, cache = forward(
        params, cfg,
        jnp.asarray(np.random.default_rng(0).integers(
            10, 1000, size=(1, context_len)), jnp.int32),
        cache, seq_lens=jnp.full((1,), context_len, jnp.int32),
        last_only=True, attn_window=context_len)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    key = jax.random.PRNGKey(0)

    def timed(n):
        nonlocal cache
        t0 = time.perf_counter()
        out_tok, cache = decode_n(params, tok, cache, key, n,
                                  window=min(256, cfg.max_seq_len))
        float(jnp.asarray(out_tok).reshape(-1)[0])
        return time.perf_counter() - t0

    timed(2)  # compile
    best = float("inf")
    for _ in range(3):
        d = (timed(n_long) - timed(n_short)) / (n_long - n_short)
        if d > 0:
            best = min(best, d)
    del params, cache
    return best


def main():
    tiny = "--tiny" in sys.argv
    tables = [a for a in sys.argv[1:] if a != "--tiny"]
    assert len(tables) >= 2, "need at least two table files"
    out = {}
    for path in tables:
        t0 = time.perf_counter()
        per_step = run_leg(path, tiny=tiny)
        out[path] = {
            "tok_s": round(1.0 / per_step, 2) if per_step > 0 else None,
            "leg_wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps({path: out[path]}), flush=True)
    print(json.dumps({"table_ab": out}))


if __name__ == "__main__":
    main()
