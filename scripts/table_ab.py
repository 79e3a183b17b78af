"""Same-process interleaved A/B of tuned-block tables on the FULL b1
decode step.

The ultimate arbiter for block picks: microbenchmarks (even stacked
ones) measure a kernel alone; this times the complete vicuna-7b q4bf16
decode step (bench.py's exact protocol) per table file, in ONE process
so chip contention can't skew the comparison.

    python scripts/table_ab.py old.json new.json [--visits 2] [--tiny]

Round-3 lesson (tpu_logs/table_ab.log): sequential legs are NOT enough —
the first leg paid 78.7 s of compile while the second hit the
persistent compile cache in 8.6 s, and the measured 6% "regression"
tracked that asymmetry, not the blocks. This version:

- visits the tables in an INTERLEAVED order (A, B, A, B, ...), so slow
  drift in chip contention hits both tables equally;
- warms (compiles + runs) each visit's executables BEFORE any timed
  call, and reports the warm time separately from the measurement;
- reports every visit's delta, the best, and the median — a decision
  needs the per-visit spread, not one number per table.

Block sizes are read at TRACE time (not jit static args), so each
visit clears the Pallas jit caches and re-traces; visits after the
first hit the persistent on-disk compile cache, keeping re-visit
warmup to seconds.
"""
import argparse
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

_STATE = {}


def _setup(model: str, tiny: bool, quant: str = "q4bf16"):
    from mlc_llm_tpu.models import get_config, init_random_params
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    cfg = get_config(model)
    if tiny:
        cfg = cfg.replace(num_layers=2, max_seq_len=256)
    params = init_random_params(cfg, quant, seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x, params,
        is_leaf=lambda x: isinstance(x, _QT),
    )
    _STATE.update(cfg=cfg, params=params)


def run_visit(table_path: str, n_short=8, n_long=72, tiny=False, batch=1):
    """One warmed visit: returns (per_step_seconds | None, warm_s)."""
    os.environ["MLC_TUNED_BLOCKS"] = table_path
    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
    dm._TUNED = None
    for fn in (dm._dequant_matmul_2d, dm._dequant_matmul_gp_2d,
               dm._dequant_matmul_gp3_2d, dm._dequant_matmul_stacked_2d,
               dm._dequant_matmul_stacked_generic_2d):
        fn.clear_cache()

    from mlc_llm_tpu.models import forward, init_kv_cache
    from mlc_llm_tpu.ops.sampling import sample_token

    cfg, params = _STATE["cfg"], _STATE["params"]
    if tiny:
        n_short, n_long = 2, 6
    context_len = 128
    # batch>1 shrinks the cache like bench.py's b8 section: a 2048-row
    # cache at b8 is 8.6 GB of KV next to 4.3 GB of weights and the
    # visit OOMs HBM (19.99/15.75 GB, tpu_logs/b8_table_ab_r5b.log)
    cache = init_kv_cache(cfg, batch=batch,
                          max_len=min(cfg.max_seq_len,
                                      2048 if batch == 1 else 512))

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

    t_warm0 = time.perf_counter()
    logits, cache = forward(
        params, cfg,
        jnp.asarray(np.random.default_rng(0).integers(
            10, 1000, size=(batch, context_len)), jnp.int32),
        cache, seq_lens=jnp.full((batch,), context_len, jnp.int32),
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

    timed(2)  # compile + warm (kept OUT of the measurement)
    warm_s = time.perf_counter() - t_warm0
    best = None
    for _ in range(2):
        d = (timed(n_long) - timed(n_short)) / (n_long - n_short)
        if d > 0 and (best is None or d < best):
            best = d
    del cache
    return best, warm_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tables", nargs="+", help="two or more table JSON files")
    ap.add_argument("--visits", type=int, default=2,
                    help="interleaved visits per table")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--batch", type=int, default=1,
                    help="decode batch (8 validates the m=8 entries)")
    args = ap.parse_args()
    assert len(args.tables) >= 2, "need at least two table files"

    _setup(args.model, args.tiny, args.quantization)
    deltas = {p: [] for p in args.tables}
    warms = {p: [] for p in args.tables}
    for v in range(args.visits):
        for path in args.tables:  # A, B, A, B, ...
            d, w = run_visit(path, tiny=args.tiny, batch=args.batch)
            deltas[path].append(d)
            warms[path].append(round(w, 1))
            print(json.dumps({"visit": v, "table": path,
                              "tok_s": round(args.batch / d, 2) if d else None,
                              "warm_s": round(w, 1)}), flush=True)
    out = {}
    for path in args.tables:
        ds = [d for d in deltas[path] if d]
        b = args.batch
        out[path] = {
            "tok_s_best": round(b / min(ds), 2) if ds else None,
            "tok_s_median": round(b / sorted(ds)[len(ds) // 2], 2) if ds else None,
            "tok_s_per_visit": [round(b / d, 2) if d else None
                                for d in deltas[path]],
            "warm_s_per_visit": warms[path],
        }
    print(json.dumps({"table_ab": out}))


if __name__ == "__main__":
    main()
