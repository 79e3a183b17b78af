"""Prefill roofline instrument (round-4 verdict item 8).

Decode got per-shape streaming ceilings (scripts/ceiling.py); prefill
TTFT was tuned by A/B with no efficiency target, so nothing says
whether ctx-512 at ~72 ms is 50% or 90% of what the chip allows. This
script names the binding resource per ctx bucket:

- times the FULL prefill (bench.py's TTFT protocol minus the RTT
  correction: wall of prefill dispatch + argmax readback, best of N);
- counts the model's matmul FLOPs and the weight bytes the kernels
  actually stream (each weight block is re-read once per m-tile: bytes
  x ceil(m / bm) with bm from the tuned table the run resolves);
- probes the SAME-SESSION MXU rate (large bf16 matmul, on-device loop)
  and HBM rate (scripts/ceiling.py probe), so the fractions are
  against what the chip gives this session, not spec;
- prints per-ctx: achieved TFLOP/s, achieved weight GB/s, fraction of
  each probe, and which resource binds (max fraction >= the other).

Analog in the reference: per-kernel time_evaluator tables
(reference/tests/evaluate.py:59-79) — per-op efficiency made visible.

    python scripts/prefill_roofline.py [--quant q4bf16] [--ctxs 512,1024,2048]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from ceiling import hbm_probe  # noqa: E402


def mxu_probe(d=4096, reps=64) -> float:
    """Same-session bf16 MXU rate (FLOP/s) on a [d,d]x[d,d] chain."""
    a = jnp.ones((d, d), jnp.bfloat16)
    b = jnp.eye(d, dtype=jnp.bfloat16)

    @jax.jit
    def loop(a, b, n):
        def body(_, x):
            return jax.lax.dot(x, b, precision=None,
                               preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, a)

    float(loop(a, b, 2)[0, 0])  # compile + warm
    t0 = time.perf_counter()
    float(loop(a, b, 2)[0, 0])
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(a, b, 2 + reps)[0, 0])
    t_long = time.perf_counter() - t0
    dt = (t_long - t_short) / reps
    return 2 * d * d * d / dt if dt > 0 else float("nan")


def model_costs(cfg, spec, m: int, table: dict):
    """(matmul_flops, weight_bytes_streamed, attn_flops) for one prefill.

    Weight bytes = stored bytes x the number of m-tiles (the pairs
    kernels re-stream every weight block once per m-tile; bm comes from
    the same tuned entries the timed run resolves).
    """
    d, f, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    V = cfg.vocab_size
    # (k, n) per layer matmul, padded the way the loaders pad
    g = spec.group_size

    def pad(k):
        return -(-k // g) * g

    shapes = [(d, 3 * d), (d, d), (d, 2 * f), (f, d)]
    flops = sum(2 * m * k * n for k, n in shapes) * L
    bytes_w = 0
    for k, n in shapes:
        kp = pad(k)
        kw = kp // spec.elems_per_word
        data_b = kw * n * 4
        scale_b = (kp // g) * n * 2 * (1 if spec.sym else 2)
        key = f"{m}:{kw}:{n}"
        ent = (table.get(f"qs:{key}") or table.get(f"hs:{key}")
               or table.get(f"int:{key}") or table.get(key))
        if isinstance(ent, dict):
            ent = ent.get("blocks")
        bm = ent[0] if ent and len(ent) == 3 else min(m, 512)
        bytes_w += (data_b + scale_b) * (-(-m // bm)) * L
    # lm head: last token only (last_only=True) -> m=1
    flops += 2 * 1 * d * V
    bytes_w += pad(d) // spec.elems_per_word * V * 4
    # attention: qk + av, causal ~ m^2/2 each, x heads x head_dim
    attn_flops = 2 * 2 * (m * m // 2) * cfg.head_dim * cfg.num_heads * L
    return flops, bytes_w, attn_flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="q4bf16")
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--ctxs", default="512,1024,2048")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from mlc_llm_tpu.models import (
        forward, get_config, init_kv_cache, init_random_params,
    )
    # the package __init__ re-exports a FUNCTION named dequant_matmul
    # that shadows the submodule — resolve the module explicitly
    import importlib

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad
    from mlc_llm_tpu.quant.spec import resolve_spec

    cfg = get_config(args.model)
    spec = resolve_spec(args.quant)
    params = init_random_params(cfg, args.quant, seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x, params,
        is_leaf=lambda x: isinstance(x, _QT))
    table = dm._tuned_table()

    bw0 = hbm_probe()
    mxu0 = mxu_probe()
    print(json.dumps({"probe_hbm_gbps": round(bw0 / 1e9, 1),
                      "probe_mxu_tflops": round(mxu0 / 1e12, 1)}),
          flush=True)

    @partial(jax.jit, static_argnames=("attn_window",))
    def prefill(params, tokens, seq_lens, cache, attn_window=None):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=True, attn_window=attn_window)

    rows = []
    for ctx in (int(c) for c in args.ctxs.split(",")):
        p = jnp.asarray(np.random.default_rng(1).integers(
            10, 1000, size=(1, ctx)), jnp.int32)
        sl = jnp.full((1,), ctx, jnp.int32)
        cache = init_kv_cache(cfg, batch=1, max_len=max(2048, ctx))
        lg, cache = prefill(params, p, sl, cache, attn_window=ctx)
        float(jnp.asarray(jnp.argmax(lg, -1)).reshape(-1)[0])
        best = None
        for _ in range(args.reps):
            cache = init_kv_cache(cfg, batch=1, max_len=max(2048, ctx))
            t0 = time.perf_counter()
            lg, cache = prefill(params, p, sl, cache, attn_window=ctx)
            float(jnp.asarray(jnp.argmax(lg, -1)).reshape(-1)[0])
            d = time.perf_counter() - t0
            best = d if best is None or d < best else best
        del cache
        flops, bytes_w, attn_flops = model_costs(cfg, spec, ctx, table)
        tf = (flops + attn_flops) / best / 1e12
        gbps = bytes_w / best / 1e9
        frac_mxu = tf * 1e12 / mxu0
        frac_hbm = gbps * 1e9 / bw0
        rows.append({
            "ctx": ctx, "ms": round(best * 1e3, 1),
            "matmul_tflops": round(tf, 1),
            "weight_gbps": round(gbps, 1),
            "frac_of_mxu_probe": round(frac_mxu, 3),
            "frac_of_hbm_probe": round(frac_hbm, 3),
            # when neither MXU nor HBM fraction is high, the remaining
            # per-element dequant/bit-assembly work on the VPU is the
            # suspected binder (same conclusion as decode's round-5
            # ceiling work) — name it rather than crowning a false king
            "binds": ("vpu-dequant (suspected)"
                      if max(frac_mxu, frac_hbm) < 0.6
                      else ("mxu" if frac_mxu >= frac_hbm else "hbm")),
        })
        print(json.dumps(rows[-1]), flush=True)

    bw1 = hbm_probe()
    print(json.dumps({"prefill_roofline": rows,
                      "probe_hbm_gbps": [round(bw0 / 1e9, 1),
                                         round(bw1 / 1e9, 1)],
                      "probe_mxu_tflops": round(mxu0 / 1e12, 1),
                      "quant": args.quant}))


if __name__ == "__main__":
    main()
