"""Interleaved A/B of prefill block tables on the full ctx-512/1024
prefill (TTFT proxy), vicuna-7b q4bf16 (hsplit default).

    python scripts/prefill_ab.py tableA.json tableB.json [--visits 2]

Same discipline as scripts/table_ab.py: visits interleave, each visit
warms before timing, per-visit walls reported.
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


def _setup(quant="q4bf16"):
    from mlc_llm_tpu.models import get_config, init_random_params
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    cfg = get_config("vicuna-v1-7b")
    params = init_random_params(cfg, quant, seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x, params,
        is_leaf=lambda x: isinstance(x, _QT))
    _STATE.update(cfg=cfg, params=params)


def run_visit(table_path, ctxs=(512, 1024)):
    os.environ["MLC_TUNED_BLOCKS"] = table_path
    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
    dm._TUNED = None
    for fn in (dm._dequant_matmul_2d, dm._dequant_matmul_gp_2d,
               dm._dequant_matmul_gp3_2d, dm._dequant_matmul_stacked_2d,
               dm._dequant_matmul_stacked_generic_2d):
        fn.clear_cache()
    from mlc_llm_tpu.models import forward, init_kv_cache

    cfg, params = _STATE["cfg"], _STATE["params"]

    @partial(jax.jit, static_argnames=("attn_window",))
    def prefill(params, tokens, seq_lens, cache, attn_window=None):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=True, attn_window=attn_window)

    out = {}
    for ctx in ctxs:
        p = jnp.asarray(np.random.default_rng(1).integers(
            10, 1000, size=(1, ctx)), jnp.int32)
        sl = jnp.full((1,), ctx, jnp.int32)
        c = init_kv_cache(cfg, batch=1, max_len=2048)
        lg, c = prefill(params, p, sl, c, attn_window=ctx)  # compile
        float(jnp.asarray(jnp.argmax(lg, -1)).reshape(-1)[0])
        best = None
        for _ in range(3):
            c = init_kv_cache(cfg, batch=1, max_len=2048)
            t0 = time.perf_counter()
            lg, c = prefill(params, p, sl, c, attn_window=ctx)
            float(jnp.asarray(jnp.argmax(lg, -1)).reshape(-1)[0])
            d = time.perf_counter() - t0
            if best is None or d < best:
                best = d
        out[ctx] = round(best * 1e3, 1)
        del c
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tables", nargs="+")
    ap.add_argument("--visits", type=int, default=2)
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--ctxs", default="512,1024")
    args = ap.parse_args()
    _setup(args.quantization)
    ctxs = tuple(int(c) for c in args.ctxs.split(","))
    res = {p: [] for p in args.tables}
    for v in range(args.visits):
        for p in args.tables:
            r = run_visit(p, ctxs=ctxs)
            res[p].append(r)
            print(json.dumps({"visit": v, "table": p, "prefill_ms": r}),
                  flush=True)
    print(json.dumps({"prefill_ab": res}))


if __name__ == "__main__":
    main()
