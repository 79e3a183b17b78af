"""TTFT vs context length, A/B over the prefill kernel-routing bound.

Round-2 verdict #3: the fused-kernel route stopped at m=1024, so a
ctx-2048 prefill fell back to XLA full-dequant (the pattern measured as
a 10x TTFT cliff at ctx 512 in round 1). Round 3 lifts the bound to
2048; this script measures the cliff directly:

  python scripts/ttft_ab.py --max-m 1024   # old routing
  python scripts/ttft_ab.py --max-m 2048   # new routing

Prints one JSON line: {"max_m": N, "ttft_ms": {"512": .., "1024": ..,
"2048": ..}, "rtt_ms": ..}. Run the two invocations sequentially
(NEVER two TPU processes at once). Methodology matches bench.py: RTT
measured with a trivial program and subtracted; prefill+first-token
per bucket, compile excluded by a warmup call.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-m", type=int, default=None)
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--quant", default="q4bf16")
    ap.add_argument("--ctx", type=int, nargs="*", default=[512, 1024, 2048])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.max_m is not None:
        os.environ["MLC_PREFILL_KERNEL_MAX_M"] = str(args.max_m)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from mlc_llm_tpu.models import (
        forward,
        get_config,
        init_kv_cache,
        init_random_params,
    )
    from mlc_llm_tpu.ops.sampling import sample_token
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    cfg = get_config(args.model)
    if args.cpu:
        cfg = cfg.replace(num_layers=2)
    params = init_random_params(cfg, args.quant, seed=0, fabricate=True)
    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x,
        params, is_leaf=lambda x: isinstance(x, _QT),
    )
    max_len = min(cfg.max_seq_len, 2048)

    def _readback(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    triv = jax.jit(lambda x: x + 1)
    _readback(triv(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(3):
        _readback(triv(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / 3

    @partial(jax.jit, static_argnames=("attn_window", "prefill_flash"))
    def prefill(params, tokens, seq_lens, cache, attn_window=None,
                prefill_flash=False):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=True, attn_window=attn_window,
                       prefill_flash=prefill_flash)

    ttft = {}
    for ctx in args.ctx:
        if ctx > max_len:
            continue
        p = jnp.asarray(
            np.random.default_rng(1).integers(10, 1000, size=(1, ctx)),
            jnp.int32,
        )
        sl = jnp.full((1,), ctx, jnp.int32)
        c = init_kv_cache(cfg, batch=1, max_len=max_len)
        lg, c = prefill(params, p, sl, c, attn_window=ctx,
                        prefill_flash=True)  # compile
        _readback(jnp.argmax(lg, -1))
        best = None
        for _ in range(3):
            c = init_kv_cache(cfg, batch=1, max_len=max_len)
            t0 = time.perf_counter()
            lg, c = prefill(params, p, sl, c, attn_window=ctx,
                            prefill_flash=True)
            f = sample_token(lg, jax.random.PRNGKey(1), 0.0, 1.0,
                             greedy=True)
            _readback(f)
            dt = (time.perf_counter() - t0 - rtt) * 1e3
            best = dt if best is None else min(best, dt)
        ttft[str(ctx)] = round(best, 1)
        del c

    print(json.dumps({
        "max_m": args.max_m,
        "backend": jax.default_backend(),
        "ttft_ms": ttft,
        "rtt_ms": round(rtt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
