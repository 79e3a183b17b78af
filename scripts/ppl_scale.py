"""Perplexity-delta evaluation at dolly-v2-3b scale (BASELINE.md gate).

This environment has zero network egress, so no trained checkpoint can
be fetched; the quantization-quality pipeline is instead exercised at
the REAL dolly-v2-3b architecture/size with seeded random weights: the
same underlying fp weights are quantized to each format (same seed =>
same normals stream), so the measured ppl deltas isolate quantization
error through the full 32-layer 2560-hidden model.

  python scripts/ppl_scale.py            # TPU (bf16 baseline + formats)
  python scripts/ppl_scale.py --model vicuna-v1-7b
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mlc_llm_tpu  # noqa: F401
from mlc_llm_tpu.models import get_config, init_random_params
from mlc_llm_tpu.ppl import perplexity


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dolly-v2-3b")
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--ntok", type=int, default=1536)
    ap.add_argument(
        "--presets", default="bf16,q4bf16,q4bf16_sym,q3bf16,q3bf16_s16,fp4bf16,q8bf16"
    )
    args = ap.parse_args()

    cfg = get_config(args.model)
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, args.ntok, dtype=np.int32
    )
    print(f"model={args.model} backend={jax.default_backend()} "
          f"window={args.window}", flush=True)

    results = {}
    for preset in args.presets.split(","):
        t0 = time.perf_counter()
        params = init_random_params(cfg, preset, seed=0)
        res = perplexity(
            params, cfg, toks, window=args.window, stride=args.stride
        )
        del params
        results[preset] = res["perplexity"]
        base = results.get("bf16")
        delta = (
            f" dlog={np.log(res['perplexity'] / base):+.4f}" if base else ""
        )
        print(f"  {preset:12s} ppl={res['perplexity']:10.3f}{delta} "
              f"({res['tokens_scored']} toks, {time.perf_counter()-t0:.0f}s)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
