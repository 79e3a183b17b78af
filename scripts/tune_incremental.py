"""Per-shape incremental gp sweep: persists tuned_blocks.json after EVERY
shape so a killed session keeps its progress (the round-3 queue's full
sweep died mid-run and wrote nothing).

    python scripts/tune_incremental.py [--model vicuna-v1-7b] [--m 1]

Shapes are ordered by expected win (the partial round-3 log showed the
short-n wo shape jumping 588 -> 716 GB/s with k-stepped blocks).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mlc_llm_tpu.tune import TABLE_PATH, model_shapes, tune_shapes  # noqa: E402
from mlc_llm_tpu.models import get_config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--m", type=int, action="append", default=None)
    ap.add_argument("--stacked", action="store_true")
    ap.add_argument("--max-bytes", type=int, default=None,
                    help="only tune shapes whose packed size is below "
                         "this (e.g. re-run small shapes stacked)")
    args = ap.parse_args()

    cfg = get_config(args.model)
    ms = tuple(args.m) if args.m else (1,)
    shapes = model_shapes(cfg)
    # short-n shapes first: they are the known laggards (VERDICT #2a)
    shapes.sort(key=lambda kn: kn[1])
    for kn in shapes:
        if args.max_bytes is not None:
            k, n = kn
            approx = k * n // 2 + k * n // 16  # q4 data + bf16 scales
            if approx > args.max_bytes:
                print(f"=== shape {kn}: skipped (> max-bytes)", flush=True)
                continue
        print(f"=== shape {kn}", flush=True)
        table = tune_shapes([kn], args.quantization, ms,
                            stacked=args.stacked)
        existing = {}
        if os.path.exists(TABLE_PATH):
            with open(TABLE_PATH) as f:
                existing = json.load(f)
        existing.update(table)
        with open(TABLE_PATH, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
        print(f"wrote {list(table)} -> {TABLE_PATH}", flush=True)


if __name__ == "__main__":
    main()
