"""Trimmed stacked sweep of the vicuna-7b decode shapes.

Each candidate costs minutes of tunnel compile, so this sweeps only the
configs the (noisy) isolated probes flagged as promising, plus the
currently-shipped entry as the baseline. Shapes are ordered by
potential step-time gain (bytes x bandwidth deficit vs the 770 GB/s
chip ceiling, round-2 per-shape profile):

  w_down 831 MB/step @624 -> up to 0.25 ms
  qkv    906 MB/step @~700 -> 0.12 ms
  w_in  1662 MB/step @719 -> 0.15 ms
  wo     302 MB/step @588 -> 0.12 ms
  lm      75 MB/step @624 -> 0.02 ms

Persists tuned_blocks.json after every shape.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mlc_llm_tpu.tune import TABLE_PATH, tune_shapes  # noqa: E402

# (k, n) -> candidate (bkw, bn) list; first entry = shipped baseline
PLAN = [
    ((11008, 4096), [(1408, 512), (1408, 256), (352, 512)]),
    ((4096, 12288), [(512, 1024), (256, 384), (512, 384), (256, 1024)]),
    ((4096, 22016), [(512, 1024), (256, 1024), (512, 512)]),
    ((4096, 4096), [(512, 512), (128, 1024), (256, 256), (128, 256)]),
    ((4096, 32000), [(512, 1024), (256, 1024), (512, 512)]),
]


def main():
    for kn, cands in PLAN:
        print(f"=== shape {kn} cands={cands}", flush=True)
        table = tune_shapes([kn], "q4bf16", ms=(1,), stacked=True,
                            cands_override=cands)
        existing = {}
        if os.path.exists(TABLE_PATH):
            with open(TABLE_PATH) as f:
                existing = json.load(f)
        existing.update(table)
        with open(TABLE_PATH, "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
        print(f"wrote {list(table)}", flush=True)


if __name__ == "__main__":
    main()
