#!/bin/bash
# Round-5 on-chip capture queue. Sequential (NEVER two TPU processes at
# once), each step under `timeout`, idempotent (skips steps whose log
# already ends in DONE without an "error" field). Results in tpu_logs/;
# interpret with docs/PERF.md methodology notes.
#
#   bash scripts/tpu_queue_r5.sh chunk1   # capture current state
#   bash scripts/tpu_queue_r5.sh chunk2   # tuning sweeps + re-bench
#   bash scripts/tpu_queue_r5.sh chunk3   # instruments
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_logs

probe() {
  timeout 300 python -c "import jax; print(jax.default_backend())" \
    >tpu_logs/probe.txt 2>&1
}

step() {  # step <name> <timeout-s> <cmd...>
  local name="$1" t="$2"; shift 2
  local log="tpu_logs/${name}.log"
  if [ -s "$log" ] && grep -q "^DONE$" "$log" && ! grep -q '"error"' "$log"; then
    echo "== $name: already done, skipping"
    return 0
  fi
  echo "== $name: $*"
  { timeout "$t" "$@" && echo DONE; } >"$log" 2>&1
  tail -2 "$log"
}

if ! probe; then
  echo "TPU backend unreachable (tpu_logs/probe.txt); aborting"
  exit 1
fi
echo "backend: $(tail -1 tpu_logs/probe.txt)"

chunk="${1:-chunk1}"

case "$chunk" in
chunk1)
  # 1) headline driver-protocol bench (q4bf16 now defaults to qsplit +
  #    gpq tuned entries; also captures the new serving-percentile and
  #    batch8-int8kv sections)
  # 5400s: a cold persistent compile cache costs ~25 min of Mosaic
  # recompiles on top of the ~20 min of measurements
  step bench_r5a 5400 python bench.py
  # 2) step decomposition under the qsplit kernels: where the remaining
  #    ms/step sits (feeds the next perf lever)
  step profile_r5 2400 python scripts/profile_decode.py
  # 3) serving: adaptive multi-step + overlapped admission, one process
  #    per mode. Done-criteria (VERDICT #3/#4): auto p50 TTFT @2rps
  #    within 10% of single-step AND auto saturated within 10% of K=8;
  #    saturated >= 500 tok/s or transport-floor evidence.
  step serve_r5_auto 3600 python scripts/serve_bench.py \
    --multi-step auto:8 --ahead 2 --rates 2 8 64
  step serve_r5_ms8 2700 python scripts/serve_bench.py \
    --multi-step 8 --ahead 2 --rates 64
  step serve_r5_single 2700 python scripts/serve_bench.py \
    --ahead 2 --rates 2
  ;;
chunk2)
  # tuning sweeps with the validation protocol: replace every legacy
  # list-form entry with provenance-carrying entries on the layouts the
  # runtime actually routes (VERDICT #7). Sweeps rewrite
  # tuned_blocks.json -> re-bench afterwards.
  step tune_m8_r5 4800 python -m mlc_llm_tpu.tune --m 8 --stacked
  step tune_gp3_r5 4800 python -m mlc_llm_tpu.tune \
    --quantization q3bf16_s16 --m 1 --m 8 --stacked
  step tune_3b_r5 4800 python -m mlc_llm_tpu.tune \
    --model RedPajama-INCITE-Chat-3B-v1 --m 1 --stacked
  step bench_r5b 5400 python bench.py
  ;;
chunk3)
  # instruments: qsplit-era per-shape ceilings (updated step floor),
  # prefill roofline table (VERDICT #8), b8 int8 routing re-check
  step ceiling_r5 2700 python scripts/ceiling.py
  step prefill_roofline_r5 2400 python scripts/prefill_roofline.py
  step b8_int8_ab_r5 2400 python scripts/b8_int8_ab.py
  step redpajama_r5 2400 python scripts/bench_model.py \
    --model RedPajama-INCITE-Chat-3B-v1 --quantization q4bf16 --ctx 128
  ;;
*)
  echo "unknown chunk: $chunk"; exit 1;;
esac
echo "queue $chunk complete; logs in tpu_logs/"
