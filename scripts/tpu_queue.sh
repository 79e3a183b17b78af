#!/bin/bash
# Round-3 on-chip capture queue. Run ONCE when the TPU tunnel is back:
#
#   bash scripts/tpu_queue.sh
#
# Sequential (NEVER two TPU processes at once), each step under
# `timeout`, idempotent (skips steps whose log already has content).
# Results land in tpu_logs/; interpret them with docs/PERF.md's
# methodology notes. Order matters: benches FIRST (capture the current
# state), sweeps after (they rewrite tuned_blocks.json and would change
# what the benches measure).
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
  # skip only on a CLEAN completion: bench.py exits 0 even on a
  # structured failure (its JSON then carries an "error" field), so a
  # failed capture must NOT be marked done
  if [ -s "$log" ] && grep -q "^DONE$" "$log" \
      && ! grep -q '"error"' "$log"; then
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

# 1) headline bench with the new routing (also writes ctx-2048 TTFT)
step bench_r03 2400 python bench.py

# 2) ctx-2048 TTFT A/B of the kernel-routing bound (verdict #3)
step ttft_m1024 1800 python scripts/ttft_ab.py --max-m 1024
step ttft_m2048 1800 python scripts/ttft_ab.py --max-m 2048

# 3) RedPajama-3B recapture with the fixed decode window (verdict #4)
step redpajama 2400 python scripts/bench_model.py \
  --model RedPajama-INCITE-Chat-3B-v1 --quantization q4bf16 --ctx 128

# 4) decode profile: where the remaining ms/step sits (verdict #2)
step profile 2400 python scripts/profile_decode.py

# 5) speculative decoding on chip (host-driven; fewer round trips AND
#    fewer weight reads per emitted token)
step spec_bench 1800 python scripts/spec_bench.py

# 6) gp k-step sweep with the validation protocol (verdicts #2a/#4).
#    Writes tuned_blocks.json — run LAST, then re-bench to see effect.
step tune_gp 3600 python -m mlc_llm_tpu.tune --model vicuna-v1-7b --m 1
step bench_post_tune 2400 python bench.py

echo "queue complete; logs in tpu_logs/"
