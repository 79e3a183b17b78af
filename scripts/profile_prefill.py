"""Profile one ctx-N prefill on the real chip and print a per-op table.

The round-5 prefill roofline (scripts/prefill_roofline.py) put ctx-512
prefill at ~43% of the MXU probe with "vpu-dequant (suspected)" as the
binding resource — but at bm=512 a weight block is dequantized ONCE per
(k, n) block, so the dequant ought to amortize. This names the ops.

Same trace-parsing methodology as profile_decode.py (docs/PERF.md):
jax.profiler over the tunnel, sum TPU-pid durations by op name.
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mlc_llm_tpu  # noqa: F401
from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
from mlc_llm_tpu.quant.groupwise import QuantizedTensor, pad_quantized_groups

CTX = int(os.environ.get("PROF_CTX", "512"))
QUANT = os.environ.get("PROF_QUANT", "q4bf16")
REPS = int(os.environ.get("PROF_REPS", "6"))

cfg = get_config("vicuna-v1-7b")
params = init_random_params(cfg, QUANT, seed=0, fabricate=True)
params = jax.tree.map(
    lambda x: pad_quantized_groups(x) if isinstance(x, QuantizedTensor) else x,
    params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
cache = init_kv_cache(cfg, batch=1, max_len=2048)


@partial(jax.jit, donate_argnames=("cache",),
         static_argnames=("attn_window", "prefill_flash"))
def prefill(params, tokens, seq_lens, cache, attn_window=None,
            prefill_flash=False):
    return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                   last_only=True, attn_window=attn_window,
                   prefill_flash=prefill_flash)


def rb(x):
    return float(jnp.asarray(x).reshape(-1)[0])


toks = jnp.asarray(
    np.random.default_rng(0).integers(10, 1000, size=(1, CTX)), jnp.int32)
sl = jnp.full((1,), CTX, jnp.int32)
logits, cache = prefill(params, toks, sl, cache, attn_window=CTX,
                        prefill_flash=True)
rb(logits)  # compile + warm

tdir = "/tmp/prefill_trace"
os.system(f"rm -rf {tdir}")
t0 = time.perf_counter()
with jax.profiler.trace(tdir):
    for _ in range(REPS):
        logits, cache = prefill(params, toks, sl, cache, attn_window=CTX,
                                prefill_flash=True)
    rb(logits)
wall = time.perf_counter() - t0
print(f"wall for {REPS} prefills at ctx {CTX}: {wall*1e3:.1f} ms "
      f"({wall/REPS*1e3:.2f} ms each)", flush=True)

traces = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
assert traces, "no trace written"
with gzip.open(traces[0], "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
tpu_pids = set()
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        nm = e.get("args", {}).get("name", "")
        if "TPU" in nm or "tpu" in nm:
            tpu_pids.add(e["pid"])

by_op = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
        name = e.get("name", "?")
        by_op[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]

rows = sorted(by_op.items(), key=lambda kv: -kv[1])
print(f"total device time: {total/1e3:.1f} ms over {REPS} prefills "
      f"=> {total/1e3/REPS:.3f} ms each")
print(f"{'op':60s} {'ms/call':>9s} {'calls':>7s} {'%':>6s}")
for name, dur in rows[:40]:
    print(f"{name[:60]:60s} {dur/1e3/REPS:9.3f} {cnt[name]:7d} "
          f"{100*dur/total:6.1f}")
