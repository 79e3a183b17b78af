"""Profile one decode step on the real chip and print a per-op table.

Methodology per docs/PERF.md: jax.profiler works over the tunnel; parse
the trace.json.gz traceEvents, keep pids whose process_name mentions
TPU, sum durations by op name.
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
from mlc_llm_tpu.ops.sampling import sample_token
from mlc_llm_tpu.quant.groupwise import QuantizedTensor, pad_quantized_groups

BATCH = int(os.environ.get("PROF_BATCH", "1"))
# default cache length fits b8 in the 16 GB HBM next to 4.3 GB weights
MAXLEN = int(os.environ.get("PROF_MAXLEN", "2048" if BATCH == 1 else "512"))
QUANT = os.environ.get("PROF_QUANT", "q4bf16")
KVDTYPE = os.environ.get("PROF_KV", "")  # e.g. int8

cfg = get_config("vicuna-v1-7b")
params = init_random_params(cfg, QUANT, seed=0, fabricate=True)
params = jax.tree.map(
    lambda x: pad_quantized_groups(x) if isinstance(x, QuantizedTensor) else x,
    params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
import jax.numpy as _jnp

cache = init_kv_cache(cfg, batch=BATCH, max_len=MAXLEN,
                      **({"dtype": _jnp.int8} if KVDTYPE == "int8" else {}))


@partial(jax.jit, donate_argnames=("cache",), static_argnames=("window",))
def decode_n(params, tok, cache, key, n, window=None):
    def body(_, carry):
        tok, cache, key = carry
        logits, cache = forward(params, cfg, tok, cache, last_only=True,
                                attn_window=window)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits, sub, 0.7, 0.95)
        return (nxt[:, None], cache, key)

    tok, cache, key = jax.lax.fori_loop(0, n, body, (tok, cache, key))
    return tok, cache


def rb(x):
    return float(jnp.asarray(x).reshape(-1)[0])


tok = jnp.ones((BATCH, 1), jnp.int32)
key = jax.random.PRNGKey(0)
out, cache = decode_n(params, tok, cache, key, 2, window=256)
rb(out)  # compile + warm

NSTEPS = 30
tdir = "/tmp/decode_trace"
os.system(f"rm -rf {tdir}")
t0 = time.perf_counter()
with jax.profiler.trace(tdir):
    out, cache = decode_n(params, out, cache, key, NSTEPS, window=256)
    rb(out)
wall = time.perf_counter() - t0
print(f"wall for {NSTEPS} steps: {wall*1e3:.1f} ms "
      f"({wall/NSTEPS*1e3:.2f} ms/step)", flush=True)

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
print(f"total device time: {total/1e3:.1f} ms over {NSTEPS} steps "
      f"=> {total/1e3/NSTEPS:.3f} ms/step")
print(f"{'op':60s} {'ms/step':>9s} {'calls':>7s} {'%':>6s}")
for name, dur in rows[:40]:
    print(f"{name[:60]:60s} {dur/1e3/NSTEPS:9.3f} {cnt[name]:7d} "
          f"{100*dur/total:6.1f}")
