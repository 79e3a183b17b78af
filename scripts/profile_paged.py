"""Profile one PAGED decode step on the real chip: per-op table.

Same methodology as profile_decode.py. PB_MODE=gather forces the jnp
gather attention path for comparison.
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
from mlc_llm_tpu.models.paged_cache import PageAllocator, init_paged_kv_cache
from mlc_llm_tpu.ops.sampling import sample_token
from mlc_llm_tpu.quant.groupwise import QuantizedTensor, pad_quantized_groups

B = int(os.environ.get("PB_BATCH", "8"))
MODE = os.environ.get("PB_MODE", "flash")
CTX = 128
WINDOW = 256
PS = 64

if MODE == "gather":
    from mlc_llm_tpu.models import paged_cache

    paged_cache.paged_flash_enabled = lambda dtype: False

cfg = get_config("vicuna-v1-7b")
params = init_random_params(cfg, "q4bf16", seed=0, fabricate=True)
params = jax.tree.map(
    lambda x: pad_quantized_groups(x) if isinstance(x, QuantizedTensor) else x,
    params, is_leaf=lambda x: isinstance(x, QuantizedTensor))

import dataclasses

paged = init_paged_kv_cache(cfg, B, num_pages=B * (512 // PS) + 1,
                            page_size=PS, max_pages_per_slot=512 // PS)
alloc = PageAllocator(paged.num_pages)
table = np.zeros(paged.page_table.shape, np.int32)
for b in range(B):
    pg = alloc.alloc(512 // PS)
    table[b, : len(pg)] = pg
cache = dataclasses.replace(paged, page_table=jnp.asarray(table))


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


@partial(jax.jit, donate_argnames=("cache",))
def prefill(params, tokens, seq_lens, cache):
    return forward(params, cfg, tokens, cache, seq_lens=seq_lens, last_only=True)


def rb(x):
    return float(jnp.asarray(x).reshape(-1)[0])


prompt = jnp.asarray(
    np.random.default_rng(0).integers(10, 1000, (B, CTX)), jnp.int32)
lens = jnp.full((B,), CTX, jnp.int32)
logits, cache = prefill(params, prompt, lens, cache)
tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
key = jax.random.PRNGKey(0)
out, cache = decode_n(params, tok, cache, key, 2, window=WINDOW)
rb(out)

NSTEPS = 20
tdir = "/tmp/paged_trace"
os.system(f"rm -rf {tdir}")
t0 = time.perf_counter()
with jax.profiler.trace(tdir):
    out, cache = decode_n(params, out, cache, key, NSTEPS, window=WINDOW)
    rb(out)
wall = time.perf_counter() - t0
print(f"[{MODE}] wall for {NSTEPS} steps: {wall*1e3:.1f} ms "
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

print(f"total device time: {total/1e3:.1f} ms "
      f"({total/1e3/NSTEPS:.2f} ms/step)")
for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {dur/1e3/NSTEPS:8.3f} ms/step  x{cnt[name]//NSTEPS:<5} {name[:90]}")
