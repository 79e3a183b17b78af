"""Profiler-based per-kernel bn sweep for the STACKED gp kernel.

Long-minus-short timing drowns in tunnel noise for small shapes
(gp_sweep.py v1 produced 10 TB/s readings); per-op durations from
jax.profiler are exact chip time and A/B-valid within one process.

  python scripts/gp_sweep2.py [--m 1] [--steps 30]
"""

import argparse
import glob
import gzip
import importlib
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mlc_llm_tpu  # noqa: F401
from mlc_llm_tpu.quant import resolve_spec
from gp_sweep import stack_qt, L

dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")

SHAPES = [(4096, 22528), (4096, 12288), (11008, 4096), (4096, 4096)]
# gpt-neox 3B (RedPajama / dolly-class) decode shapes: qkv, wo,
# non-gated FFN in/out (gelu: F, not 2F)
SHAPES_3B = [(2560, 7680), (2560, 10240), (10240, 2560), (2560, 2560)]


def kernel_us(qt, m, bn, steps, tag):
    """Total Pallas-kernel us per loop step, from a profiler trace."""
    kw = qt.data.shape[1]
    k = qt.shape[0]

    orig = dm._gp_blocks
    orig3 = dm._gp3_bn
    dm._gp_blocks = lambda m_, kw_, n_, *a, **kk: (kw_, bn)
    dm._gp3_bn = lambda m_, kw_, n_: bn
    dm._dequant_matmul_gp_2d.clear_cache()
    dm._dequant_matmul_gp3_2d.clear_cache()
    try:
        # qt as ARGUMENT, not closure: closed-over arrays become HLO
        # constants (tunnel remote-compile 413s on big bodies; constants
        # also get placement that invalidates bandwidth numbers)
        @jax.jit
        def loop(x, qt, n):
            def body(i, x):
                y = dm.dequant_matmul_stacked(x, qt, i % L)
                y = y[:, :k] if y.shape[1] >= k else jnp.pad(
                    y, ((0, 0), (0, k - y.shape[1])))
                return (y * 1e-3).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, x, unroll=False)

        x0 = jnp.ones((m, k), jnp.bfloat16) * 0.01
        float(jnp.asarray(loop(x0, qt, 2)).reshape(-1)[0])  # compile+warm
        tdir = f"/tmp/gpsweep/{tag}"
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            float(jnp.asarray(loop(x0, qt, steps)).reshape(-1)[0])
        traces = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
        ev = json.load(gzip.open(traces[-1]))["traceEvents"]
        pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name", ""))}
        tot = defaultdict(float)
        for e in ev:
            if e.get("ph") == "X" and e.get("pid") in pids:
                tot[e["name"].split(".")[0]] += e["dur"]
        kern = sum(v for n, v in tot.items()
                   if "_dequant_matmul_gp" in n)
        return kern / steps
    finally:
        dm._gp_blocks = orig
        dm._gp3_bn = orig3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--quant", default="q4bf16")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--bn", type=int, action="append", default=None)
    ap.add_argument("--shapes", default="7b", choices=["7b", "3b"])
    args = ap.parse_args()
    spec = resolve_spec(args.quant)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} m={args.m}", flush=True)
    best_tbl = {}
    for k, n in (SHAPES if args.shapes == "7b" else SHAPES_3B):
        qt = stack_qt(k, n, spec, rng)
        kw, ns = qt.data.shape[1], qt.data.shape[2]
        per_layer = qt.nbytes() // L
        best_bn, best_us = None, float("inf")
        for bn in (args.bn or [256, 512, 1024, 2048]):
            if ns % bn:
                continue
            try:
                us = kernel_us(qt, args.m, bn, args.steps, f"{kw}x{ns}bn{bn}")
            except Exception as e:
                print(f"  k={k} n={n} bn={bn}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            gbs = per_layer / (us * 1e-6) / 1e9
            print(f"  k={k} n={n} (kw={kw} ns={ns}) bn={bn}: {us:.1f} us  "
                  f"{gbs:.0f} GB/s", flush=True)
            if us < best_us:
                best_bn, best_us = bn, us
        pref = "gp3" if "q3" in args.quant else "gp"
        best_tbl[f"{pref}:{args.m}:{kw}:{ns}"] = [kw, best_bn]
        print(f"  -> best bn={best_bn} ({best_us:.1f} us)", flush=True)
        del qt
    print(json.dumps(best_tbl), flush=True)


if __name__ == "__main__":
    main()
