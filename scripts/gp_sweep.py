"""Same-process bn sweep for the STACKED gp dequant-gemv kernel.

tune.py sweeps the non-stacked kernel; decode runs the stacked one.
This sweeps bn per decode shape on the stacked path itself, cycling
through 8 stacked layers so weights stream from HBM (never VMEM-pinned).

  python scripts/gp_sweep.py [--m 1] [--quant q4bf16]
"""

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import mlc_llm_tpu  # noqa: F401
from mlc_llm_tpu.quant import quantize, resolve_spec
from mlc_llm_tpu.quant.groupwise import QuantizedTensor, pad_quantized_groups

dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")

L = 8
SHAPES = [(4096, 22528), (4096, 12288), (11008, 4096), (4096, 4096)]


def stack_qt(k, n, spec, rng):
    """Fabricate L stacked layers of random packed codes (values are
    garbage — only bandwidth matters; real quantize of a 7B-sized shape
    takes minutes of host time)."""
    from mlc_llm_tpu.quant.groupwise import pad_cols

    g = spec.group_size
    ngroups = -(-k // g)
    ns = pad_cols(n)
    rows = ngroups * (-(-g // spec.elems_per_word))
    key = jax.random.PRNGKey(int(rng.integers(1 << 30)))
    k1, k2, k3 = jax.random.split(key, 3)
    wdtype = jnp.uint32 if spec.storage == "u32" else jnp.uint16
    data = jax.random.bits(k1, (L, rows, ns), jnp.uint32).astype(wdtype)
    dtype = jnp.dtype(spec.dtype)
    scale = (jnp.abs(jax.random.normal(k2, (L, ngroups, ns), jnp.float32))
             * 0.01).astype(dtype)
    zero = None
    if not spec.sym:
        zero = (-scale.astype(jnp.float32)
                * (1 << (spec.nbit - 1))).astype(dtype)
    qt = QuantizedTensor(data=data, scale=scale, zero=zero, spec=spec,
                         shape=(k, n))
    return pad_quantized_groups(qt)


def bench(qt, m, bn, steps=(16, 144)):
    kw = qt.data.shape[1]
    n_stored = qt.data.shape[2]
    k = qt.shape[0]

    orig = dm._gp_blocks
    dm._gp_blocks = lambda m_, kw_, n_: (kw_, bn)
    for fn in (dm._dequant_matmul_gp_2d,):
        fn.clear_cache()
    try:
        # qt must be an ARGUMENT: a closed-over array is baked into the
        # HLO as a constant — the tunneled remote-compile endpoint 413s
        # on >~400 MB request bodies, and XLA gives constants special
        # placement that invalidates the bandwidth measurement
        @jax.jit
        def loop(x, qt, n):
            def body(i, x):
                y = dm.dequant_matmul_stacked(x, qt, i % L)
                y = y[:, :k] if y.shape[1] >= k else jnp.pad(
                    y, ((0, 0), (0, k - y.shape[1])))
                return (y * 1e-3).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n, body, x, unroll=False)

        x0 = jnp.ones((m, k), jnp.bfloat16) * 0.01
        float(jnp.asarray(loop(x0, qt, 2)).reshape(-1)[0])
        best = float("inf")
        for _ in range(3):
            ts = {}
            for s in steps:
                t0 = time.perf_counter()
                float(jnp.asarray(loop(x0, qt, s)).reshape(-1)[0])
                ts[s] = time.perf_counter() - t0
            d = (ts[steps[1]] - ts[steps[0]]) / (steps[1] - steps[0])
            if d > 0:
                best = min(best, d)
        return best
    finally:
        dm._gp_blocks = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--quant", default="q4bf16")
    ap.add_argument("--bn", type=int, action="append", default=None)
    args = ap.parse_args()
    spec = resolve_spec(args.quant)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} m={args.m} quant={args.quant}",
          flush=True)
    results = {}
    for k, n in SHAPES:
        qt = stack_qt(k, n, spec, rng)
        kw, n_stored = qt.data.shape[1], qt.data.shape[2]
        per_layer = qt.nbytes() // L
        cands = args.bn or [256, 512, 1024, 2048, 4096]
        best_bn, best_t = None, float("inf")
        for bn in cands:
            if n_stored % bn:
                continue
            try:
                t = bench(qt, args.m, bn)
            except Exception as e:
                print(f"  k={k} n={n} bn={bn}: FAIL {type(e).__name__}", flush=True)
                continue
            gbs = per_layer / t / 1e9
            print(f"  k={k} n={n} (kw={kw} ns={n_stored}) bn={bn}: "
                  f"{t*1e6:.1f} us  {gbs:.0f} GB/s", flush=True)
            if t < best_t:
                best_bn, best_t = bn, t
        results[f"gp:{args.m}:{kw}:{n_stored}"] = [kw, best_bn]
        print(f"  -> best bn={best_bn}", flush=True)
    print(results)


if __name__ == "__main__":
    main()
