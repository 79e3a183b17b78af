"""Per-shape weight-streaming CEILING vs the gp dequant-gemv kernels.

The round-3 verdict's missing instrument: nothing established what a
pure weight-streaming Pallas kernel (same grid, same BlockSpec DMAs,
trivial reduce, no dequant/no dot) achieves on the exact stacked
[L, KW, N] shapes and production block sizes the decode step uses.
Without that ceiling, "remaining roofline gap" claims can't separate
kernel inefficiency from chip contention / DMA-shape walls.

Protocol (same discipline as mlc_llm_tpu.tune --stacked):
- every shape is stacked to >= ~160 MB so nothing pins in VMEM;
- on-device fori_loop cycling the layer index, long-minus-short with an
  ADAPTIVE trip count so the delta is >> the ~25 ms tunnel RTT jitter
  (the fixed 1024-step delta is marginal for the 10.5 MB wo shape);
- ceiling and gp legs run interleaved per shape IN ONE PROCESS, with a
  raw HBM probe at session start and end;
- readings implying > 1.1x spec bandwidth are rejected (tune.py's
  plausibility rule).

    python scripts/ceiling.py [--alternates] [--quant q4bf16]

Prints one JSON line per measurement and a final summary line.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPEC_BW = 819e9


def hbm_probe() -> float:
    """Raw achievable HBM read GB/s right now (bench.py's probe)."""
    buf = jax.random.bits(jax.random.PRNGKey(1), (256, 1024, 1024), jnp.uint32)
    red = jax.jit(lambda w, s: (w >> 4).sum(dtype=jnp.uint32) + s)
    s = red(buf, jnp.uint32(0))
    float(jnp.asarray(s).reshape(-1)[0])

    def reduce_n(n):
        nonlocal s
        t0 = time.perf_counter()
        for _ in range(n):
            s = red(buf, s)
        float(jnp.asarray(s).reshape(-1)[0])
        return time.perf_counter() - t0

    t2, t10 = reduce_n(2), reduce_n(10)
    bw = 8 * buf.nbytes / max(t10 - t2, 1e-6)
    del buf, s
    # timing collapse under load produces absurd readings; report None
    return bw if 100e9 < bw < 1.1e12 else None


@functools.partial(jax.jit,
                   static_argnames=("bkw", "bn", "k_steps", "interpret"))
def _stream_call(layer, data, scale, zero, *, bkw, bn, k_steps,
                 interpret=False):
    """One full pass over layer `layer` of the stacked buffers, DMA'ing
    the exact blocks the stacked gp kernel DMAs, with a trivial reduce."""
    L, kw, n = data.shape
    G = scale.shape[1]
    Gt = G // k_steps

    def kernel(l_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
        @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[0]
        s = s_ref[0]
        z = z_ref[0]
        # touch every block fully (cheap VPU reduce, far below the DMA
        # bound) so no buffer fetch can be elided
        ws = jnp.sum((w >> 1).astype(jnp.int32), axis=0, keepdims=True)
        ss = jnp.sum(s.astype(jnp.float32), axis=0, keepdims=True)
        zs = jnp.sum(z.astype(jnp.float32), axis=0, keepdims=True)
        tot = ws.astype(jnp.float32) + ss + zs  # [1, bn]
        acc_ref[0:1, :] = acc_ref[0:1, :] + tot[:, :128]
        o_ref[:] = acc_ref[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((1, bkw, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, Gt, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, Gt, bn), lambda i, j, kk, l: (l[0], kk, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, j, kk, l: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(layer, data, scale, zero)


@functools.partial(jax.jit,
                   static_argnames=("bkw", "bn", "k_steps", "interpret"))
def _stream_merged_call(salt, data, scale, zero, *, bkw, bn, k_steps,
                        interpret=False):
    """ONE pallas_call streaming ALL L stacked layers (grid walks the
    layer axis) with the production block DMAs — the round-4 verdict's
    merged-invocation falsifier. If this beats the per-invocation
    ceiling (`_stream_call` per layer), the per-invocation pipeline
    ramp is recoverable by a megakernel; if it matches, the per-shape
    ceilings are the wall for ANY kernel structure over these buffers.

    `salt` (scalar-prefetch) is folded into the accumulator so repeated
    calls inside the timing fori_loop stay distinct (no CSE/hoisting —
    the call would otherwise be loop-invariant).
    """
    L, kw, n = data.shape
    G = scale.shape[1]
    Gt = G // k_steps

    def kernel(s2_ref, w_ref, s_ref, z_ref, o_ref, acc_ref):
        first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))

        @pl.when(first)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            acc_ref[0:1, :] = jnp.full(
                (1, 128), s2_ref[0].astype(jnp.float32))

        w = w_ref[0]
        s = s_ref[0]
        z = z_ref[0]
        ws = jnp.sum((w >> 1).astype(jnp.int32), axis=0, keepdims=True)
        ss = jnp.sum(s.astype(jnp.float32), axis=0, keepdims=True)
        zs = jnp.sum(z.astype(jnp.float32), axis=0, keepdims=True)
        tot = ws.astype(jnp.float32) + ss + zs  # [1, bn]
        acc_ref[0:1, :] = acc_ref[0:1, :] + tot[:, :128]
        o_ref[:] = acc_ref[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n // bn, k_steps),
        in_specs=[
            pl.BlockSpec((1, bkw, bn), lambda l, j, kk, s: (l, kk, j)),
            pl.BlockSpec((1, Gt, bn), lambda l, j, kk, s: (l, kk, j)),
            pl.BlockSpec((1, Gt, bn), lambda l, j, kk, s: (l, kk, j)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda l, j, kk, s: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(salt, data, scale, zero)


def _timed_loop(call_one, L, bytes_per_call, label, repeats=3):
    """Adaptive long-minus-short on-device loop; returns best seconds.

    call_one(layer_scalar) -> scalar-readable array. The loop carries a
    dependency so iterations serialize; trip count is a traced arg (one
    executable regardless of length).
    """

    @jax.jit
    def loop(n):
        def body(i, c):
            r = call_one(jnp.mod(i, L))
            return c + r.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(jnp.asarray(loop(2)))  # compile + warm
    est = bytes_per_call / 600e9
    extra = max(1024, int(0.1 / est))  # delta >= ~100 ms of device time
    short, long_ = 64, 64 + extra
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.asarray(loop(short)))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.asarray(loop(long_)))
        tl = time.perf_counter() - t0
        d = (tl - ts) / (long_ - short)
        if d > 0:
            gbps = bytes_per_call / d / 1e9
            if gbps * 1e9 <= 1.1 * SPEC_BW:
                best = min(best, d)
            else:
                print(json.dumps({"label": label, "rejected_gbps": round(gbps, 1)}),
                      flush=True)
    return best


def stack_qt(qt, min_mb=160):
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor

    L = max(2, min(16, -(-min_mb * 1024 * 1024 // qt.nbytes())))

    def rep(a):
        return jnp.stack([jnp.roll(a, i, axis=-1) for i in range(L)], 0)

    return QuantizedTensor(
        data=rep(qt.data), scale=rep(qt.scale),
        zero=None if qt.zero is None else rep(qt.zero),
        spec=qt.spec, shape=qt.shape,
    ), L


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="q4bf16")
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--alternates", action="store_true",
                    help="also sweep alternate blocks on the laggard shapes")
    ap.add_argument("--blocks", default=None,
                    help="explicit block list 'bkw x bn' pairs, e.g. "
                         "704x512,352x512 (applies to every shape)")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (interpret-mode stream kernel)")
    ap.add_argument("--merged", action="store_true",
                    help="also measure the MERGED streaming ceiling "
                         "(one pallas_call walking all L stacked layers)")
    ap.add_argument("--shapes", default=None,
                    help="comma-separated k x n pairs, e.g. 4096x4096,11008x4096")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import importlib

    from mlc_llm_tpu.models import get_config
    from mlc_llm_tpu.quant import quantize, resolve_spec
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups
    from mlc_llm_tpu.tune import model_shapes

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")

    spec = resolve_spec(args.quant)
    cfg = get_config(args.model)
    if args.shapes:
        shapes = [tuple(map(int, s.split("x"))) for s in args.shapes.split(",")]
    else:
        shapes = model_shapes(cfg)
    rng = np.random.default_rng(0)

    bw0 = hbm_probe()
    print(json.dumps({"hbm_probe_start_gbps":
                      round(bw0 / 1e9, 1) if bw0 else None}), flush=True)

    summary = {}
    for k, n in shapes:
        qt = quantize((rng.standard_normal((k, n)) * 0.05).astype(np.float32), spec)
        qt = pad_quantized_groups(qt)
        qts, L = stack_qt(qt)
        kw, n_stored = qt.data.shape
        bytes_per_call = (qt.data.nbytes + qt.scale.nbytes
                          + (qt.zero.nbytes if qt.zero is not None else 0))
        prod_bkw, prod_bn = dm._gp_blocks(1, kw, n_stored)
        blocks_list = [(prod_bkw, prod_bn)]
        if args.blocks:
            blocks_list = [tuple(map(int, b.split("x")))
                           for b in args.blocks.split(",")]
        if args.alternates:
            for b in ((kw, 256), (kw, 1024), (kw // 2, prod_bn),
                      (kw // 4, prod_bn)):
                bkw_, bn_ = b
                if (bkw_ >= 4 and kw % bkw_ == 0 and n_stored % bn_ == 0
                        and b not in blocks_list and bkw_ % 4 == 0):
                    blocks_list.append(b)

        shape_key = f"{k}x{n}"
        summary[shape_key] = {"bytes_mb": round(bytes_per_call / 1e6, 1), "L": L}

        for bkw, bn in blocks_list:
            k_steps = kw // bkw
            tag = f"{bkw}x{bn}"
            # --- ceiling leg ---
            data, scale = qts.data, qts.scale
            zero = qts.zero if qts.zero is not None else qts.scale

            interp = jax.default_backend() == "cpu"

            def stream_one(l):
                return _stream_call(l[None] if l.ndim == 0 else l,
                                    data, scale, zero,
                                    bkw=bkw, bn=bn, k_steps=k_steps,
                                    interpret=interp)

            def stream_scalar(l):
                return stream_one(jnp.asarray(l, jnp.int32).reshape(1))

            try:
                t_ceil = _timed_loop(stream_scalar, L, bytes_per_call,
                                     f"ceil:{shape_key}:{tag}")
            except Exception as e:
                print(json.dumps({"kind": "ceiling", "shape": shape_key,
                                  "blocks": [bkw, bn],
                                  "error": f"{type(e).__name__}"}),
                      flush=True)
                t_ceil = float("inf")
            g_ceil = bytes_per_call / t_ceil / 1e9 if t_ceil < float("inf") else None
            print(json.dumps({"kind": "ceiling", "shape": shape_key,
                              "blocks": [bkw, bn],
                              "us": round(t_ceil * 1e6, 1),
                              "gbps": round(g_ceil, 1) if g_ceil else None}),
                  flush=True)

            # --- merged leg (one call streams all L layers) ---
            g_merged = None
            if args.merged:
                def merged_one(l):
                    return _stream_merged_call(
                        jnp.asarray(l, jnp.int32).reshape(1),
                        data, scale, zero,
                        bkw=bkw, bn=bn, k_steps=k_steps, interpret=interp)

                try:
                    t_m = _timed_loop(merged_one, L, L * bytes_per_call,
                                      f"merged:{shape_key}:{tag}")
                except Exception as e:
                    print(json.dumps({"kind": "merged", "shape": shape_key,
                                      "blocks": [bkw, bn],
                                      "error": f"{type(e).__name__}"[:80]}),
                          flush=True)
                    t_m = float("inf")
                g_merged = (L * bytes_per_call / t_m / 1e9
                            if t_m < float("inf") else None)
                print(json.dumps({"kind": "merged", "shape": shape_key,
                                  "blocks": [bkw, bn],
                                  "us": round(t_m * 1e6, 1),
                                  "gbps": (round(g_merged, 1)
                                           if g_merged else None)}),
                      flush=True)

            # --- gp leg (same process, right after) ---
            orig_gp = dm._gp_blocks
            dm._gp_blocks = lambda *a, _b=(bkw, bn), **kk: _b
            try:
                for fn in (dm._dequant_matmul_gp_2d,
                           dm._dequant_matmul_stacked_2d,
                           dm._dequant_matmul_stacked_generic_2d):
                    fn.clear_cache()
                x0 = jnp.ones((1, k), jnp.bfloat16) * 0.01

                def gp_one(l):
                    y = dm.dequant_matmul_stacked(x0, qts, l)
                    return y[:, :1]

                try:
                    t_gp = _timed_loop(gp_one, L, bytes_per_call,
                                       f"gp:{shape_key}:{tag}")
                except Exception as e:
                    print(json.dumps({"kind": "gp", "shape": shape_key,
                                      "blocks": [bkw, bn],
                                      "error": f"{type(e).__name__}"[:80]}),
                          flush=True)
                    t_gp = float("inf")
            finally:
                dm._gp_blocks = orig_gp
                for fn in (dm._dequant_matmul_gp_2d,
                           dm._dequant_matmul_stacked_2d,
                           dm._dequant_matmul_stacked_generic_2d):
                    fn.clear_cache()
            g_gp = bytes_per_call / t_gp / 1e9 if t_gp < float("inf") else None
            print(json.dumps({"kind": "gp", "shape": shape_key,
                              "blocks": [bkw, bn],
                              "us": round(t_gp * 1e6, 1),
                              "gbps": round(g_gp, 1) if g_gp else None}),
                  flush=True)
            if g_ceil and g_gp:
                entry = {"blocks": [bkw, bn],
                         "ceiling_gbps": round(g_ceil, 1),
                         "gp_gbps": round(g_gp, 1),
                         "gp_vs_ceiling": round(g_gp / g_ceil, 3)}
                if g_merged:
                    entry["merged_gbps"] = round(g_merged, 1)
                    entry["merged_vs_ceiling"] = round(g_merged / g_ceil, 3)
                summary[shape_key].setdefault("runs", []).append(entry)

    bw1 = hbm_probe()
    print(json.dumps({"hbm_probe_end_gbps":
                      round(bw1 / 1e9, 1) if bw1 else None}), flush=True)
    print(json.dumps({"ceiling_summary": summary}), flush=True)


if __name__ == "__main__":
    main()
