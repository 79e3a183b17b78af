"""Kernel block-size autotuner (the MetaSchedule-DB analog).

The reference ships pruned MetaSchedule JSON databases per model
(/root/reference/log_db/, applied at build.py:141-146). Here the only
schedule parameters are the dequant-matmul block sizes; this tool
sweeps candidates ON THE CURRENT BACKEND and writes
mlc_llm_tpu/ops/pallas/tuned_blocks.json, which _pick_blocks consults
before its heuristics.

  python -m mlc_llm_tpu.tune --model vicuna-v1-7b            # sweep
  python -m mlc_llm_tpu.tune --model dolly-v2-3b --m 1 --m 128
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

TABLE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "ops", "pallas", "tuned_blocks.json"
)


def _bench_variant(qt, m: int, bkw: int, bn: int, steps=(16, 112)) -> float:
    """Per-call seconds for one block config (on-device loop)."""
    # the package __init__ re-exports the function under the same name,
    # shadowing the submodule attribute — resolve the MODULE explicitly
    import importlib

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")

    k = qt.shape[0]

    @jax.jit
    def loop(x, n):
        def body(_, x):
            y = dm.dequant_matmul(x, qt)
            y = y[:, :k] if y.shape[1] >= k else jnp.pad(y, ((0, 0), (0, k - y.shape[1])))
            return (y * 1e-3).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x, unroll=False)

    # monkey-patch the block picker for this measurement; the jitted
    # entry points cache by STATIC args (identical across the sweep), so
    # stale executables must be evicted or every candidate would re-time
    # the first one's compilation
    orig = dm._pick_blocks
    orig_gp = dm._gp_blocks
    orig_gp3 = dm._gp3_bn
    dm._pick_blocks = lambda *a, **kw: (orig(*a, **kw)[0], bkw, bn)
    dm._gp_blocks = lambda *a, **k: (bkw, bn)
    dm._gp3_bn = lambda m_, kw_, n_: bn
    for fn in (dm._dequant_matmul_2d, dm._dequant_matmul_gp_2d,
               dm._dequant_matmul_gp3_2d):
        fn.clear_cache()
    try:
        x0 = jnp.ones((m, k), jnp.bfloat16) * 0.01
        float(jnp.asarray(loop(x0, 2)).reshape(-1)[0])
        # the tunneled chip time-shares: single long-minus-short readings
        # occasionally go NEGATIVE under interference; take the best of 3
        # repeats and reject non-positive deltas
        best = float("inf")
        long_avg = float("inf")
        for _ in range(3):
            ts = {}
            for s in steps:
                t0 = time.perf_counter()
                float(jnp.asarray(loop(x0, s)).reshape(-1)[0])
                ts[s] = time.perf_counter() - t0
            long_avg = min(long_avg, ts[steps[1]] / steps[1])
            d = (ts[steps[1]] - ts[steps[0]]) / (steps[1] - steps[0])
            if d > 0:
                best = min(best, d)
        if best == float("inf"):
            # noise swamped the subtraction (tiny shapes / loaded CPU):
            # rank by the long-run average instead — an upper bound,
            # consistent across candidates of the same shape
            return long_avg
        return best
    finally:
        dm._pick_blocks = orig
        dm._gp_blocks = orig_gp
        dm._gp3_bn = orig_gp3
        # evict executables traced with the LAST swept candidate's
        # blocks: the jitted entry points cache by static args, so a
        # same-process measurement after the sweep would silently run
        # the last candidate instead of the shipped table
        for fn in (dm._dequant_matmul_2d, dm._dequant_matmul_gp_2d,
                   dm._dequant_matmul_gp3_2d):
            fn.clear_cache()


def _bench_variant_stacked(qts, m: int, bkw: int, bn: int,
                           steps=None) -> float:
    """Per-call seconds for one block config, measured through the
    layer-STACKED kernel cycling over L stacked layers.

    Why this exists: weights <= ~12 MB get pinned in VMEM by XLA across
    loop iterations (docs/PERF.md methodology), so an isolated sweep of
    a small shape (wo 4096x4096 is 10.5 MB) reads "faster than HBM" or
    pure noise — the round-3 single-shape sweep had to reject most wo
    candidates as implausible. Stacking L copies (>= ~160 MB total) and
    cycling the layer index reproduces the engine's real access pattern:
    every call streams a different layer's blocks from HBM.

    steps default is much longer than _bench_variant's: per-call times
    here are tens of microseconds, so the long-minus-short delta must
    be >> the tunnel's ~25 ms RTT jitter (1024 extra steps ~= 35-70 ms
    of device time; the first probe with 96-step deltas read an absurd
    372 TB/s). The trip count is a traced argument — one executable
    regardless of steps, so longer loops cost milliseconds, not
    compiles."""
    import importlib

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")

    L = qts.data.shape[0]
    k = qts.shape[0]
    if steps is None:
        # size the long-minus-short delta to >= ~100 ms of device time:
        # the fixed (64, 1088) default was calibrated on 7B shapes
        # (~35-70 ms); on 3B shapes the per-call time is 3-10x shorter
        # and the delta drowned in the tunnel's ~25 ms RTT jitter —
        # every small-shape candidate read an impossible 1.2-4 TB/s
        # (tpu_logs/tune_3b_r5.log round 5)
        per_layer = qts.nbytes() // max(L, 1)
        est_percall = per_layer / 500e9  # pessimistic ~500 GB/s
        n_extra = max(1024, min(16384, int(0.1 / max(est_percall, 1e-9))))
        steps = (64, 64 + n_extra)

    @jax.jit
    def loop(x, n):
        def body(i, x):
            y = dm.dequant_matmul_stacked(x, qts, jnp.mod(i, L))
            y = y[:, :k] if y.shape[1] >= k else jnp.pad(
                y, ((0, 0), (0, k - y.shape[1])))
            return (y * 1e-3).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x, unroll=False)

    orig = dm._pick_blocks
    orig_gp = dm._gp_blocks
    orig_gp3 = dm._gp3_bn
    dm._pick_blocks = lambda *a, **kw: (orig(*a, **kw)[0], bkw, bn)
    dm._gp_blocks = lambda *a, **k: (bkw, bn)
    dm._gp3_bn = lambda m_, kw_, n_: bn
    for fn in (dm._dequant_matmul_stacked_2d, dm._dequant_matmul_gp_2d,
               dm._dequant_matmul_gp3_2d,
               dm._dequant_matmul_stacked_generic_2d):
        fn.clear_cache()
    try:
        x0 = jnp.ones((m, k), jnp.bfloat16) * 0.01
        float(jnp.asarray(loop(x0, 2)).reshape(-1)[0])
        best = float("inf")
        long_avg = float("inf")
        for _ in range(3):
            ts = {}
            for s in steps:
                t0 = time.perf_counter()
                float(jnp.asarray(loop(x0, s)).reshape(-1)[0])
                ts[s] = time.perf_counter() - t0
            long_avg = min(long_avg, ts[steps[1]] / steps[1])
            d = (ts[steps[1]] - ts[steps[0]]) / (steps[1] - steps[0])
            if d > 0:
                best = min(best, d)
        if best == float("inf"):
            return long_avg
        return best
    finally:
        dm._pick_blocks = orig
        dm._gp_blocks = orig_gp
        dm._gp3_bn = orig_gp3
        # see _bench_variant: evict last-candidate executables
        for fn in (dm._dequant_matmul_stacked_2d, dm._dequant_matmul_gp_2d,
                   dm._dequant_matmul_gp3_2d,
                   dm._dequant_matmul_stacked_generic_2d):
            fn.clear_cache()


def _stack_quantized(qt, L: int):
    """Stack L copies of a QuantizedTensor along a new leading axis
    (layer-decorrelated: each copy is rolled so identical-page reuse
    can't fake bandwidth)."""
    from .quant.groupwise import QuantizedTensor

    def rep(a):
        return jnp.stack([jnp.roll(a, i, axis=-1) for i in range(L)], 0)

    return QuantizedTensor(
        data=rep(qt.data), scale=rep(qt.scale),
        zero=None if qt.zero is None else rep(qt.zero),
        spec=qt.spec, shape=qt.shape,
    )


# v5e spec HBM bandwidth: a per-call reading implying MORE than this is
# physically impossible for an HBM-resident weight and means the probe
# hit a contention/VMEM-pinning artifact (memory: weights <= ~12 MB get
# pinned in VMEM and read "faster than HBM"). Such readings must never
# pick the permanent block choice (round-2 verdict weak #6).
SPEC_BW = 819e9
_IMPLAUSIBLE_FACTOR = 1.1


def _implied_gbps(qt, t: float) -> float:
    return qt.nbytes() / max(t, 1e-12)


def tune_shapes(shapes, quant="q4bf16", ms=(1,), verbose=True,
                validate: bool = True, stacked: bool = False,
                cands_override=None, checkpoint_path=None):
    """shapes: [(k, n)]; returns {key: entry} best blocks.

    Entries carry provenance: {"blocks": [bkw, bn], "gbps": float,
    "validated": bool, "runner_up": [bkw, bn] | None}. The validation
    protocol (round-2 verdict #4): readings implying > spec bandwidth
    are rejected outright, and the winner must REPRODUCE within 25% in
    an immediate same-process re-measure — otherwise it is recorded
    with validated=false (the runtime still uses it, but the sweep log
    flags it for a re-run on a quieter chip)."""
    from .ops.pallas.dequant_matmul import _largest_divisor, _pick_blocks
    from .quant import quantize, resolve_spec

    from .ops.pallas.dequant_matmul import (
        gp3_matmul_supported,
        gp_matmul_supported,
    )

    spec = resolve_spec(quant)
    rng = np.random.default_rng(0)
    table = {}
    for k, n in shapes:
        qt = quantize((rng.standard_normal((k, n)) * 0.05).astype(np.float32), spec)
        from .quant.groupwise import pad_quantized_groups

        qt = pad_quantized_groups(qt)  # engines pad at init; tune likewise
        qts = None
        if stacked:
            # enough layers that the cycled working set can't pin in
            # VMEM (>= ~160 MB), capped so huge shapes stay affordable.
            # Cap 64 not 16: a 3.3 MB shape (3B wo) stacked x16 is only
            # 53 MB and every candidate read implausible >1 TB/s
            # (tpu_logs/tune_3b_r5.log) — small shapes need the full
            # 160 MB working set
            L = max(2, min(64, -(-160 * 1024 * 1024 // qt.nbytes())))
            qts = _stack_quantized(qt, L)
            if verbose:
                print(f"  [stacked x{L} = {qts.data.nbytes/1e6:.0f} MB "
                      f"packed]", flush=True)
        kw = qt.data.shape[0]
        n_stored = qt.data.shape[1]
        wpg = -(-spec.group_size // spec.elems_per_word)
        cands = []
        for bkw in (1024, 512, 256, kw):
            if bkw > kw or kw % bkw or bkw % wpg:
                continue
            for bn in (1024, 512, 256):
                if n_stored % bn or bkw * bn * 8 > 8 * 1024 * 1024:
                    continue
                cands.append((bkw, bn))
        cands = sorted(set(cands))
        for m in ms:
            if gp_matmul_supported(spec, qt.scale.shape[0], m):
                # gp kernel: sweep bn AND k-steps. Full-k tiles won round
                # 2's first sweep, but the short-n shapes (wo 4096x4096,
                # w_out 11264x4096) sat 100-130 GB/s below w_in — deeper
                # k-pipelining (k_steps 2/4) is the round-3 lever to A/B
                # (round-2 verdict #2a). Constraints: bkw must keep
                # whole groups per step (Gt = G/k_steps exact) and the
                # kernel's 4-word sublane unit.
                G_ = qt.scale.shape[0]
                bkws = [kw]
                for ks in (2, 4):
                    bkw_ = kw // ks
                    if not (kw % ks == 0 and G_ % ks == 0 and bkw_ % 4 == 0):
                        continue
                    gt = G_ // ks
                    # split-layout k-tiles must keep the per-plane scale
                    # blocks Mosaic-blockable, or the kernel driver
                    # silently falls back to full-k and the sweep would
                    # measure a mislabeled candidate
                    if spec.layout == "hsplit" and gt % 2 != 0:
                        continue
                    if spec.layout == "qsplit" and (
                            gt % 4 != 0 or (gt // 4) % 8 != 0):
                        continue
                    bkws.append(bkw_)
                mcands = [(bkw_, bn) for bkw_ in bkws
                          for bn in (1024, 512, 384, 256)
                          if n_stored % bn == 0]
                # hsplit shapes tune under their own key namespace so a
                # sweep never overwrites pair-layout picks (the runtime
                # reads gph: first and falls back to gp:)
                pref = {"hsplit": "gph", "qsplit": "gpq"}.get(
                    spec.layout, "gp")
                key = f"{pref}:{m}:{kw}:{n_stored}"
            elif gp3_matmul_supported(spec, qt.scale.shape[0], m):
                # gp3 (int3/u16): bn-only sweep under its own key (the
                # runtime reads 'gp3:...'; plain keys would be dead).
                # On-chip sweep found wide tiles win (docs/PERF.md)
                mcands = [(kw, bn) for bn in (2048, 1024, 512, 256)
                          if n_stored % bn == 0]
                key = f"gp3:{m}:{kw}:{n_stored}"
            else:
                mcands = cands
                key = f"{m}:{kw}:{n_stored}"
            if cands_override:
                # trimmed sweep: the tunnel pays minutes of compile per
                # candidate executable, so callers can restrict to a
                # short list of known-promising configs
                mcands = [c for c in mcands if tuple(c) in
                          {tuple(o) for o in cands_override}]
            on_tpu = jax.default_backend() not in ("cpu",)
            ranked = []  # (t, (bkw, bn))
            for bkw, bn in mcands:
                t0c = time.perf_counter()
                try:
                    t = (_bench_variant_stacked(qts, m, bkw, bn)
                         if stacked else _bench_variant(qt, m, bkw, bn))
                except Exception as e:  # compile failure for this variant
                    if verbose:
                        print(f"  ({bkw},{bn}): failed {type(e).__name__}")
                    continue
                gbps = _implied_gbps(qt, t)
                if on_tpu and gbps > _IMPLAUSIBLE_FACTOR * SPEC_BW:
                    # faster than the memory system: a probe artifact,
                    # not a schedule — never let it win
                    if verbose:
                        print(f"  k={k} n={n} m={m} blocks=({bkw},{bn}): "
                              f"REJECTED implausible {gbps/1e9:.0f} GB/s")
                    continue
                if verbose:
                    print(f"  k={k} n={n} m={m} blocks=({bkw},{bn}): "
                          f"{t*1e6:.1f} us ({gbps/1e9:.0f} GB/s) "
                          f"[probe {time.perf_counter()-t0c:.0f}s]",
                          flush=True)
                ranked.append((t, (bkw, bn)))
            if not ranked:
                continue
            ranked.sort()
            best_t, best = ranked[0]
            runner = ranked[1][1] if len(ranked) > 1 else None
            validated = False
            if validate:
                # immediate same-process re-measure of the winner: a
                # contention artifact won't reproduce; a real schedule
                # advantage will
                try:
                    t2 = (_bench_variant_stacked(qts, m, best[0], best[1])
                          if stacked else
                          _bench_variant(qt, m, best[0], best[1]))
                    validated = (
                        abs(t2 - best_t) / max(min(t2, best_t), 1e-12) <= 0.25
                        and not (on_tpu and _implied_gbps(qt, t2)
                                 > _IMPLAUSIBLE_FACTOR * SPEC_BW)
                    )
                    best_t = min(best_t, t2) if validated else best_t
                except Exception:
                    validated = False
                if verbose and not validated:
                    print(f"  k={k} n={n} m={m}: winner {best} did NOT "
                          f"reproduce (flagged validated=false)")
            table[key] = {
                "blocks": list(best),
                "gbps": round(_implied_gbps(qt, best_t) / 1e9, 1),
                "validated": bool(validated),
                "runner_up": list(runner) if runner else None,
            }
            if stacked:
                table[key]["stacked"] = True
            if checkpoint_path:
                # persist after EVERY entry: a sweep killed by its
                # timeout (each tunnel probe costs ~a minute of compile)
                # keeps everything it measured
                merged = {}
                if os.path.exists(checkpoint_path):
                    try:
                        with open(checkpoint_path) as f:
                            merged = json.load(f)
                    except Exception:
                        merged = {}
                merged.update(table)
                tmp = checkpoint_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(merged, f, indent=1, sort_keys=True)
                os.replace(tmp, checkpoint_path)
    return table


def model_shapes(cfg):
    H, F = cfg.hidden_size, cfg.intermediate_size
    d, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    gated = cfg.act == "silu_gated"
    return sorted({
        (H, (nh + 2 * nkv) * d),
        (nh * d, H),
        (H, 2 * F if gated else F),
        (F, H),
        (H, cfg.vocab_size),
    })


def main(argv=None):
    ap = argparse.ArgumentParser("mlc_llm_tpu.tune")
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--m", type=int, action="append", default=None)
    ap.add_argument("--stacked", action="store_true",
                    help="measure through the layer-stacked kernel over "
                         "cycled stacked copies (reliable for <20 MB "
                         "shapes that otherwise pin in VMEM)")
    ap.add_argument("-o", "--out", default=TABLE_PATH)
    args = ap.parse_args(argv)

    from .models import get_config

    cfg = get_config(args.model)
    ms = tuple(args.m) if args.m else (1,)
    table = tune_shapes(model_shapes(cfg), args.quantization, ms,
                        stacked=args.stacked, checkpoint_path=args.out)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.update(table)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    print(f"wrote {len(table)} entries to {args.out}")


if __name__ == "__main__":
    main()
