"""Headline benchmark: Vicuna-7B q4bf16 batch-1 decode tok/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N, ...}

vs_baseline is measured tok/s divided by the BASELINE.md target
(90% of the per-chip HBM-bandwidth roofline, where roofline =
HBM_BW / bytes-read-per-decode-token: packed weights + scales + KV).

Timing methodology: the tunneled TPU platform in this environment has
~28 ms host<->device RTT and a block_until_ready that does not wait, so
the decode loop runs ON DEVICE via lax.scan and throughput is computed
from the time difference between a long and a short scan (cancels the
fixed RTT + dispatch overhead). TTFT is RTT-corrected.
"""

import json
import os
import subprocess
import sys
import time

# v5e per-chip HBM bandwidth (public spec: 819 GB/s)
HBM_BW = 819e9

HEADLINE_METRIC = "decode_tok_s_vicuna7b_q4bf16_b1"


def _progress(section: str) -> None:
    # stderr breadcrumb: a timeout-killed run (the final JSON prints only
    # at the end) still leaves evidence of which section it died in
    print(f"[bench {time.strftime('%H:%M:%S')}] section: {section}",
          file=sys.stderr, flush=True)


def _fail_json(error: str, detail: str = "") -> None:
    """Always print a parseable one-line JSON, even when the backend is dead.

    Analog of the reference runtime's stats line, which always prints
    (reference cpp/llm_chat.cc:547-556): a failed measurement is still a
    structured record, not a stack trace.
    """
    print(json.dumps({
        "metric": HEADLINE_METRIC,
        "value": None,
        "unit": "tok/s",
        "vs_baseline": None,
        "error": error,
        "detail": detail[:300],
    }))


def _probe_backend(timeout_s: float = 240.0, attempts: int = 3) -> str:
    """Check that JAX backend init completes, in a KILLABLE subprocess.

    The round-2 failure mode was a *hang* inside TPU backend init when the
    tunnel died — an in-process try/except can't recover from that, so the
    probe runs `jax.default_backend()` in a child process under a timeout
    and retries. Returns the backend name, or raises RuntimeError.
    """
    code = "import jax; print(jax.default_backend())"
    last = ""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if r.returncode == 0 and r.stdout.strip():
                return r.stdout.strip().splitlines()[-1]
            last = (r.stderr or "").strip().splitlines()[-1] if r.stderr else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"backend init timed out after {timeout_s:.0f}s (attempt {i + 1})"
        if i + 1 < attempts:  # no pointless sleep after the final attempt
            time.sleep(5 * (i + 1))
    raise RuntimeError(last or "backend probe failed")


# importing jax does NOT init the backend (safe even when the TPU tunnel
# is down); backend init happens at jax.default_backend()/jax.devices(),
# which main() only reaches after _probe_backend() has succeeded
import jax
import jax.numpy as jnp
import numpy as np


def _tree_device_bytes(tree) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            if leaf.dtype in (jnp.uint4, jnp.int4):
                total += leaf.size // 2
            else:
                total += leaf.size * leaf.dtype.itemsize
    return total


def _readback(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    # CPU smoke-test mode: the TPU plugin in this image ignores
    # JAX_PLATFORMS, so force the config directly (backends are lazy)
    if os.environ.get("MLC_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    # 1) probe backend init in a killable subprocess (round-2 outage mode:
    #    in-process init HANGS when the tunnel dies — cannot be try/except'd)
    elif not os.environ.get("MLC_BENCH_SKIP_PROBE"):
        try:
            _probe_backend()
        except RuntimeError as e:
            _fail_json("backend_unavailable", str(e))
            return
    # 2) anything else still prints a structured failure line, rc=0
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — the JSON line must always print
        _fail_json(type(e).__name__, str(e))


def _run():
    from functools import partial

    from mlc_llm_tpu.models import (
        forward,
        get_config,
        init_kv_cache,
        init_random_params,
    )
    from mlc_llm_tpu.ops.sampling import sample_token

    backend = jax.default_backend()
    on_cpu = backend == "cpu"
    cfg = get_config("vicuna-v1-7b")
    context_len = 128
    n_short, n_long = 8, 72
    if on_cpu:
        cfg = cfg.replace(num_layers=2, max_seq_len=256)
        n_short, n_long = 2, 6

    params = init_random_params(cfg, "q4bf16", seed=0, fabricate=True)
    # group-pad so w_out (344 groups at 7B) gets full-width gp-kernel
    # chunks (the engine does this at init; bench drives forward() raw)
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor as _QT
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups as _pad

    params = jax.tree.map(
        lambda x: _pad(x) if isinstance(x, _QT) else x,
        params,
        is_leaf=lambda x: isinstance(x, _QT),
    )
    max_len = min(cfg.max_seq_len, 2048)
    cache = init_kv_cache(cfg, batch=1, max_len=max_len)

    # measure tunnel RTT with a trivial program
    triv = jax.jit(lambda x: x + 1)
    _readback(triv(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(3):
        _readback(triv(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / 3

    # measure ACHIEVABLE HBM read bandwidth. The chip is time-shared:
    # a single probe can catch a contended window (596 GB/s observed
    # minutes from 808 GB/s) and then falsely flag honest sections as
    # implausible — so probe at the START and again at the END of the
    # run and use the MAX (the guard needs the chip's ceiling, not its
    # most congested moment)
    def probe_hbm():
        try:
            buf = jax.random.bits(
                jax.random.PRNGKey(1), (256, 1024, 1024), jnp.uint32)
            red = jax.jit(lambda w, s: (w >> 4).sum(dtype=jnp.uint32) + s)
            acc = red(buf, jnp.uint32(0))
            _readback(acc)

            def reduce_n(n):
                nonlocal acc
                t0 = time.perf_counter()
                for _ in range(n):
                    acc = red(buf, acc)
                _readback(acc)
                return time.perf_counter() - t0

            t2, t10 = reduce_n(2), reduce_n(10)
            bw = 8 * buf.nbytes / max(t10 - t2, 1e-6)
            del buf, acc
            # discard physically implausible probe readings (spec 819)
            return bw if 100e9 < bw < 1.1e12 else None
        except Exception:
            return None

    measured_bw = probe_hbm() if not on_cpu else None

    @partial(jax.jit,
             static_argnames=("last_only", "attn_window", "prefill_flash"))
    def prefill(params, tokens, seq_lens, cache, last_only=True,
                attn_window=None, prefill_flash=False):
        # reset prefill: the context length is an exact static window;
        # prefill_flash routes ctx >= 1024 to the causal flash kernel
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens,
                       last_only=last_only, attn_window=attn_window,
                       prefill_flash=prefill_flash)

    @partial(jax.jit, donate_argnames=("cache",), static_argnames=("window",))
    def decode_n(params, tok, cache, key, n, window=None):
        # dynamic-bound fori_loop: ONE executable serves any n (keeps
        # Pallas/Mosaic compile cost to a single pass); window bounds
        # the attention read statically (ctx 128 + 72 steps < 256)
        def body(_, carry):
            tok, cache, key = carry
            logits, cache = forward(
                params, cfg, tok, cache, last_only=True, attn_window=window
            )
            key, sub = jax.random.split(key)
            nxt = sample_token(logits, sub, 0.7, 0.95)
            return (nxt[:, None], cache, key)

        tok, cache, key = jax.lax.fori_loop(0, n, body, (tok, cache, key))
        return tok, cache

    prompt = jnp.asarray(
        np.random.default_rng(0).integers(10, 1000, size=(1, context_len)), jnp.int32
    )
    seq_lens = jnp.full((1,), context_len, jnp.int32)

    # --- TTFT: prefill + first sampled token, RTT-corrected ----------------
    _progress("ttft")
    logits, cache = prefill(params, prompt, seq_lens, cache,
                            attn_window=context_len,
                            prefill_flash=True)  # compile
    tok0 = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    _readback(tok0)
    cache = init_kv_cache(cfg, batch=1, max_len=max_len)
    t0 = time.perf_counter()
    logits, cache = prefill(params, prompt, seq_lens, cache,
                            attn_window=context_len,
                            prefill_flash=True)
    first = sample_token(logits, jax.random.PRNGKey(1), 0.0, 1.0, greedy=True)
    _readback(first)
    ttft_ms = (time.perf_counter() - t0 - rtt) * 1e3

    # TTFT across context buckets (512/1024/2048): no >2x-per-doubling cliff
    ttft_buckets = {}
    if not on_cpu:
        for ctx in (512, 1024, 2048):
            try:
                p_ctx = jnp.asarray(
                    np.random.default_rng(1).integers(10, 1000, size=(1, ctx)),
                    jnp.int32,
                )
                sl = jnp.full((1,), ctx, jnp.int32)
                c_ctx = init_kv_cache(cfg, batch=1, max_len=max_len)
                lg, c_ctx = prefill(params, p_ctx, sl, c_ctx,
                                    attn_window=ctx, prefill_flash=True)  # compile
                _readback(jnp.argmax(lg, -1))
                c_ctx = init_kv_cache(cfg, batch=1, max_len=max_len)
                t0 = time.perf_counter()
                lg, c_ctx = prefill(params, p_ctx, sl, c_ctx,
                                    attn_window=ctx, prefill_flash=True)
                f = sample_token(lg, jax.random.PRNGKey(1), 0.0, 1.0, greedy=True)
                _readback(f)
                ttft_buckets[ctx] = round((time.perf_counter() - t0 - rtt) * 1e3, 1)
                del c_ctx
            except Exception:
                break

    # --- decode throughput: long-minus-short on-device scans ---------------
    _progress("decode_b1")
    key = jax.random.PRNGKey(0)
    tok = first[:, None]

    window = None if on_cpu else 256  # ctx 128 + 80 steps fits

    def timed(n):
        nonlocal cache
        t0 = time.perf_counter()
        out_tok, cache = decode_n(params, tok, cache, key, n, window=window)
        _readback(out_tok)
        return time.perf_counter() - t0

    timed(2)  # compile pass
    # the tunneled chip time-shares with other tenants and sustained
    # bandwidth swings run-to-run; report the best of 3 long-minus-short
    # pairs (each pair is internally consistent) AND the median, so a
    # single lucky pair can't set the headline unnoticed
    cands = []
    for _ in range(3 if not on_cpu else 1):
        t_short = timed(n_short)
        t_long = timed(n_long)
        d = (t_long - t_short) / (n_long - n_short)
        if d > 0:
            cands.append(d)
    if not cands:
        # every long-minus-short delta was non-positive: chip contention or
        # a broken clock. That is a FAILED measurement — report it as such
        # instead of the absurd tok/s a tiny-epsilon fallback would imply.
        _fail_json("measurement_failed",
                   "all long-minus-short deltas non-positive (contention?)")
        return
    per_step = min(cands)
    tok_s = 1.0 / per_step
    tok_s_median = 1.0 / sorted(cands)[len(cands) // 2]

    # --- roofline ----------------------------------------------------------
    weight_bytes = _tree_device_bytes(params)
    kv_bytes_per_tok = (
        2 * cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
        * (context_len + n_long // 2) * 2  # bf16, avg length over the run
    )
    bytes_per_token = weight_bytes + kv_bytes_per_tok
    roofline = HBM_BW / bytes_per_token
    target = 0.9 * roofline

    result = {
        "metric": "decode_tok_s_vicuna7b_q4bf16_b1",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / target, 4),
        "backend": backend,
        "value_median": round(tok_s_median, 2),
        "ttft_ms_ctx128": round(ttft_ms, 1),
        **{f"ttft_ms_ctx{c}": v for c, v in ttft_buckets.items()},
        "roofline_tok_s": round(roofline, 1),
        "pct_of_spec_roofline": round(100 * tok_s / roofline, 1),
        "weight_bytes": weight_bytes,
        "rtt_ms": round(rtt * 1e3, 1),
        "note": "vs_baseline = tok_s/(0.9*819GB/s roofline); on-device loop, "
                "long-minus-short timing. TTFT (the only definition used "
                "anywhere) = wall time of prefill dispatch + first sampled "
                "token readback, minus one measured host-device RTT",
    }
    _pending_guards = []

    def guard(tag: str, tok_s_val, bytes_per_step: int, batch: int = 1):
        """tune.py's plausibility rule, applied to the BENCH itself
        (round-3 verdict #2): a section whose implied HBM traffic
        exceeds 1.05x this session's measured bandwidth is flagged —
        such a number is a timing artifact, not a throughput. Flags are
        resolved at the END of the run against the best of the start/
        end probes, so one contended probe window can't mark honest
        sections implausible.
        """
        if tok_s_val is None:
            return
        _pending_guards.append((tag, (tok_s_val / batch) * bytes_per_step))

    guard("value", tok_s, bytes_per_token)

    # --- q3 + int8 KV decode (north-star config 4, single-chip cut) --------
    _progress("q3_int8kv")
    # (the 8-chip tensor-sharded variant of this config is exercised by
    # the multi-chip dryrun; one chip is what exists here)
    if not on_cpu:
        try:
            del cache
            params3 = init_random_params(cfg, "q3bf16_s16", seed=0, fabricate=True)
            params3 = jax.tree.map(
                lambda x: _pad(x) if isinstance(x, _QT) else x,
                params3, is_leaf=lambda x: isinstance(x, _QT),
            )
            # same cache geometry as the q4 headline (max_len 2048,
            # window-256 decode), so the two configs are directly
            # comparable (round-3 verdict weak #5: q3 previously ran a
            # 512-slot cache while q4 got the full treatment)
            cache3 = init_kv_cache(cfg, batch=1, max_len=max_len,
                                   dtype=jnp.int8)
            logits3, cache3 = prefill(params3, prompt, seq_lens, cache3,
                                      attn_window=context_len,
                            prefill_flash=True)
            tok3 = jnp.argmax(logits3, -1).astype(jnp.int32)[:, None]
            def _t3(n):
                nonlocal cache3, tok3
                t0 = time.perf_counter()
                out_tok, cache3 = decode_n(params3, tok3, cache3, key, n, window=window)
                _readback(out_tok)
                return time.perf_counter() - t0

            _t3(2)  # compile
            cands3 = []
            for _ in range(2):
                a = _t3(n_short)
                b = _t3(n_long)
                if b - a > 0:
                    cands3.append((b - a) / (n_long - n_short))
            q3_bytes = _tree_device_bytes(params3)
            if cands3:
                result["q3_int8kv_tok_s"] = round(1 / min(cands3), 2)
                result["q3_int8kv_tok_s_median"] = round(
                    1 / sorted(cands3)[len(cands3) // 2], 2)
                guard("q3_int8kv_tok_s", result["q3_int8kv_tok_s"],
                      q3_bytes + kv_bytes_per_tok // 2)  # int8 KV
            else:
                result["q3_int8kv_tok_s"] = None
                result["q3_error"] = "all deltas non-positive"
            result["q3_weight_bytes"] = q3_bytes
            # q3 TTFT at ctx 512 (same definition as the q4 buckets)
            try:
                p512 = jnp.asarray(
                    np.random.default_rng(1).integers(10, 1000, size=(1, 512)),
                    jnp.int32)
                sl512 = jnp.full((1,), 512, jnp.int32)
                c3b = init_kv_cache(cfg, batch=1, max_len=max_len,
                                    dtype=jnp.int8)
                lg, c3b = prefill(params3, p512, sl512, c3b,
                                  attn_window=512, prefill_flash=True)
                _readback(jnp.argmax(lg, -1))
                c3b = init_kv_cache(cfg, batch=1, max_len=max_len,
                                    dtype=jnp.int8)
                t0 = time.perf_counter()
                lg, c3b = prefill(params3, p512, sl512, c3b,
                                  attn_window=512, prefill_flash=True)
                f3 = sample_token(lg, jax.random.PRNGKey(1), 0.0, 1.0,
                                  greedy=True)
                _readback(f3)
                result["q3_ttft_ms_ctx512"] = round(
                    (time.perf_counter() - t0 - rtt) * 1e3, 1)
                del c3b
            except Exception:
                pass
            del params3, cache3
        except Exception as e:
            result["q3_error"] = f"{type(e).__name__}: {e}"[:120]
        cache = init_kv_cache(cfg, batch=1, max_len=max_len)

    # --- 8-way continuous-batching decode: slot-contiguous vs paged KV -----
    _progress("batch8")
    # (north-star config 3 + "paged KV-cache"). The two cache layouts
    # are timed with INTERLEAVED legs (slot, paged, slot, paged) in this
    # one process, so the paged/slot ratio — the ≤1.10 gate — is read
    # from adjacent pairs instead of riding cross-section drift
    # (round-3 verdict weak #3: separate sections gave 0.83x one
    # session and 0.946x the next).
    if not on_cpu:
        try:
            import dataclasses

            from mlc_llm_tpu.models.paged_cache import (
                PageAllocator,
                init_paged_kv_cache,
            )

            del cache
            prompts8 = jnp.tile(prompt, (8, 1))
            lens8 = jnp.full((8,), context_len, jnp.int32)

            # slot-contiguous: short cache (ctx 128 + ~80 steps) keeps
            # both caches + 4.2 GB weights well inside 16 GB HBM
            cache8 = init_kv_cache(cfg, batch=8, max_len=512)
            logits8, cache8 = prefill(params, prompts8, lens8, cache8,
                                      attn_window=context_len,
                            prefill_flash=True)
            tok8 = jnp.argmax(logits8, -1).astype(jnp.int32)[:, None]

            def _t8(n):
                nonlocal cache8, tok8
                t0 = time.perf_counter()
                out_tok, cache8 = decode_n(
                    params, tok8, cache8, key, n, window=window
                )
                _readback(out_tok)
                return time.perf_counter() - t0

            # paged: page-pool KV + page-table flash kernel
            ps = 128
            ppsl = 512 // ps
            paged = init_paged_kv_cache(
                cfg, 8, num_pages=8 * ppsl + 1, page_size=ps,
                max_pages_per_slot=ppsl,
            )
            alloc = PageAllocator(paged.num_pages)
            table = np.zeros(paged.page_table.shape, np.int32)
            for b in range(8):
                pg = alloc.alloc(ppsl)
                table[b, : len(pg)] = pg
            paged = dataclasses.replace(paged, page_table=jnp.asarray(table))
            logits_p, paged = prefill(params, prompts8, lens8, paged,
                                      attn_window=context_len,
                            prefill_flash=True)
            tokp = jnp.argmax(logits_p, -1).astype(jnp.int32)[:, None]

            def _tp(n):
                nonlocal paged, tokp
                t0 = time.perf_counter()
                out_tok, paged = decode_n(
                    params, tokp, paged, key, n, window=window
                )
                _readback(out_tok)
                return time.perf_counter() - t0

            # paged int8 KV: the engine's kv_layout="auto" route for
            # batched int8 configs (the paged flash kernel dequantizes
            # int8 IN the attention dots; the slot einsum materializes
            # the dequantized window and loses — round-4 verdict #2)
            paged_i8 = init_paged_kv_cache(
                cfg, 8, num_pages=8 * ppsl + 1, page_size=ps,
                max_pages_per_slot=ppsl, dtype=jnp.int8,
            )
            alloc_i8 = PageAllocator(paged_i8.num_pages)
            table_i8 = np.zeros(paged_i8.page_table.shape, np.int32)
            for b in range(8):
                pg = alloc_i8.alloc(ppsl)
                table_i8[b, : len(pg)] = pg
            paged_i8 = dataclasses.replace(
                paged_i8, page_table=jnp.asarray(table_i8))
            logits_i8, paged_i8 = prefill(params, prompts8, lens8, paged_i8,
                                          attn_window=context_len,
                                          prefill_flash=True)
            toki8 = jnp.argmax(logits_i8, -1).astype(jnp.int32)[:, None]

            def _ti8(n):
                nonlocal paged_i8, toki8
                t0 = time.perf_counter()
                out_tok, paged_i8 = decode_n(
                    params, toki8, paged_i8, key, n, window=window
                )
                _readback(out_tok)
                return time.perf_counter() - t0

            _t8(2)  # compile+warm all executables BEFORE any timed leg
            _tp(2)
            _ti8(2)
            cands8, candsp, candsi, ratios = [], [], [], []
            for _ in range(2):
                a8, b8 = _t8(n_short), _t8(n_long)
                ap, bp = _tp(n_short), _tp(n_long)
                ai, bi = _ti8(n_short), _ti8(n_long)
                d8 = (b8 - a8) / (n_long - n_short)
                dp = (bp - ap) / (n_long - n_short)
                di = (bi - ai) / (n_long - n_short)
                if d8 > 0:
                    cands8.append(d8)
                if dp > 0:
                    candsp.append(dp)
                if di > 0:
                    candsi.append(di)
                if d8 > 0 and dp > 0:
                    ratios.append(dp / d8)  # paged cost per step vs slot
            if cands8:
                result["batch8_tok_s"] = round(8 / min(cands8), 2)
                guard("batch8_tok_s", result["batch8_tok_s"],
                      weight_bytes + 8 * kv_bytes_per_tok, batch=8)
            else:
                result["batch8_tok_s"] = None
                result["batch8_error"] = "all deltas non-positive"
            if candsp:
                result["paged_batch8_tok_s"] = round(8 / min(candsp), 2)
                guard("paged_batch8_tok_s", result["paged_batch8_tok_s"],
                      weight_bytes + 8 * kv_bytes_per_tok, batch=8)
            else:
                result["paged_batch8_tok_s"] = None
                result["paged_batch8_error"] = "all deltas non-positive"
            if candsi:
                result["batch8_int8kv_tok_s"] = round(8 / min(candsi), 2)
                guard("batch8_int8kv_tok_s", result["batch8_int8kv_tok_s"],
                      weight_bytes + 8 * kv_bytes_per_tok // 2, batch=8)
            else:
                result["batch8_int8kv_tok_s"] = None
            if ratios:
                # interleaved same-process ratio: >1.0 means paged costs
                # more per step; the PARITY gate is <= 1.10
                result["paged_over_slot_step_ratio"] = round(min(ratios), 3)
        except Exception as e:
            result["paged_batch8_error"] = f"{type(e).__name__}: {e}"[:120]
    # --- serving latency percentiles (BASELINE.md "p50 TTFT tracked") ------
    _progress("serving")
    # One Poisson load point through the continuous-batching scheduler
    # (adaptive multi-step), so the driver artifact itself carries
    # serving percentiles instead of builder-session logs (round-4
    # verdict item 5). Kept small: 32 requests at 8 rps, ~10 s of load.
    if not on_cpu:
        try:
            from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
            from mlc_llm_tpu.engine.scheduler import (
                ContinuousBatchingScheduler,
            )

            # free the microbench caches: engine KV (8x512) + weights +
            # the batch-8 section's two caches would crowd 16 GB HBM
            # (rebind-to-None works whether or not the paged section
            # defined them; del would NameError on early failure)
            cache = cache8 = paged = tok8 = tokp = None  # noqa: F841
            logits8 = logits_p = None  # noqa: F841
            eng = InferenceEngine(cfg, params, max_batch=8, max_seq_len=512)
            sched = ContinuousBatchingScheduler(
                eng, decode_ahead=2, multi_step="auto")
            # warm every adaptive-K block program OUTSIDE the timed
            # window (a mid-window Mosaic compile otherwise lands in
            # every queued request's TTFT; persistent cache makes this
            # cheap on later sessions)
            from mlc_llm_tpu.serve import multi_step_compile_ks
            eng.precompile(multi_step=multi_step_compile_ks("auto"))
            rng_s = np.random.default_rng(3)
            gen_s = GenerationConfig(
                max_new_tokens=32, temperature=0.7, top_p=0.95, seed=7)

            def _mk():
                return rng_s.integers(10, 1000, size=128).tolist()

            warm = [sched.submit(_mk(), gen_s) for _ in range(8)]
            sched.run()
            # second, STAGGERED warm: a full batch only executes the
            # G=8 grouped-admission and K=max block programs; the first
            # mid-load G=2/4 clump or partial-K block otherwise pays
            # its first-execution setup inside the measured window
            # (observed as 0.5-2 s TTFT stragglers)
            w2 = [sched.submit(_mk(), gen_s) for _ in range(2)]
            for _ in range(3):
                sched.step()
            w2 += [sched.submit(_mk(), gen_s) for _ in range(4)]
            sched.run()  # compile every program OUTSIDE the timed window
            n_req, lam = 32, 8.0
            arrivals = np.cumsum(rng_s.exponential(1.0 / lam, size=n_req))
            reqs = []
            t_start = time.perf_counter()
            nxt_i = 0
            while nxt_i < n_req or sched.has_work():
                now = time.perf_counter() - t_start
                while nxt_i < n_req and arrivals[nxt_i] <= now:
                    reqs.append(sched.submit(_mk(), gen_s))
                    nxt_i += 1
                if sched.has_work():
                    sched.step()
                elif nxt_i < n_req:
                    time.sleep(min(0.002, arrivals[nxt_i] - now))
            t_wall = time.perf_counter() - t_start

            def _pct(xs, p):
                xs = sorted(xs)
                return xs[min(len(xs) - 1,
                              max(0, int(round(p / 100 * (len(xs) - 1)))))]

            ttfts = [r.ttft * 1e3 for r in reqs if r.ttft is not None]
            itls = [
                (r.finished_at - r.first_token_at)
                / (len(r.output) - 1) * 1e3
                for r in reqs
                if r.finished_at and r.first_token_at and len(r.output) > 1
            ]
            if ttfts:
                result["serve_p50_ttft_ms"] = round(_pct(ttfts, 50), 1)
                result["serve_p99_ttft_ms"] = round(_pct(ttfts, 99), 1)
            if itls:
                result["serve_p50_itl_ms"] = round(_pct(itls, 50), 1)
            result["serve_tok_s"] = round(
                sum(len(r.output) for r in reqs) / t_wall, 1)
            result["serve_load"] = {
                "rps": lam, "n": n_req, "prompt_len": 128,
                "max_new_tokens": 32, "multi_step": "auto",
                "decode_ahead": 2, "completed": sum(r.done for r in reqs),
            }
            del eng, sched
        except Exception as e:
            result["serve_error"] = f"{type(e).__name__}: {e}"[:120]

    # resolve the plausibility guards against the BEST probe reading
    if not on_cpu:
        bw2 = probe_hbm()
        cands_bw = [b for b in (measured_bw, bw2) if b]
        best_bw = max(cands_bw) if cands_bw else None
        if best_bw is not None:
            result["measured_hbm_gbps"] = round(best_bw / 1e9, 1)
            if bw2 is not None and measured_bw is not None:
                result["hbm_probe_spread_gbps"] = [
                    round(measured_bw / 1e9, 1), round(bw2 / 1e9, 1)]
            measured_roofline = best_bw / bytes_per_token
            result["pct_of_measured_roofline"] = round(
                100 * tok_s / measured_roofline, 1)
            for tag, implied in _pending_guards:
                if implied > 1.05 * best_bw:
                    result[f"{tag}_implausible"] = round(implied / 1e9, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
