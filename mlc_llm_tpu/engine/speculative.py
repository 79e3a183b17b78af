"""Prompt-lookup speculative decoding (greedy-exact).

Beyond the reference's capability set (it decodes strictly one token
per forward pass, cpp/llm_chat.cc:687-715): batch-1 decode on TPU is
HBM-bandwidth-bound — one forward pass at S=K reads the same packed
weights as S=1 — so verifying K drafted tokens in one pass emits up to
K tokens for ~one step's traffic whenever the draft is right.

The drafter is prompt-lookup (n-gram) speculation: propose the tokens
that followed the most recent occurrence of the current suffix n-gram
in the sequence's own history. No draft model, no extra weights, and
exactness is trivial to guarantee: verification accepts a draft token
only when it equals the model's own greedy argmax, so the emitted
stream is IDENTICAL to plain greedy decode token for token (tested in
tests/test_speculative.py). Repetitive text (code, lists, quoting, RAG)
accepts long runs; adversarially random text degrades to one token per
pass — the same cost as plain decode using the same program.

Exactness fine print: "the model's own greedy argmax" means the argmax
of the VERIFY pass (S=K). The S=1 decode program tiles its kernels
differently, so its logits can differ from the verify pass's in the
last bits; on real weights the argmax margins dwarf this, but on
fabricated random weights (near-zero margins) an argmax TIE can break
differently between the two programs and the spec stream diverges from
the S=1 loop's at that tie. scripts/spec_bench.py reports the match as
a metric instead of asserting it on TPU for this reason.

Mechanics per pass (slot-contiguous cache, batch 1):
  feed X = [t_last, d1 .. d_{K-1}]   (S = K static; pad when fewer)
  logits = forward(X, seq_lens=0, last_only=False)  -> argmax out[0..K-1]
  a = longest prefix with out[i] == d_{i+1}
  emit d1..d_a, then out[a] (the model's own token — correction or bonus)
  advance lengths by the number of tokens the stream actually CONSUMED
  (m when the pass continues or ends by the max_new_tokens cap; m+2
  when a stop token ends it, matching the plain loop's dispatch-ahead
  feed of the stop token). Rows written past the advanced length are
  junk BELOW the valid length — every future pass rewrites its own
  positions before attending, the engine's standing invariant.

seq_lens=0 keeps device lengths fixed during the pass so acceptance can
be decided host-side from K token ids (one tiny readback — the same
per-step readback budget as the plain decode loop).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def rtt_gate_ok(engine, threshold_ms: Optional[float] = None) -> bool:
    """Deployment gate: engage speculation only where it can actually win.

    Prompt-lookup speculation is HOST-DRIVEN — every verify pass costs
    one host<->device round trip (the drafter needs the verified ids
    back) — while the plain decode loop runs fully pipelined on device.
    On a tunneled/remote chip the RTT alone spans several device steps,
    so at ~2 tokens/pass speculation is a net LOSS there (round-3
    on-chip capture, scripts/spec_bench.py: 51.3 tok/s vs the pipelined
    loop's 137; docs/PARITY.md). The gate measures the RTT once per
    engine with a trivial program and enables speculation only when it
    is small (local chip / CPU). MLC_SPEC_FORCE=1 overrides (used by
    spec_bench to measure the host-driven paths regardless);
    MLC_SPEC_RTT_GATE_MS tunes the threshold (default 2 ms).
    """
    import os
    import time

    if os.environ.get("MLC_SPEC_FORCE") == "1":
        return True
    cached = getattr(engine, "_spec_rtt_ok", None)
    if cached is not None:
        return cached
    if threshold_ms is None:
        threshold_ms = float(os.environ.get("MLC_SPEC_RTT_GATE_MS", "2.0"))
    triv = jax.jit(lambda x: x + 1)
    float(triv(jnp.float32(0.0)))  # compile outside the timed window
    t0 = time.perf_counter()
    for i in range(3):
        float(triv(jnp.float32(i)))
    rtt_ms = (time.perf_counter() - t0) / 3 * 1e3
    ok = rtt_ms <= threshold_ms
    engine._spec_rtt_ok = ok
    if not ok:
        import logging

        logging.getLogger("mlc_llm_tpu").info(
            "speculative decoding disabled: host-device RTT %.1f ms > "
            "%.1f ms gate (the pipelined on-device loop is faster at "
            "this RTT; set MLC_SPEC_FORCE=1 to override)",
            rtt_ms, threshold_ms)
    return ok


class NgramDrafter:
    """Propose continuation tokens by matching the current suffix
    n-gram against the sequence's own history (prompt + generated)."""

    def __init__(self, history: List[int], max_ngram: int = 3):
        self.history = list(history)
        self.max_ngram = max_ngram

    def extend(self, toks: List[int]) -> None:
        self.history.extend(toks)

    def propose(self, k: int) -> List[int]:
        """Up to k draft tokens (possibly fewer / empty)."""
        h = self.history
        for n in range(min(self.max_ngram, len(h) - 1), 0, -1):
            suffix = h[-n:]
            # most recent earlier occurrence of the suffix
            for i in range(len(h) - n - 1, -1, -1):
                if h[i:i + n] == suffix:
                    out = h[i + n: i + n + k]
                    if out:
                        return out
                    break
        return []


def _make_verify(engine):
    """Jitted verify/advance programs, CACHED ON THE ENGINE: a fresh
    jax.jit wrapper has its own compile cache, so rebuilding per call
    would re-trace and re-compile every generation (seconds per request
    on the tunneled chip)."""
    cached = getattr(engine, "_speculative_programs", None)
    if cached is not None:
        return cached
    cfg = engine.cfg
    from ..models.transformer import forward

    @partial(jax.jit, donate_argnames=("cache",),
             static_argnames=("attn_window",))
    def verify(params, tokens, cache, attn_window=None):
        # seq_lens=0: write KV rows in place but do NOT advance lengths
        # (acceptance is decided host-side afterwards)
        logits, cache = forward(
            params, cfg, tokens, cache,
            seq_lens=jnp.zeros((tokens.shape[0],), jnp.int32),
            last_only=False, attn_window=attn_window,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    @partial(jax.jit, donate_argnames=("cache",))
    def advance(cache, n):
        return dataclasses.replace(cache, lengths=cache.lengths + n)

    engine._speculative_programs = (verify, advance)
    return verify, advance


def speculative_stream(
    engine,
    prompt: List[int],
    max_new_tokens: int = 128,
    draft_k: int = 8,
    stop_tokens: Optional[set] = None,
    stats: Optional[dict] = None,
    reset: bool = True,
):
    """Greedy generation with prompt-lookup speculation (batch 1),
    yielding tokens as they are emitted.

    Emits exactly the plain-greedy token stream. draft_k is the STATIC
    verify width (one compiled program regardless of how many drafts a
    pass actually carries — short drafts are padded and their tail
    ignored). reset=False appends to the slot's existing KV state
    (multi-turn chat), mirroring engine.prefill's contract.
    """
    import time

    assert engine.max_batch == 1, "speculative path is batch-1"
    assert engine.kv_layout == "slot", "speculative path needs slot KV"
    stop = set(stop_tokens or ()) | set(engine.cfg.stop_tokens)
    verify, advance = _make_verify(engine)

    logits = engine.prefill([prompt], reset=reset)
    t_last = int(jnp.argmax(logits[0]))
    n_out = 0
    if t_last in stop:
        if stats is not None:
            stats.update(passes=0, accepted_drafts=0, tokens=0)
        return
    t0 = time.perf_counter()
    K = draft_k
    passes = accepted = 0
    try:
        yield t_last
        n_out = 1
        drafter = NgramDrafter(list(prompt) + [t_last])
        # device lengths after prefill (t_last not yet fed); one host
        # readback per turn — append mode starts past the prior turns
        cur_len = int(np.asarray(engine.cache.lengths)[0])

        while n_out < max_new_tokens:
            if cur_len + 1 >= engine.max_seq_len:
                break  # window genuinely full (plain greedy stops too)
            # near the window edge, shrink to single-token passes (a
            # second S=1 program) instead of stopping K tokens early —
            # keeps the stream token-for-token equal to plain greedy
            K_eff = K if cur_len + K < engine.max_seq_len else 1
            drafts = drafter.propose(K_eff - 1) if K_eff > 1 else []
            nfeed = 1 + len(drafts)
            toks = np.zeros((1, K_eff), np.int32)
            toks[0, 0] = t_last
            if drafts:
                toks[0, 1:nfeed] = drafts
            window = engine.decode_window(
                min(cur_len + K_eff, engine.max_seq_len))
            got, engine.cache = verify(
                engine.params, jnp.asarray(toks), engine.cache,
                attn_window=window,
            )
            got = np.asarray(got)[0]  # [K] argmax tokens
            # longest accepted draft prefix
            a = 0
            while a < len(drafts) and got[a] == drafts[a]:
                a += 1
            emitted = list(drafts[:a]) + [int(got[a])]
            passes += 1
            accepted += a
            # Decide what this pass CONSUMES before advancing lengths —
            # advancing by a+1 unconditionally left accepted-but-never-
            # emitted tokens in the KV, so a later append turn attended
            # to context plain greedy never had (review finding r3).
            # Invariant between passes: lengths = prompt + emitted - 1
            # (the last emitted token is not yet fed). Terminal lengths
            # mirror the plain decode loop exactly:
            #   cap end:  lengths = prompt + emitted - 1 (last not fed)
            #   stop end: lengths = prompt + emitted + 1 (the plain
            #     loop's dispatch-ahead feeds the stop token itself
            #     before the stop is detected host-side)
            m = 0
            hit_stop = False
            for t in emitted:
                if t in stop:
                    hit_stop = True
                    break
                if n_out + m >= max_new_tokens:
                    break
                m += 1
            if hit_stop:
                # rows for t_last + m emitted tokens are valid; the stop
                # token must ALSO land in KV (plain parity). A stop that
                # was a draft is already written at row m+1; a stop that
                # was the model's own token (got[a]) was never fed —
                # feed it with the S=1 program, like plain's overshoot
                # dispatch.
                if m < a:  # stop was drafts[m]: its row is written
                    engine.cache = advance(engine.cache, jnp.int32(m + 2))
                    cur_len += m + 2
                else:      # stop == got[a]
                    engine.cache = advance(engine.cache, jnp.int32(m + 1))
                    _, engine.cache = verify(
                        engine.params,
                        jnp.asarray([[emitted[m]]], np.int32),
                        engine.cache,
                        attn_window=engine.decode_window(
                            min(cur_len + m + 2, engine.max_seq_len)),
                    )
                    engine.cache = advance(engine.cache, jnp.int32(1))
                    cur_len += m + 2
            else:
                engine.cache = advance(engine.cache, jnp.int32(m))
                cur_len += m
            for t in emitted[:m]:
                yield t
                n_out += 1
            if hit_stop or n_out >= max_new_tokens:
                break
            drafter.extend(emitted)
            t_last = emitted[-1]
    finally:
        # tok/s bookkeeping matches the plain decode loop (stats.text()
        # powers the CLI /stats line); runs even when the consumer
        # abandons the stream (stop string found in the session layer)
        engine.stats.decode_time += time.perf_counter() - t0
        engine.stats.decode_tokens += max(0, n_out - 1)
        if stats is not None:
            stats.update(passes=passes, accepted_drafts=accepted,
                         tokens=n_out)


def generate_speculative(
    engine,
    prompt: List[int],
    max_new_tokens: int = 128,
    draft_k: int = 8,
    stop_tokens: Optional[set] = None,
    stats: Optional[dict] = None,
    reset: bool = True,
) -> List[int]:
    """List-returning wrapper over speculative_stream."""
    return list(speculative_stream(
        engine, prompt, max_new_tokens=max_new_tokens, draft_k=draft_k,
        stop_tokens=stop_tokens, stats=stats, reset=reset,
    ))
