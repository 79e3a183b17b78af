"""Continuous-batching scheduler (slot-based).

The reference runtime serves exactly one sequence (batch hard-asserted
to 1, /root/reference/mlc_llm/relax_model/llama.py:219); this scheduler
is the north-star addition: N engine slots share one batched decode
program, requests are admitted into free slots via a single-slot
prefill that leaves other slots' KV untouched, and finished slots are
recycled mid-flight.

Design notes (TPU-first):
- decode runs for ALL slots every step (inactive slots masked) — one
  static-shape program, no recompiles as batch composition changes
- admission = engine._prefill_slot: slices one slot's cache, prefills,
  splices back (other slots' state bit-identical)
- per-request temperature/top_p ride as [B] vectors into the shared
  sampling kernel; stop tokens / length limits are host-side
- KV is slot-contiguous (max_batch x max_seq_len). True paged KV is a
  planned optimization; at the target config (7B q4, 8 x 2048, bf16
  KV ~= 8 GB) slot-contiguous fits HBM alongside the weights.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from functools import partial
from typing import Callable, Deque, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import GenerationConfig, InferenceEngine


@dataclasses.dataclass
class Request:
    id: int
    prompt: List[int]
    gen: GenerationConfig
    on_token: Optional[Callable[[int], None]] = None
    # pin_slot: admit only into this (reserved) slot; append: extend the
    # slot's existing KV state instead of starting at 0 — both used by
    # scheduler-backed multi-turn ChatSessions
    pin_slot: Optional[int] = None
    append: bool = False
    # filled by the scheduler
    output: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None
    seed: int = 0  # resolved uint32 sampling seed (from gen.seed or OS)
    sampled: int = 0  # tokens sampled so far (PRNG step counter)
    start_len: int = 0  # KV tokens already in the slot before this prompt
    pf_pos: int = 0  # prompt tokens already prefilled (chunked admission)
    # prefix-cache adoption: tokens KNOWN to precede req.prompt in the
    # slot (req.prompt is trimmed to the un-cached suffix; start_len
    # covers these). Used to register the full prompt at prefill end.
    prefix_tokens: List[int] = dataclasses.field(default_factory=list)

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at


class ContinuousBatchingScheduler:
    def __init__(self, engine: InferenceEngine, seed: int = 0, slots=None,
                 prefill_chunk: Optional[int] = None,
                 speculative_k: Optional[int] = None,
                 speculative_max_batch: int = 2,
                 decode_ahead: int = 1,
                 multi_step: Optional[int] = None):
        """slots: engine slots this scheduler owns (default: all).
        Multi-host serving gives each host's scheduler its
        process_local_slots range (parallel/multihost.py) so request
        state never migrates across hosts.

        prefill_chunk: admit long prompts in chunks of this many tokens,
        ONE chunk per scheduler step, so active slots keep decoding
        between chunks (a ctx-2048 admission no longer inserts one long
        prefill between two decode steps — it inserts N short ones).
        Must be one of the engine's prefill buckets. None = whole-prompt
        admission (the round-2 behavior).

        speculative_k: batched prompt-lookup speculation (see
        engine/speculative.py): when EVERY active request is greedy and
        transient (no pinned/append sessions, no reserved slots, slot
        KV layout, all slots K tokens from the window edge), a decode
        step verifies K-token draft blocks for the whole batch in one
        forward pass — emitting up to K tokens per slot per step with
        the same weight traffic as a plain step. Token streams stay
        EXACTLY equal to plain greedy decode; steps that do not meet
        the gate run the plain pipelined path.

        multi_step: run K decode steps per device dispatch (the
        on-device multi-step serving block, engine._decode_sample_k):
        the host reads one [K, B] token matrix per dispatch instead of
        K vectors, so per-token host cost amortizes K-fold — on a
        high-RTT link this takes the serving loop from the transport
        floor toward the device-step floor. Semantics: stop detection
        and max_new_tokens lag up to K-1 tokens inside a block (the
        drain discards post-stop tokens; KV rows past a request's
        valid length are junk-but-rewritten, the engine invariant), and
        admission happens between blocks, so TTFT quantizes to the
        block wall. Engages only for transient batches (no pinned /
        append / reserved slots — same class of gate as speculation)
        and only while every active slot has K rows of window headroom;
        other steps run the plain single-step path. Token streams are
        EXACTLY those of the single-step scheduler (PRNG fold_in(seed,
        step) is position-indexed; tests pin equality).

        decode_ahead: decode dispatch-ahead depth — how many decode
        steps stay in flight before the scheduler blocks on the oldest
        readback. Depth 1 (default) reads back step i-1 while step i
        computes; on a high-RTT link (the tunneled chip: ~32 ms RTT vs
        a 6.5 ms device step) a deeper pipeline amortizes the RTT over
        D steps and the loop approaches the device-step floor. Cost:
        stop detection lags D tokens (the (slot, request-id) matching
        in _drain discards post-stop and post-recycle tokens, so
        correctness is unchanged — only up to D wasted slot-steps per
        finished request).

        speculative_max_batch: speculation only engages when at most
        this many slots are active. Measured on-chip (v5e, 7B q4bf16,
        scripts/spec_bench.py r3): 1.55x at batch 1 but 0.81x at batch
        4 — a verify pass forwards B*K tokens while acceptance stays
        ~2 tokens/slot/pass, so the per-pass cost outgrows the saved
        steps once plain batching already amortizes the weight stream."""
        self.engine = engine
        self.slots = list(slots) if slots is not None else list(
            range(engine.max_batch)
        )
        if prefill_chunk is not None and prefill_chunk not in engine.buckets:
            raise ValueError(
                f"prefill_chunk {prefill_chunk} must be one of the "
                f"engine's prefill buckets {engine.buckets}"
            )
        self.prefill_chunk = prefill_chunk
        self.speculative_k = speculative_k
        self.speculative_max_batch = speculative_max_batch
        self.decode_ahead = max(1, int(decode_ahead))
        # multi_step: int = static K; "auto" / "auto:K" = adaptive block
        # size (occupancy/backlog-driven, see _choose_k; default max 8)
        self.adaptive_multi_step = False
        if isinstance(multi_step, str):
            self.adaptive_multi_step = True
            self.multi_step = (
                int(multi_step.split(":", 1)[1]) if ":" in multi_step else 8
            )
        else:
            self.multi_step = int(multi_step) if multi_step else None

        @partial(jax.jit, donate_argnames=("cache",))
        def _advance_lengths(cache, adv):
            return dataclasses.replace(cache, lengths=cache.lengths + adv)

        self._advance_lengths = _advance_lengths

        @jax.jit
        def _merge_first_token(cur, slot, tok):
            # device-side scatter of an admission's first sampled token
            # into the current-token vector: the old host-side merge
            # (np.asarray on BOTH the freshest decode block and the
            # prefill logits) drained the whole dispatch pipeline on
            # every admission — one full RTT + prefill stall per request
            return jax.lax.dynamic_update_slice(
                cur, tok.reshape(1, 1).astype(cur.dtype), (slot, 0)
            )

        self._merge_first_token = _merge_first_token
        self.pending: Deque[Request] = deque()
        self.active: Dict[int, Request] = {}  # slot -> request
        self._prefilling: Dict[int, Request] = {}  # slot -> mid-chunk req
        self._ids = itertools.count()
        self._seed_rng = np.random.default_rng(seed)
        self._reserved: set = set()  # slots pinned to sessions
        self._pending_tokens: Deque[jax.Array] = deque()
        # decode rows per pending entry (K for a [K, B] block, 1 for a
        # single step, 0 for a first-token entry): the dispatch-budget
        # cap below sums this to know how many rows are in flight
        self._pending_rows: Deque[int] = deque()
        self._pending_slots: Deque[List[int]] = deque()
        self._first_token: Dict[int, int] = {}  # slot -> prefill-sampled token

    # ------------------------------------------------------------------ API
    def submit(
        self,
        prompt: List[int],
        gen: GenerationConfig = GenerationConfig(),
        on_token: Optional[Callable[[int], None]] = None,
        pin_slot: Optional[int] = None,
        append: bool = False,
    ) -> Request:
        req = Request(
            id=next(self._ids), prompt=list(prompt), gen=gen, on_token=on_token,
            pin_slot=pin_slot, append=append,
            submitted_at=time.perf_counter(),
            seed=int(
                np.random.SeedSequence(gen.seed).generate_state(1)[0]
                if gen.seed is not None
                else self._seed_rng.integers(0, 2**32, dtype=np.uint32)
            ),
        )
        self.pending.append(req)
        return req

    def reserve_slot(self) -> int:
        """Reserve a slot for a session: it is never handed to other
        requests and keeps its KV state across that session's turns."""
        for s in self.slots:
            if s not in self._reserved:
                self._reserved.add(s)
                return s
        raise RuntimeError("no free slot to reserve")

    def release_slot(self, slot: int) -> None:
        self._reserved.discard(slot)
        if self.engine.allocator is not None and slot not in self.active:
            self.engine.free_slot_pages(slot)

    def cancel(self, req: Request) -> None:
        """Stop a request (client stopped consuming, e.g. stop-string
        hit in the session layer). Its slot stops decoding next step."""
        if not req.done:
            self._finish(req)
        try:
            self.pending.remove(req)
        except ValueError:
            pass

    @property
    def num_active(self) -> int:
        return len(self.active)

    def has_work(self) -> bool:
        return bool(self.pending or self.active or self._prefilling
                    or self._pending_tokens)

    def run(self) -> None:
        """Drive until all submitted requests complete."""
        while self.has_work():
            self.step()
        self._drain(all_remaining=True)

    # ----------------------------------------------------------------- steps
    def _free_slots(self) -> List[int]:
        return [
            s for s in self.slots
            if s not in self.active
            and s not in self._prefilling
            and s not in self._reserved
        ]

    def _admit_group(self) -> None:
        """Admit a FIFO prefix of groupable fresh requests through ONE
        grouped prefill dispatch (engine._prefill_slots).

        A single-slot admission streams the full weight set for one row
        of activations; under saturation (32 back-to-back arrivals)
        that was ~0.8 s of the 3.5 s serving wall (round 5). A group of
        G shares one weight read. Groupable = transient (no pin/append),
        slot KV layout, whole-prompt (not chunked), same padded bucket,
        same static top_k. The scan stops at the first non-groupable
        request so admission ORDER is preserved; group size rounds down
        to a power of two (each G is its own precompiled program) and
        the overflow returns to the queue head."""
        eng = self.engine
        if getattr(eng, "_prefill_slots", None) is None:
            return
        if eng.prefix_cache is not None:
            # prefix adoption/registration is single-path bookkeeping
            return
        if len(self.pending) < 2:
            return
        free = deque(self._free_slots())
        group: List[tuple] = []
        bucket = top_k = None
        while self.pending and free and len(group) < len(self.slots):
            req = self.pending[0]
            if req.pin_slot is not None or req.append or req.start_len:
                break
            # clamp exactly like _admit_one (start_len == 0 here)
            prompt = req.prompt
            limit = eng.max_seq_len
            if len(prompt) >= limit:
                keep = max(1, limit - req.gen.max_new_tokens - 1)
                prompt = prompt[-keep:]
            if (self.prefill_chunk is not None
                    and len(prompt) > self.prefill_chunk):
                break  # chunked admission stays on the single path
            fit = max((b for b in eng.buckets if b <= limit), default=None)
            if fit is None:
                break
            if len(prompt) > fit:
                prompt = prompt[-fit:]
            b = eng.bucket_for(len(prompt))
            if bucket is None:
                bucket, top_k = b, req.gen.top_k
            elif b != bucket or req.gen.top_k != top_k:
                break
            req.prompt = prompt
            self.pending.popleft()
            group.append((req, free.popleft()))
        if len(group) < 2:
            for req, _ in reversed(group):
                self.pending.appendleft(req)
            return
        G = 1 << (len(group).bit_length() - 1)
        for req, _ in reversed(group[G:]):
            self.pending.appendleft(req)
        group = group[:G]
        toks = np.zeros((G, bucket), np.int32)
        lens = np.zeros((G,), np.int32)
        temps = np.zeros((G,), np.float32)
        topps = np.zeros((G,), np.float32)
        seeds = np.zeros((G,), np.uint32)
        slots = np.zeros((G,), np.int32)
        for g, (req, slot) in enumerate(group):
            toks[g, : len(req.prompt)] = req.prompt
            lens[g] = len(req.prompt)
            temps[g] = req.gen.temperature
            topps[g] = req.gen.top_p
            seeds[g] = req.seed
            slots[g] = slot
            req.slot = slot
        t0 = time.perf_counter()
        logits, eng.cache = eng._prefill_slots(
            eng.params, jnp.asarray(toks), jnp.asarray(lens), eng.cache,
            jnp.asarray(slots),
            attn_window=eng.decode_window(bucket), prefill_flash=True,
            group=G,
        )
        # same per-request draw as the single path: fold_in(seed, 0),
        # identical temperature/top_p/top_k per row
        firsts = eng._sample_perslot(
            logits, jnp.asarray(seeds), jnp.zeros((G,), jnp.int32),
            jnp.asarray(temps), jnp.asarray(topps), top_k=top_k,
        )
        eng.stats.prefill_time += time.perf_counter() - t0
        eng.stats.prefill_tokens += int(lens.sum())
        for g, (req, slot) in enumerate(group):
            req.sampled = 1
            self.active[slot] = req
            self._first_token[slot] = firsts[g : g + 1]

    def _admit(self) -> None:
        eng = self.engine
        self._admit_group()
        free = deque(self._free_slots())
        deferred: List[Request] = []
        blocked = False  # a transient hit page backpressure this round
        while self.pending:
            req = self.pending.popleft()
            if blocked and req.pin_slot is None:
                # keep FIFO page fairness among transients once one is
                # page-starved — but still try PINNED session requests
                # below: they may need zero new pages, and skipping them
                # would hang forever when nothing is active to free
                # pages (same starvation class as the slot case)
                deferred.append(req)
                continue
            if req.pin_slot is not None:
                if req.pin_slot in self.active or (
                        req.pin_slot in self._prefilling):
                    deferred.append(req)  # session slot still busy
                    continue
                slot = req.pin_slot
            elif free:
                slot = free.popleft()
            else:
                # no free slot for THIS (transient) request — defer it
                # but keep scanning: a pinned session request queued
                # behind it may target an idle reserved slot, and a
                # `break` here would starve it forever when every slot
                # is session-reserved
                deferred.append(req)
                continue
            if not self._admit_one(req, slot):
                # paged-KV backpressure: not enough free pages yet.
                # Block transients behind it (page FIFO fairness) but
                # keep trying pinned requests.
                deferred.append(req)
                blocked = True
                if req.pin_slot is None:
                    free.appendleft(slot)
                continue
        deferred.extend(self.pending)
        self.pending = deque(deferred)

    def _admit_one(self, req: Request, slot: int) -> bool:
        """Admit req into slot. Returns False (no side effects beyond
        prompt clamping) when the paged-KV pool lacks pages."""
        eng = self.engine
        if req.append:
            req.start_len = int(np.asarray(eng.cache.lengths)[slot])
        limit = eng.max_seq_len - req.start_len
        if len(req.prompt) >= limit:
            # clamp so the prompt + requested generation fit the window
            # (an unclamped negative index kept the WRONG end of the
            # prompt when max_new_tokens >= max_seq_len - 1)
            keep = max(1, limit - req.gen.max_new_tokens - 1)
            req.prompt = req.prompt[-keep:]
        # chunked admission (remainder-first segmentation) can admit any
        # prompt < limit: the first segment carries len % chunk tokens
        # (its padded bucket <= chunk <= limit) and every later segment
        # is an EXACT chunk-aligned write — no padded block can overrun
        # max_seq_len and clamp its DUS start over valid KV. Requires
        # room for a full chunk after the history.
        chunked = (
            self.prefill_chunk is not None
            and len(req.prompt) > self.prefill_chunk
            and limit > self.prefill_chunk
        )
        if not chunked:
            # whole-prompt admission: the PADDED bucket must fit — the
            # contiguous cache DUS's the whole [bucket] block at
            # start_len, and a clamped DUS start would shift it back
            # over the slot's valid KV
            fit = max((b for b in eng.buckets if b <= limit), default=None)
            if fit is None:
                raise ValueError(
                    f"slot history ({req.start_len} tokens) leaves no "
                    f"room for any prefill bucket (max_seq_len "
                    f"{eng.max_seq_len}); shift or reset the session "
                    "window first"
                )
            if len(req.prompt) > fit:
                req.prompt = req.prompt[-fit:]
        if eng.allocator is not None:
            if not req.append:
                eng.free_slot_pages(slot)  # recycle a previous tenant's pages
            total = min(
                req.start_len + len(req.prompt) + req.gen.max_new_tokens + 1,
                eng.max_seq_len,
            )
            # prefix cache: reuse the KV pages of the longest cached
            # page-aligned prompt prefix; only the suffix gets prefilled
            shared, shared_len = [], 0
            if not req.append and eng.prefix_cache is not None:
                shared, shared_len = eng.prefix_cache.lookup(req.prompt)
            want = -(-total // eng.page_size)
            while True:
                need = max(0, want - len(eng._slot_pages[slot])
                           - len(shared))
                if eng.allocator.can_alloc(need):
                    break
                # pool pressure: shed cached prefixes before deferring.
                # Eviction can free the very pages we just looked up, so
                # re-lookup afterwards (entries hold their own refs;
                # OUR list is unreferenced until adoption).
                if eng.prefix_cache is None or not eng.prefix_cache.evict(1):
                    return False
                if shared_len:
                    shared, shared_len = eng.prefix_cache.lookup(req.prompt)
            if shared_len:
                eng.adopt_shared_pages(slot, shared)
                eng.set_slot_length(slot, shared_len)
                req.start_len = shared_len
                req.prefix_tokens = req.prompt[:shared_len]
                req.prompt = req.prompt[shared_len:]  # suffix only
                # the fit/chunked decisions above used the full length —
                # conservative for the (shorter) suffix, still valid
                chunked = (
                    self.prefill_chunk is not None
                    and len(req.prompt) > self.prefill_chunk
                    and (eng.max_seq_len - req.start_len) > self.prefill_chunk
                )
            eng.assign_pages(slot, eng.pages_needed(slot, total))
        req.slot = slot
        if chunked:
            # chunked admission: first segment now, one more per step()
            # (active slots decode between chunks)
            req.pf_pos = 0
            self._prefilling[slot] = req
            self._prefill_chunk_step(req, slot)
        else:
            self._prefill_segment(req, slot, req.prompt, pos=0, final=True)
        return True

    def _prefill_segment(self, req: Request, slot: int, seg, pos: int,
                         final: bool) -> None:
        """Prefill seg (= req.prompt[pos : pos+len(seg)]) into slot; on
        the final segment, sample the request's first token and move it
        to the decoding set."""
        eng = self.engine
        bucket = eng.bucket_for(len(seg))
        toks = np.zeros((1, bucket), np.int32)
        toks[0, : len(seg)] = seg
        # append-like whenever the slot already holds valid KV below the
        # segment: a real session append, a later chunk, or an adopted
        # prefix-cache prefix (start_len covers it)
        append = req.append or pos > 0 or bool(req.prefix_tokens)
        t0 = time.perf_counter()
        logits, eng.cache = eng._prefill_slot(
            eng.params,
            jnp.asarray(toks),
            jnp.asarray(len(seg), jnp.int32),
            eng.cache,
            jnp.asarray(slot, jnp.int32),
            jnp.asarray(append),
            # start_len + pos are host-known at admission, so the
            # attention window is a static bucket over history + the
            # prompt prefix ending at this segment
            attn_window=eng.decode_window(
                min(req.start_len + pos + bucket, eng.max_seq_len)
            ),
            # only a position-0 segment is flash-eligible
            prefill_flash=not append,
        )
        eng.stats.prefill_time += time.perf_counter() - t0
        eng.stats.prefill_tokens += len(seg)
        req.pf_pos = pos + len(seg)
        if not final:
            return
        first = eng._sample_logits(
            logits,
            jax.random.fold_in(jax.random.PRNGKey(req.seed), 0),
            jnp.float32(req.gen.temperature), jnp.float32(req.gen.top_p),
            top_k=req.gen.top_k,
        )
        req.sampled = 1
        self._prefilling.pop(slot, None)
        self.active[slot] = req
        self._first_token[slot] = first  # device array [1]
        if not req.append and eng.prefix_cache is not None:
            # the slot now holds valid KV for the ENTIRE prompt from
            # position 0 — register its page-aligned prefixes for reuse
            eng.prefix_cache.insert(
                req.prefix_tokens + req.prompt, eng._slot_pages[slot]
            )

    def _prefill_chunk_step(self, req: Request, slot: int) -> None:
        """Advance one segment of a mid-admission request.

        Remainder-FIRST segmentation: the first segment carries
        len(prompt) % chunk tokens, every later one is an exact chunk
        ([pos, pos+chunk) with pos+chunk <= len(prompt)), so only the
        first segment is ever padded — and its bucket <= chunk is
        guaranteed to fit. A remainder-LAST scheme corrupted KV: the
        final padded bucket could overrun max_seq_len, and the clamped
        DUS start slid the block back over earlier chunks' rows."""
        chunk = self.prefill_chunk
        pos = req.pf_pos
        rem = len(req.prompt) % chunk
        if pos == 0 and rem:
            seg = req.prompt[:rem]
        else:
            seg = req.prompt[pos : pos + chunk]
        self._prefill_segment(
            req, slot, seg, pos=pos,
            final=pos + len(seg) >= len(req.prompt),
        )

    def _speculative_ready(self) -> bool:
        """Gate for the batched speculative step (see __init__ doc).

        Slot-KV only, no reserved slots (an idle session slot whose
        frozen KV sits within K rows of max_seq_len would be corrupted
        by the verify pass's inactive-row writes), every active request
        greedy + transient, and every slot at least K rows from the
        window edge (a clamped DUS start would slide the write block
        over valid KV)."""
        K = self.speculative_k
        if not K or not self.active:
            return False
        if len(self.active) > self.speculative_max_batch:
            return False
        from .speculative import rtt_gate_ok

        if not rtt_gate_ok(self.engine):
            # host-driven verify passes lose to the pipelined loop at
            # this deployment's RTT (engine/speculative.py)
            return False
        if self.engine.kv_layout != "slot" or self._reserved:
            return False
        for req in self.active.values():
            if (req.gen.temperature != 0.0 or req.pin_slot is not None
                    or req.append):
                return False
            cur = req.start_len + len(req.prompt) + len(req.output) - 1
            if cur + K > self.engine.max_seq_len:
                return False
        return True

    def _decode_dispatch_speculative(self) -> None:
        """One SYNCHRONOUS batched verify pass (no dispatch-ahead lag:
        the next pass's inputs depend on this one's acceptance)."""
        from .speculative import NgramDrafter, _make_verify

        eng = self.engine
        B = eng.max_batch
        K = self.speculative_k
        verify, advance = _make_verify(eng)
        toks = np.zeros((B, K), np.int32)
        slot_drafts: Dict[int, List[int]] = {}
        max_end = 2
        for slot, req in self.active.items():
            hist = list(req.prompt) + req.output
            drafts = NgramDrafter(hist).propose(K - 1)
            toks[slot, 0] = req.output[-1]  # last emitted, unfed
            if drafts:
                toks[slot, 1 : 1 + len(drafts)] = drafts
            slot_drafts[slot] = drafts
            cur = req.start_len + len(req.prompt) + len(req.output) - 1
            max_end = max(max_end, cur + K)
        got, eng.cache = verify(
            eng.params, jnp.asarray(toks), eng.cache,
            attn_window=eng.decode_window(min(max_end, eng.max_seq_len)),
        )
        got = np.asarray(got)  # [B, K] greedy tokens — one sync readback
        adv = np.zeros((B,), np.int32)
        emitted_total = 0
        for slot, req in list(self.active.items()):
            drafts = slot_drafts[slot]
            a = 0
            while a < len(drafts) and got[slot, a] == drafts[a]:
                a += 1
            emitted = list(drafts[:a]) + [int(got[slot, a])]
            m = 0
            for t in emitted:
                self._emit(req, t)
                if req.done:
                    break
                m += 1
            # continuing invariant: lengths = prompt + emitted - 1 (the
            # last emitted token stays unfed). Finished slots are
            # transient by the gate and reset from position 0 at reuse,
            # so their terminal advance doesn't need plain's overshoot
            # semantics.
            adv[slot] = m
            emitted_total += m
        eng.cache = self._advance_lengths(eng.cache, jnp.asarray(adv))
        self.engine.stats.decode_tokens += emitted_total
        # keep the plain pipeline's current-token vector in sync: if a
        # later step falls back to the plain path (e.g. a sampled
        # request arrives), it must feed each slot's LAST emitted token,
        # not the one from before the speculative passes
        cur = np.asarray(self._cur_tokens).copy()
        for slot, req in self.active.items():
            if req.output:
                cur[slot, 0] = req.output[-1]
        self._cur_tokens = jnp.asarray(cur)

    def _choose_k(self) -> Optional[int]:
        """Adaptive multi-step block size (round-4 verdict item 4).

        Static multi_step trades low-load TTFT for saturated throughput
        (p50 TTFT 199.5 ms at 2 rps with K=8 vs 68.6 ms single-step,
        docs/PERF.md round 4) and made the operator pick the mode by
        hand. The scheduler already holds the signals: after _admit, a
        non-empty pending queue means every slot is busy or page-starved
        (true saturation) -> full K; otherwise K scales with slot
        occupancy, dropping to single-step below 3/4 occupancy so a
        sparse batch never quantizes TTFT to a K-step block wall.
        K values are rounded down to powers of two — each distinct K is
        its own compiled program (precompile warms {2,4,...,K})."""
        K = self.multi_step
        if not K:
            return None
        if not self.adaptive_multi_step:
            return K
        n, S = len(self.active), len(self.slots)
        if self.pending:
            return K
        if 4 * n >= 3 * S:
            k = (K * n) // S
            p = 1
            while p * 2 <= k:
                p *= 2
            return p if p > 1 else None
        return None

    def _multi_step_ready(self, K: Optional[int] = None) -> bool:
        K = K or self.multi_step
        if not K or K <= 1 or not self.active:
            return False
        if self._reserved or self._prefilling:
            return False
        # device lengths run ahead of host counters by the in-flight
        # blocks; every active slot needs headroom for all of them
        ahead_rows = (len(self._pending_tokens) + 1) * K
        for req in self.active.values():
            if req.pin_slot is not None or req.append:
                return False
            cur = req.start_len + len(req.prompt) + len(req.output)
            if cur + ahead_rows >= self.engine.max_seq_len - 1:
                return False
        return True

    def _decode_dispatch(self, k_steps: Optional[int] = None) -> None:
        eng = self.engine
        B = eng.max_batch
        active = np.zeros((B,), bool)
        temp = np.full((B,), 1.0, np.float32)
        topp = np.ones((B,), np.float32)
        seeds = np.zeros((B,), np.uint32)
        steps = np.zeros((B,), np.int32)
        owners = []
        top_k = 64
        for slot, req in self.active.items():
            active[slot] = True
            temp[slot] = req.gen.temperature
            topp[slot] = req.gen.top_p
            seeds[slot] = req.seed
            steps[slot] = req.sampled
            req.sampled += 1
            owners.append((slot, req.id))
            # exact sampling (top_k=0) wins; else the widest prefilter
            top_k = 0 if (top_k == 0 or req.gen.top_k == 0) else max(
                top_k, req.gen.top_k
            )
        max_len = max(
            (r.start_len + len(r.prompt) + len(r.output) + 2
             for r in self.active.values()),
            default=2,
        )
        if k_steps:
            nxt, eng.cache = eng._decode_sample_k(
                eng.params,
                self._cur_tokens,
                eng.cache,
                jnp.asarray(seeds),
                jnp.asarray(steps),
                jnp.asarray(temp),
                jnp.asarray(topp),
                jnp.asarray(active),
                attn_window=eng.decode_window(max_len + k_steps),
                top_k=top_k,
                k_steps=k_steps,
            )  # nxt: [K, B]
            for req in self.active.values():
                req.sampled += k_steps - 1  # the +1 already happened above
            last = nxt[-1]
        else:
            nxt, eng.cache = eng._decode_sample(
                eng.params,
                self._cur_tokens,
                eng.cache,
                jnp.asarray(seeds),
                jnp.asarray(steps),
                jnp.asarray(temp),
                jnp.asarray(topp),
                jnp.asarray(active),
                attn_window=eng.decode_window(max_len),
                top_k=top_k,
            )
            last = nxt
        # start the device->host token copy NOW: np.asarray at drain
        # time would otherwise issue the transfer synchronously and pay
        # a full RTT per step even with a deep dispatch-ahead pipeline
        try:
            nxt.copy_to_host_async()
        except AttributeError:
            pass
        self._pending_tokens.append(nxt)
        self._pending_slots.append(owners)
        self._pending_rows.append(k_steps or 1)
        self._cur_tokens = last[:, None]

    def step(self) -> None:
        """One scheduler iteration: admit, advance chunked prefills by
        ONE chunk each, decode-dispatch, drain one."""
        # snapshot BEFORE admission: a request admitted this step already
        # ran its first chunk inside _admit_one
        continuing = list(self._prefilling.items())
        self._admit()
        for slot, req in continuing:
            if self._prefilling.get(slot) is req:
                self._prefill_chunk_step(req, slot)
        if not self.active:
            self._drain(all_remaining=True)
            return
        self._sync_first_tokens()
        t0 = time.perf_counter()
        if self._speculative_ready():
            self._drain(all_remaining=True)  # flush plain-mode lag first
            if self.active:
                self._decode_dispatch_speculative()
            self.engine.stats.decode_time += time.perf_counter() - t0
            return
        k = self._choose_k()
        # dispatch budget: a length-capped request can only use
        # max_new_tokens - emitted - in-flight more rows. Without this
        # cap, `ahead` K-step blocks keep dispatching FULLY WASTED rows
        # while a synchronized wave of requests finishes (at b8/K=8
        # saturation: ~2 dead blocks per admission wave, ~15% of the
        # serving wall). Stop-token finishes stay unpredictable — this
        # only prunes work that no surviving request can ever use.
        inflight = sum(self._pending_rows)
        # session (pinned/append) requests get +1: the final sampled
        # token's KV row is only written when it is fed back once, and
        # the NEXT append turn's attention must see it. Transients skip
        # the extra row — their slot recycles.
        max_useful = max(
            (r.gen.max_new_tokens - len(r.output) - inflight
             + (1 if (r.pin_slot is not None or r.append) else 0)
             for r in self.active.values()),
            default=0,
        )
        if max_useful <= 0:
            # everything still needed is already in flight: flush it
            # (finishes the wave) instead of dispatching dead rows
            self._drain(all_remaining=True)
            self.engine.stats.decode_time += time.perf_counter() - t0
            return
        ms = k if (k and k > 1 and self._multi_step_ready(k)) else None
        if ms and ms > max_useful:
            # shrink to the largest precompiled (power-of-two) block
            # that is still fully useful
            ms = 1 << (max_useful.bit_length() - 1)
            if ms <= 1:
                ms = None
        self._decode_dispatch(k_steps=ms)
        self._drain()
        self.engine.stats.decode_time += time.perf_counter() - t0
        self.engine.stats.decode_tokens += len(self.active) * (ms or 1)

    # ------------------------------------------------------- token plumbing
    def _sync_first_tokens(self) -> None:
        """Merge prefill-sampled first tokens into the device-resident
        current-token vector — ON DEVICE (jitted scatter), with the
        host-side emission deferred through the pending FIFO like any
        decode token. The round-4 form read back both the freshest
        in-flight decode block and the prefill logits synchronously
        here, so every admission cost a pipeline drain (~RTT + prefill)
        with the device idle; overlapped admission keeps decode blocks
        in flight across prefills (round-4 verdict item 3)."""
        eng = self.engine
        B = eng.max_batch
        if not hasattr(self, "_cur_tokens") or self._cur_tokens is None:
            self._cur_tokens = jnp.zeros((B, 1), jnp.int32)
        if not self._first_token:
            return
        for slot, first in self._first_token.items():
            self._cur_tokens = self._merge_first_token(
                self._cur_tokens, jnp.asarray(slot, jnp.int32), first
            )
            req = self.active[slot]
            try:
                first.copy_to_host_async()
            except AttributeError:
                pass
            # ride the normal drain FIFO so a request's first token is
            # always emitted before its decode tokens (same (slot, id)
            # discard rules apply)
            self._pending_tokens.append(first)
            self._pending_slots.append(("first", slot, req.id))
            self._pending_rows.append(0)
        self._first_token.clear()

    def _emit(self, req: Request, tok: int) -> bool:
        """Record a token; returns True if the request just finished."""
        stop = set(req.gen.stop_tokens) | set(self.engine.cfg.stop_tokens)
        if req.first_token_at is None:
            req.first_token_at = time.perf_counter()
        if tok in stop:
            self._finish(req)
            return True
        req.output.append(tok)
        if req.on_token is not None:
            req.on_token(tok)
        if len(req.output) >= req.gen.max_new_tokens or (
            req.start_len + len(req.prompt) + len(req.output)
            >= self.engine.max_seq_len - 1
        ):
            self._finish(req)
            return True
        return False

    def _finish(self, req: Request) -> None:
        req.done = True
        req.finished_at = time.perf_counter()
        owned = False
        if req.slot is not None:
            if self._prefilling.get(req.slot) is req:
                del self._prefilling[req.slot]  # cancelled mid-admission
                owned = True
            if self.active.get(req.slot) is req:
                del self.active[req.slot]
                owned = True
        # reserved (session) slots keep their pages for the next
        # turn's append-prefill; transient slots recycle immediately
        if (
            owned
            and self.engine.allocator is not None
            and req.slot not in self._reserved
        ):
            self.engine.free_slot_pages(req.slot)

    def _drain(self, all_remaining: bool = False) -> None:
        """Read back one (or all) pending decode results. Tokens are
        matched by (slot, request-id) so a slot recycled mid-lag never
        delivers a stale token to its new occupant."""
        def _landed(x) -> bool:
            # opportunistic drain: the head's device->host copy (started
            # async at dispatch) already landed, so emitting it costs no
            # sync and cuts token/TTFT latency by up to `ahead` dispatch
            # intervals — the depth rule alone made a first token wait
            # for ahead+1 LATER dispatches even when its bytes were
            # already on the host (p50 TTFT 1161 ms in the r5a bench
            # serving section at ahead=4)
            try:
                return x.is_ready()
            except AttributeError:
                return False

        while self._pending_tokens and (
            all_remaining
            or len(self._pending_tokens) > self.decode_ahead
            or _landed(self._pending_tokens[0])
        ):
            toks = np.asarray(self._pending_tokens.popleft())
            owners = self._pending_slots.popleft()
            self._pending_rows.popleft()
            if isinstance(owners, tuple) and owners[0] == "first":
                _, slot, req_id = owners
                req = self.active.get(slot)
                if req is not None and not req.done and req.id == req_id:
                    self._emit(req, int(toks.reshape(-1)[0]))
                continue
            rows = toks[None, :] if toks.ndim == 1 else toks  # [K, B]
            for row in rows:
                for slot, req_id in owners:
                    req = self.active.get(slot)
                    if req is None or req.done or req.id != req_id:
                        continue  # post-stop / post-recycle rows discard
                    self._emit(req, int(row[slot]))
