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
    # filled by the scheduler
    output: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_at is None:
            return None
        return self.first_token_at - self.submitted_at


class ContinuousBatchingScheduler:
    def __init__(self, engine: InferenceEngine, seed: int = 0):
        self.engine = engine
        self.pending: Deque[Request] = deque()
        self.active: Dict[int, Request] = {}  # slot -> request
        self._ids = itertools.count()
        self._key = jax.random.PRNGKey(seed)
        self._pending_tokens: Deque[jax.Array] = deque()
        self._pending_slots: Deque[List[int]] = deque()
        self._first_token: Dict[int, int] = {}  # slot -> prefill-sampled token

    # ------------------------------------------------------------------ API
    def submit(
        self,
        prompt: List[int],
        gen: GenerationConfig = GenerationConfig(),
        on_token: Optional[Callable[[int], None]] = None,
    ) -> Request:
        req = Request(
            id=next(self._ids), prompt=list(prompt), gen=gen, on_token=on_token,
            submitted_at=time.perf_counter(),
        )
        self.pending.append(req)
        return req

    @property
    def num_active(self) -> int:
        return len(self.active)

    def has_work(self) -> bool:
        return bool(self.pending or self.active or self._pending_tokens)

    def run(self) -> None:
        """Drive until all submitted requests complete."""
        while self.has_work():
            self.step()
        self._drain(all_remaining=True)

    # ----------------------------------------------------------------- steps
    def _free_slots(self) -> List[int]:
        return [
            s for s in range(self.engine.max_batch)
            if s not in self.active
        ]

    def _admit(self) -> None:
        eng = self.engine
        for slot in self._free_slots():
            if not self.pending:
                break
            req = self.pending.popleft()
            if len(req.prompt) >= eng.max_seq_len:
                req.prompt = req.prompt[-(eng.max_seq_len - req.gen.max_new_tokens - 1):]
            bucket = eng.bucket_for(len(req.prompt))
            toks = np.zeros((1, bucket), np.int32)
            toks[0, : len(req.prompt)] = req.prompt
            t0 = time.perf_counter()
            logits, eng.cache = eng._prefill_slot(
                eng.params,
                jnp.asarray(toks),
                jnp.asarray(len(req.prompt), jnp.int32),
                eng.cache,
                jnp.asarray(slot, jnp.int32),
            )
            eng.stats.prefill_time += time.perf_counter() - t0
            eng.stats.prefill_tokens += len(req.prompt)
            self._key, sub = jax.random.split(self._key)
            first = eng._sample_logits(
                logits, sub,
                jnp.float32(req.gen.temperature), jnp.float32(req.gen.top_p),
            )
            req.slot = slot
            self.active[slot] = req
            self._first_token[slot] = first  # device array [1]

    def _decode_dispatch(self) -> None:
        eng = self.engine
        B = eng.max_batch
        active = np.zeros((B,), bool)
        temp = np.full((B,), 1.0, np.float32)
        topp = np.ones((B,), np.float32)
        owners = []
        for slot, req in self.active.items():
            active[slot] = True
            temp[slot] = req.gen.temperature
            topp[slot] = req.gen.top_p
            owners.append((slot, req.id))
        self._key, sub = jax.random.split(self._key)
        max_len = max(
            (len(r.prompt) + len(r.output) + 2 for r in self.active.values()),
            default=2,
        )
        nxt, eng.cache, _ = eng._decode_sample(
            eng.params,
            self._cur_tokens,
            eng.cache,
            sub,
            jnp.asarray(temp),
            jnp.asarray(topp),
            jnp.asarray(active),
            attn_window=eng.decode_window(max_len),
        )
        self._pending_tokens.append(nxt)
        self._pending_slots.append(owners)
        self._cur_tokens = nxt[:, None]

    def step(self) -> None:
        """One scheduler iteration: admit, decode-dispatch, drain one."""
        self._admit()
        if not self.active:
            self._drain(all_remaining=True)
            return
        self._sync_first_tokens()
        t0 = time.perf_counter()
        self._decode_dispatch()
        self._drain()
        self.engine.stats.decode_time += time.perf_counter() - t0
        self.engine.stats.decode_tokens += len(self.active)

    # ------------------------------------------------------- token plumbing
    def _sync_first_tokens(self) -> None:
        """Merge prefill-sampled first tokens into the device-resident
        current-token vector."""
        eng = self.engine
        B = eng.max_batch
        if not hasattr(self, "_cur_tokens") or self._cur_tokens is None:
            self._cur_tokens = jnp.zeros((B, 1), jnp.int32)
        if not self._first_token:
            return
        cur = np.asarray(self._cur_tokens).copy()
        for slot, first in self._first_token.items():
            tok = int(np.asarray(first)[0])
            cur[slot, 0] = tok
            req = self.active[slot]
            self._emit(req, tok)
        self._first_token.clear()
        self._cur_tokens = jnp.asarray(cur)

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
            len(req.prompt) + len(req.output) >= self.engine.max_seq_len - 1
        ):
            self._finish(req)
            return True
        return False

    def _finish(self, req: Request) -> None:
        req.done = True
        req.finished_at = time.perf_counter()
        if req.slot is not None and self.active.get(req.slot) is req:
            del self.active[req.slot]

    def _drain(self, all_remaining: bool = False) -> None:
        """Read back one (or all) pending decode results. Tokens are
        matched by (slot, request-id) so a slot recycled mid-lag never
        delivers a stale token to its new occupant."""
        while self._pending_tokens and (
            all_remaining or len(self._pending_tokens) > 1
        ):
            toks = np.asarray(self._pending_tokens.popleft())
            owners = self._pending_slots.popleft()
            for slot, req_id in owners:
                req = self.active.get(slot)
                if req is None or req.done or req.id != req_id:
                    continue
                self._emit(req, int(toks[slot]))
