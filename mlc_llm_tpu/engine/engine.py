"""Single-host inference engine with bucketed prefill + fused decode/sample.

TPU-first design decisions (SURVEY.md §7.1):
- prefill lengths are padded to static buckets (XLA compiles once per
  bucket) instead of the reference's symbolic-shape TIR
- the decode step jits forward + on-device sampling into ONE program;
  the sampled token feeds the next step on device, so the host loop
  only reads token ids (one int per step, lagging one step behind the
  dispatch — no per-token device sync on the critical path)
- the KV cache is donated to every step (in-place buffer reuse)
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import KVCache, forward, init_kv_cache
from ..ops.sampling import sample_token, sample_token_perslot
from .stats import RuntimeStats

DEFAULT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


@dataclasses.dataclass
class GenerationConfig:
    """Per-request generation parameters.

    Defaults follow the reference CLI (cli_main.cc:145-147: temperature
    0.7, top_p 0.95, mean_gen_len 128; window-shift policy lives in the
    session layer).
    """

    max_new_tokens: int = 128
    temperature: float = 0.7
    top_p: float = 0.95
    stop_tokens: Sequence[int] = ()
    seed: Optional[int] = None
    # nucleus-prefilter width for on-device sampling; 0 = exact
    # full-vocab top-p (see ops/sampling.py docstring)
    top_k: int = 64


class InferenceEngine:
    def __init__(
        self,
        cfg: ModelConfig,
        params,
        *,
        max_batch: int = 1,
        max_seq_len: Optional[int] = None,
        cache_dtype=jnp.bfloat16,
        prefill_buckets: Sequence[int] = DEFAULT_BUCKETS,
        kv_layout: str = "slot",
        page_size: int = 128,
        num_pages: Optional[int] = None,
        page_head_block: Optional[int] = None,
        prefix_cache_pages: Optional[int] = None,
    ):
        """kv_layout: "slot" = slot-contiguous [B, Smax] KV (small-batch
        fast path); "paged" = shared page pool + per-slot page tables
        (north-star layout: many concurrent mixed-length sequences
        without B*Smax worst-case HBM); "auto" = paged for batched int8
        KV, slot otherwise. The auto rule is measured, not stylistic:
        the slot einsum path MATERIALIZES the dequantized int8 window
        (int8 read + bf16 write + bf16 re-read beats reading bf16
        directly — b8/w1024 int8 lost 461 vs 609 tok/s in round 4),
        while the paged flash kernel dequantizes int8 IN the attention
        dots at [ps] granularity, so batched int8 configs (north-star
        config 4 at batch > 1) must run paged. num_pages defaults to
        the slot-equivalent capacity; size it smaller to oversubscribe
        (admission then backpressures on free pages)."""
        if kv_layout == "auto":
            kv_layout = (
                "paged"
                if jnp.dtype(cache_dtype) == jnp.int8 and max_batch > 1
                else "slot"
            )
        self.cfg = cfg
        # zero-pad quantized k-groups to multiples of 32 so every matmul
        # (notably w_out, k=11008 -> 344 groups at 7B) gets the widest
        # group-partial kernel chunks; exact no-op numerically
        from ..quant.groupwise import QuantizedTensor as _QT
        from ..quant.groupwise import pad_quantized_groups as _pad

        self.params = jax.tree.map(
            lambda x: _pad(x) if isinstance(x, _QT) else x,
            params,
            is_leaf=lambda x: isinstance(x, _QT),
        )
        params = self.params
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len or cfg.max_seq_len
        self.cache_dtype = cache_dtype
        self.buckets = tuple(b for b in sorted(prefill_buckets) if b <= self.max_seq_len)
        if not self.buckets or self.buckets[-1] < self.max_seq_len:
            self.buckets = tuple(sorted({*self.buckets, self.max_seq_len}))
        self.stats = RuntimeStats()
        self.kv_layout = kv_layout
        self.page_size = page_size
        self.allocator = None
        self.prefix_cache = None
        if kv_layout == "paged":
            from ..models.paged_cache import PageAllocator, init_paged_kv_cache

            pages_per_slot = -(-self.max_seq_len // page_size)
            if num_pages is None:
                num_pages = max_batch * pages_per_slot + 1  # +1: null page
            self.num_pages = num_pages
            self.allocator = PageAllocator(num_pages)
            self._table_np = np.zeros((max_batch, pages_per_slot), np.int32)
            self._slot_pages = {s: [] for s in range(max_batch)}
            # page_head_block: kv-heads packed per page lane-block. Under
            # TP sharding pick num_kv_heads // tp so the group count
            # G = Hkv/hb divides tp (the shard_map kernel's shard dim)
            self.cache = init_paged_kv_cache(
                cfg, max_batch, num_pages, page_size,
                max_pages_per_slot=pages_per_slot, dtype=cache_dtype,
                head_block=page_head_block,
            )
            if prefix_cache_pages:
                from ..models.paged_cache import PrefixCache

                # page-granular automatic prefix caching: requests that
                # share a prompt prefix reuse its KV pages instead of
                # re-prefilling them (scheduler admission integrates it)
                self.prefix_cache = PrefixCache(
                    self.allocator, page_size,
                    max_pages=prefix_cache_pages,
                )
        elif prefix_cache_pages:
            raise ValueError("prefix_cache_pages requires kv_layout='paged'")
        else:
            self.cache = init_kv_cache(cfg, max_batch, self.max_seq_len, cache_dtype)

        # --- jitted programs -------------------------------------------------
        cfg_static = cfg

        @partial(
            jax.jit, donate_argnames=("cache",),
            static_argnames=("last_only", "attn_window", "prefill_flash"),
        )
        def _prefill(params, tokens, seq_lens, cache, last_only=True,
                     attn_window=None, prefill_flash=False):
            # attn_window (static) bounds the cache read exactly like the
            # decode path: a ctx-512 reset prefill scores 512 positions,
            # not the full Smax buffer (4-16x less mask/softmax work)
            return forward(
                params, cfg_static, tokens, cache,
                seq_lens=seq_lens, last_only=last_only,
                attn_window=attn_window, prefill_flash=prefill_flash,
            )

        @partial(
            jax.jit,
            donate_argnames=("cache",),
            static_argnames=("attn_window", "top_k"),
        )
        def _decode_sample(
            params, tokens, cache, seeds, steps, temperature, top_p, active,
            attn_window=None, top_k=64,
        ):
            """One decode step + on-device sampling.

            tokens: [B, 1]; active: [B] bool — inactive slots don't
            advance their cache length (their token is still computed
            but the slot state is frozen). attn_window (static) bounds
            the cache read: one program per window bucket.

            seeds [B] uint32 / steps [B] int32 derive each slot's PRNG
            key as fold_in(PRNGKey(seed), step): a request's sample
            stream depends only on its own (seed, #tokens-sampled), so
            per-request `GenerationConfig.seed` is reproducible under
            continuous batching regardless of batch composition.
            """
            seq_lens = active.astype(jnp.int32)
            logits, cache = forward(
                params, cfg_static, tokens, cache, seq_lens=seq_lens,
                last_only=True, attn_window=attn_window,
            )
            keys = jax.vmap(
                lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c)
            )(seeds, steps)
            nxt = sample_token_perslot(logits, keys, temperature, top_p, top_k=top_k)
            nxt = jnp.where(active, nxt, tokens[:, 0])
            return nxt, cache

        @partial(
            jax.jit,
            donate_argnames=("cache",),
            static_argnames=("attn_window", "top_k", "k_steps"),
        )
        def _decode_sample_k(
            params, tokens, cache, seeds, steps, temperature, top_p, active,
            attn_window=None, top_k=64, k_steps=4,
        ):
            """k_steps decode steps in ONE device dispatch (the
            multi-step serving block): the host reads back a [K, B]
            token matrix instead of K separate [B] vectors, so the
            per-step host round trip amortizes over K. Stop detection
            happens at drain time — tokens computed past a stop are
            discarded host-side (the slot's junk KV rows sit past its
            valid length and are rewritten before ever being attended,
            the engine's standing invariant). PRNG streams are
            fold_in(seed, steps + i): identical to K single steps.
            """
            out0 = jnp.zeros((k_steps, tokens.shape[0]), jnp.int32)
            seq_lens = active.astype(jnp.int32)

            def body(i, carry):
                tok, cache, out = carry
                logits, cache = forward(
                    params, cfg_static, tok, cache, seq_lens=seq_lens,
                    last_only=True, attn_window=attn_window,
                )
                keys = jax.vmap(
                    lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c)
                )(seeds, steps + i)
                nxt = sample_token_perslot(
                    logits, keys, temperature, top_p, top_k=top_k)
                nxt = jnp.where(active, nxt, tok[:, 0])
                out = jax.lax.dynamic_update_slice_in_dim(
                    out, nxt[None, :], i, axis=0)
                return (nxt[:, None], cache, out)

            _, cache, out = jax.lax.fori_loop(
                0, k_steps, body, (tokens, cache, out0))
            return out, cache

        def _slice_slot(arr, slot):
            return None if arr is None else jax.lax.dynamic_slice_in_dim(
                arr, slot, 1, axis=1
            )

        def _splice_slot(arr, sub, slot):
            return None if arr is None else jax.lax.dynamic_update_slice_in_dim(
                arr, sub, slot, axis=1
            )

        @partial(jax.jit, donate_argnames=("cache",),
                 static_argnames=("attn_window", "prefill_flash"))
        def _prefill_slot(params, tokens, seq_len, cache, slot, append=False,
                          attn_window=None, prefill_flash=False):
            """Prefill ONE slot (tokens [1, S]) without touching the
            other slots' KV state — continuous-batching admission.

            append (traced bool): start from the slot's existing cache
            length instead of 0 — lets a pinned multi-turn chat session
            extend its own KV state through the scheduler (the
            reference's incremental EncodeStep, llm_chat.cc:645-685)."""
            start = jnp.where(
                jnp.asarray(append),
                jax.lax.dynamic_slice_in_dim(cache.lengths, slot, 1, axis=0),
                jnp.zeros((1,), jnp.int32),
            )
            sub = KVCache(
                k=_slice_slot(cache.k, slot),
                v=_slice_slot(cache.v, slot),
                lengths=start,
                k_scale=_slice_slot(cache.k_scale, slot),
                v_scale=_slice_slot(cache.v_scale, slot),
            )
            logits, sub = forward(
                params, cfg_static, tokens, sub,
                seq_lens=seq_len[None], last_only=True,
                attn_window=attn_window, prefill_flash=prefill_flash,
            )
            return logits, KVCache(
                k=_splice_slot(cache.k, sub.k, slot),
                v=_splice_slot(cache.v, sub.v, slot),
                lengths=jax.lax.dynamic_update_slice_in_dim(
                    cache.lengths, sub.lengths, slot, axis=0
                ),
                k_scale=_splice_slot(cache.k_scale, sub.k_scale, slot),
                v_scale=_splice_slot(cache.v_scale, sub.v_scale, slot),
            )

        @partial(jax.jit, donate_argnames=("cache",),
                 static_argnames=("attn_window", "prefill_flash", "group"))
        def _prefill_slots(params, tokens, seq_lens, cache, slots,
                           attn_window=None, prefill_flash=False, group=2):
            """Prefill GROUP fresh slots in ONE dispatch (tokens [G, S],
            seq_lens/slots [G]; fresh admissions only — every row starts
            at position 0).

            Saturated serving admits each request through its own
            _prefill_slot dispatch, and every one of those re-streams
            the full weight set (~4.3 GB at 7B) for a single row of
            activations — ~35 ms x 32 admissions was ~0.8 s of the
            3.5 s saturated wall (round 5). One forward over a [G, S]
            batch reads the weights once for all G admissions; the
            per-row KV (bucket-sized scratch, not a full-Smax clone) is
            then spliced into each row's slot. The reference has no
            admission path at all (hard batch-1, llm_chat.cc:645-685).
            """
            S = tokens.shape[1]

            def scratch(arr, s_axis):
                if arr is None:
                    return None
                shape = list(arr.shape)
                shape[1] = group
                shape[s_axis] = S
                return jnp.zeros(tuple(shape), arr.dtype)

            sub = KVCache(
                k=scratch(cache.k, 3),          # [L, G, H, S, D]
                v=scratch(cache.v, 4),          # [L, G, H, D, S]
                lengths=jnp.zeros((group,), jnp.int32),
                k_scale=scratch(cache.k_scale, 3),
                v_scale=scratch(cache.v_scale, 3),
            )
            logits, sub = forward(
                params, cfg_static, tokens, sub,
                seq_lens=seq_lens, last_only=True,
                attn_window=attn_window, prefill_flash=prefill_flash,
            )

            def splice(dst, src):
                # row g -> block update at (slot_g, position 0); S <=
                # Smax always holds (S is a prefill bucket <= max_seq_len)
                if dst is None:
                    return None
                zero = jnp.zeros((), jnp.int32)
                for g in range(group):
                    row = jax.lax.dynamic_slice_in_dim(src, g, 1, axis=1)
                    starts = (zero, slots[g]) + (zero,) * (dst.ndim - 2)
                    dst = jax.lax.dynamic_update_slice(dst, row, starts)
                return dst

            lengths = cache.lengths
            for g in range(group):
                lengths = jax.lax.dynamic_update_slice_in_dim(
                    lengths,
                    jax.lax.dynamic_slice_in_dim(sub.lengths, g, 1, axis=0),
                    slots[g], axis=0,
                )
            return logits, KVCache(
                k=splice(cache.k, sub.k),
                v=splice(cache.v, sub.v),
                lengths=lengths,
                k_scale=splice(cache.k_scale, sub.k_scale),
                v_scale=splice(cache.v_scale, sub.v_scale),
            )

        @partial(jax.jit, donate_argnames=("cache",),
                 static_argnames=("attn_window",))
        def _prefill_slot_paged(params, tokens, seq_len, cache, slot,
                                append=False, attn_window=None):
            """Paged admission prefill: the pools are shared, but writes
            only touch the slot's own pages (via its page-table row), so
            other slots' KV state is untouched by construction."""
            from ..models.paged_cache import PagedKVCache

            start = jnp.where(
                jnp.asarray(append),
                jax.lax.dynamic_slice_in_dim(cache.lengths, slot, 1, axis=0),
                jnp.zeros((1,), jnp.int32),
            )
            sub = PagedKVCache(
                k_pages=cache.k_pages,
                v_pages=cache.v_pages,
                page_table=jax.lax.dynamic_slice_in_dim(
                    cache.page_table, slot, 1, axis=0
                ),
                lengths=start,
                k_scale=cache.k_scale,
                v_scale=cache.v_scale,
            )
            logits, sub = forward(
                params, cfg_static, tokens, sub,
                seq_lens=seq_len[None], last_only=True,
                attn_window=attn_window,
            )
            return logits, PagedKVCache(
                k_pages=sub.k_pages,
                v_pages=sub.v_pages,
                page_table=cache.page_table,
                lengths=jax.lax.dynamic_update_slice_in_dim(
                    cache.lengths, sub.lengths, slot, axis=0
                ),
                k_scale=sub.k_scale,
                v_scale=sub.v_scale,
            )

        @partial(jax.jit, donate_argnames=("cache",))
        def _reset_lengths(cache, keep_mask):
            import dataclasses as _dc

            return _dc.replace(cache, lengths=jnp.where(keep_mask, cache.lengths, 0))

        @partial(jax.jit, donate_argnames=("cache",))
        def _set_length(cache, slot, value):
            import dataclasses as _dc

            return _dc.replace(
                cache,
                lengths=jax.lax.dynamic_update_slice_in_dim(
                    cache.lengths, value, slot, axis=0
                ),
            )

        self._set_length = _set_length

        self._prefill = _prefill
        def _prefill_slot_paged_entry(params, tokens, seq_len, cache, slot,
                                      append=False, attn_window=None,
                                      prefill_flash=False):
            # accepted for caller symmetry, dropped BEFORE the jit: the
            # paged layer path never takes the flash branch, and a dead
            # static arg would compile two identical programs
            del prefill_flash
            return _prefill_slot_paged(
                params, tokens, seq_len, cache, slot, append,
                attn_window=attn_window,
            )

        self._prefill_slot = (
            _prefill_slot_paged_entry if kv_layout == "paged" else _prefill_slot
        )
        # the underlying jitted program (the paged entry above is a plain
        # wrapper with no .lower) — debug/dump.py lowers this directly
        # grouped admission prefill: slot layout only (the paged path
        # has per-request page tables; its admissions stay single)
        self._prefill_slots = _prefill_slots if kv_layout != "paged" else None
        self._prefill_slot_jit = (
            _prefill_slot_paged if kv_layout == "paged" else _prefill_slot
        )
        self._decode_sample = _decode_sample
        self._decode_sample_k = _decode_sample_k
        self._reset_lengths = _reset_lengths
        self._sample_logits = jax.jit(
            lambda logits, key, t, p, top_k=64: sample_token(
                logits, key, t, p, top_k=top_k
            ),
            static_argnames=("top_k",),
        )
        self._sample_perslot = jax.jit(
            lambda logits, seeds, steps, t, p, top_k=64: sample_token_perslot(
                logits,
                jax.vmap(
                    lambda s, c: jax.random.fold_in(jax.random.PRNGKey(s), c)
                )(seeds, steps),
                t, p, top_k=top_k,
            ),
            static_argnames=("top_k",),
        )

    def precompile(self, *, progress: Optional[Callable[[str], None]] = None,
                   multi_step: Optional[int] = None) -> int:
        """AOT-compile every engine program (all prefill buckets, the
        admission slot-prefill, and every decode-window bucket; pass
        multi_step=K to also warm the K-step serving blocks).

        The reference ships compilation as a build artifact (the .so
        emitted at /root/reference/build.py:160-166); our analog is the
        persistent XLA compile cache (mlc_llm_tpu/__init__.py) — this
        method populates it ahead of serving so no request ever pays a
        multi-second Mosaic compile mid-stream (p99 protection). Uses
        jax.ShapeDtypeStruct lowering: no real buffers are touched or
        donated. Returns the number of programs compiled.
        """
        abs_of = lambda t: jax.tree.map(  # noqa: E731
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), t
        )
        params_a = abs_of(self.params)
        cache_a = abs_of(self.cache)
        B = self.max_batch
        i32 = jnp.int32
        n = 0

        def note(msg):
            if progress is not None:
                progress(msg)

        windows = sorted({self.decode_window(b) for b in self.buckets}
                         | {self.max_seq_len})
        for b in self.buckets:
            w = self.decode_window(b)
            note(f"prefill bucket {b} (window {w})")
            self._prefill.lower(
                params_a, jax.ShapeDtypeStruct((B, b), i32),
                jax.ShapeDtypeStruct((B,), i32), cache_a,
                attn_window=w,
                prefill_flash=self.kv_layout != "paged",
            ).compile()
            n += 1
            note(f"slot prefill bucket {b}")
            # match the scheduler's fresh-admission call exactly
            # (scheduler.py _admit: window = decode_window(bucket),
            # prefill_flash = not append; the paged program has no
            # flash arg at all)
            slot_kwargs = dict(attn_window=w)
            if self.kv_layout != "paged":
                slot_kwargs["prefill_flash"] = True
            self._prefill_slot_jit.lower(
                params_a, jax.ShapeDtypeStruct((1, b), i32),
                jax.ShapeDtypeStruct((), i32), cache_a,
                jax.ShapeDtypeStruct((), i32),
                jax.ShapeDtypeStruct((), jnp.bool_),
                **slot_kwargs,
            ).compile()
            n += 1
            if self._prefill_slots is not None:
                # grouped admission programs (scheduler rounds group
                # size down to a power of two <= max_batch)
                g = 2
                while g <= B:
                    note(f"grouped slot prefill bucket {b} (G={g})")
                    gargs = (
                        params_a, jax.ShapeDtypeStruct((g, b), i32),
                        jax.ShapeDtypeStruct((g,), i32), cache_a,
                        jax.ShapeDtypeStruct((g,), i32),
                    )
                    gkw = dict(attn_window=w, prefill_flash=True, group=g)
                    self._prefill_slots.lower(*gargs, **gkw).compile()
                    n += 1
                    if b == self.buckets[0]:
                        # grouped first-token sampler ([G, V] logits):
                        # left cold, the first G-clump admission pays a
                        # mid-serving compile (observed as a 10 s TTFT
                        # spike at 2 rps, tpu_logs/serve_group_r5.log)
                        log_a = jax.eval_shape(
                            self._prefill_slots, *gargs, **gkw)[0]
                        note(f"grouped first-token sampler (G={g})")
                        self._sample_perslot.lower(
                            log_a,
                            jax.ShapeDtypeStruct((g,), jnp.uint32),
                            jax.ShapeDtypeStruct((g,), i32),
                            jax.ShapeDtypeStruct((g,), jnp.float32),
                            jax.ShapeDtypeStruct((g,), jnp.float32),
                        ).compile()
                        n += 1
                    g *= 2
        for w in windows:
            # two temperature/top_p layouts exist at runtime: scalar
            # (generate_stream) and per-slot [B] (the continuous-batching
            # scheduler) — they trace to different programs
            for tshape in ((), (B,)):
                note(f"decode window {w} (t/p shape {tshape})")
                self._decode_sample.lower(
                    params_a, jax.ShapeDtypeStruct((B, 1), i32), cache_a,
                    jax.ShapeDtypeStruct((B,), jnp.uint32),
                    jax.ShapeDtypeStruct((B,), i32),
                    jax.ShapeDtypeStruct(tshape, jnp.float32),
                    jax.ShapeDtypeStruct(tshape, jnp.float32),
                    jax.ShapeDtypeStruct((B,), jnp.bool_),
                    attn_window=w,
                ).compile()
                n += 1
            if multi_step:
                # int = one static K; a sequence warms several (the
                # adaptive scheduler uses power-of-two K <= its max)
                ks = ((multi_step,) if isinstance(multi_step, int)
                      else tuple(multi_step))
                for kk in ks:
                    note(f"multi-step decode window {w} (K={kk})")
                    self._decode_sample_k.lower(
                        params_a, jax.ShapeDtypeStruct((B, 1), i32), cache_a,
                        jax.ShapeDtypeStruct((B,), jnp.uint32),
                        jax.ShapeDtypeStruct((B,), i32),
                        jax.ShapeDtypeStruct((B,), jnp.float32),
                        jax.ShapeDtypeStruct((B,), jnp.float32),
                        jax.ShapeDtypeStruct((B,), jnp.bool_),
                        attn_window=w, k_steps=kk,
                    ).compile()
                    n += 1
        return n

    def decode_window(self, max_len_next: int) -> int:
        """Static attention-window bucket covering max_len_next."""
        for b in self.buckets:
            if max_len_next <= b:
                return b
        return self.max_seq_len

    # ------------------------------------------------------------------ utils
    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds max_seq_len {self.max_seq_len}")

    def reset(self, slots: Optional[Sequence[int]] = None) -> None:
        """Clear KV state (all slots, or the given subset)."""
        keep = np.ones((self.max_batch,), bool)
        if slots is None:
            keep[:] = False
        else:
            keep[list(slots)] = False
        self.cache = self._reset_lengths(self.cache, jnp.asarray(keep))
        if self.allocator is not None:
            freed = [int(s) for s in np.nonzero(~keep)[0]]
            for s in freed:
                self.free_slot_pages(s, push=False)
            if freed:
                self._push_table()

    # ----------------------------------------------------- paged-KV plumbing
    def pages_needed(self, slot: int, total_tokens: int) -> int:
        """Additional pages slot needs to hold total_tokens."""
        want = -(-total_tokens // self.page_size)
        return max(0, want - len(self._slot_pages[slot]))

    def _push_table(self) -> None:
        """Upload the host page table and rebuild the cache pytree —
        once per batch of table edits, not once per slot."""
        import dataclasses as _dc

        self.cache = _dc.replace(
            self.cache, page_table=jnp.asarray(self._table_np)
        )

    def assign_pages(self, slot: int, n_new: int, push: bool = True) -> None:
        """Allocate n_new pages to slot and push the updated page table
        to the device (raises MemoryError when the pool is exhausted —
        the scheduler uses can_alloc for admission backpressure).
        push=False defers the device upload to a later _push_table()."""
        if n_new <= 0:
            return
        pages = self.allocator.alloc(n_new)
        self._slot_pages[slot].extend(pages)
        row = self._slot_pages[slot]
        self._table_np[slot, :] = 0
        self._table_np[slot, : len(row)] = row
        if push:
            self._push_table()

    def adopt_shared_pages(self, slot: int, pages) -> None:
        """Point slot's page table at already-allocated (prefix-cache)
        pages, taking a reference on each; the slot's own free path
        (free_slot_pages) later just drops that reference."""
        self.allocator.ref(pages)
        self._slot_pages[slot] = list(pages)
        self._table_np[slot, :] = 0
        self._table_np[slot, : len(pages)] = pages
        self._push_table()

    def set_slot_length(self, slot: int, n: int) -> None:
        """Set one slot's device-resident KV length (prefix adoption:
        the shared pages already hold n valid positions)."""
        self.cache = self._set_length(
            self.cache, jnp.asarray(slot, jnp.int32),
            jnp.asarray([n], jnp.int32),
        )

    def free_slot_pages(self, slot: int, push: bool = True) -> None:
        pages = self._slot_pages.get(slot)
        if not pages:
            return
        self.allocator.free(pages)
        self._slot_pages[slot] = []
        self._table_np[slot, :] = 0
        if push:
            self._push_table()

    # ------------------------------------------------------------- prefill/gen
    def prefill(
        self,
        prompts: List[List[int]],
        reset: bool = True,
        reserve_tokens: int = 64,
    ):
        """Prefill the batch. reset=True clears slot lengths first;
        reset=False appends to the existing KV state (multi-turn chat).

        reserve_tokens: paged mode allocates pages for prompt +
        reserve_tokens up front (generate_stream passes max_new_tokens).
        Returns last-token logits [B, V] (fp32, device array).
        """
        B = self.max_batch
        assert len(prompts) <= B, (len(prompts), B)
        lens = [len(p) for p in prompts]
        bucket = self.bucket_for(max(lens))
        if reset:
            self.reset(range(len(prompts)))
        # one host readback of lengths (zeroed above when reset) — not one
        # device sync per prompt. Host-known starts serve both the paged
        # allocator and the append path's static attention window.
        lens_host = (np.zeros((B,), np.int64) if reset
                     else np.asarray(self.cache.lengths))
        if self.allocator is not None:
            try:
                for i, p in enumerate(prompts):
                    total = int(lens_host[i]) + len(p) + reserve_tokens + 1
                    self.assign_pages(
                        i, self.pages_needed(i, min(total, self.max_seq_len)),
                        push=False,
                    )
            finally:
                # push even when the pool runs out mid-loop: earlier
                # slots' host-side table edits must reach the device or
                # their writes land in the reserved null page
                self._push_table()  # one upload for the whole batch
        toks = np.zeros((B, bucket), np.int32)
        seq_lens = np.zeros((B,), np.int32)
        for i, p in enumerate(prompts):
            toks[i, : len(p)] = p
            seq_lens[i] = len(p)
        # reset prefill starts at position 0, so the bucket is an exact
        # static attention window; append prefill uses the host-known slot
        # lengths (readback above — the scheduler admission pattern,
        # scheduler.py _admit) so multi-turn batch prefill is windowed too
        if reset:
            window = self.decode_window(bucket)
        else:
            start_max = int(max(
                (lens_host[i] for i in range(len(prompts))), default=0
            ))
            window = self.decode_window(
                min(start_max + bucket, self.max_seq_len)
            )
        t0 = time.perf_counter()
        logits, self.cache = self._prefill(
            self.params, jnp.asarray(toks), jnp.asarray(seq_lens), self.cache,
            attn_window=window,
            # flash prefill requires start position 0 (reset); the paged
            # layer path never takes the flash branch — force False there
            # so the static arg doesn't compile duplicate programs
            prefill_flash=reset and self.kv_layout != "paged",
        )
        logits.block_until_ready()
        self.stats.prefill_time += time.perf_counter() - t0
        self.stats.prefill_tokens += int(sum(lens))
        return logits

    def generate_stream(
        self,
        prompts: List[List[int]],
        gen: GenerationConfig = GenerationConfig(),
        reset: bool = True,
    ):
        """Generator yielding (slot, token) as tokens are read back
        (one decode step behind the device dispatch). Slots not in
        0..len(prompts)-1 keep their state frozen."""
        B = self.max_batch
        n = len(prompts)
        logits = self.prefill(
            prompts, reset=reset, reserve_tokens=gen.max_new_tokens
        )

        # per-slot uint32 seeds derived from gen.seed (deterministic when
        # set, distinct per slot so batched rows never share a key stream)
        base = gen.seed if gen.seed is not None else np.random.randint(0, 2**31 - 1)
        seeds_np = np.random.SeedSequence(base).generate_state(B).astype(np.uint32)
        seeds = jnp.asarray(seeds_np)
        steps_np = np.zeros((B,), np.int32)
        t = jnp.float32(gen.temperature)
        p = jnp.float32(gen.top_p)
        first = self._sample_perslot(
            logits, seeds, jnp.asarray(steps_np), t, p, top_k=gen.top_k
        )  # [B]
        steps_np[:] = 1

        stop = set(gen.stop_tokens) | set(self.cfg.stop_tokens)
        emitted = [0] * n
        done = np.zeros((n,), bool)
        cur_lens = np.asarray(self.cache.lengths)

        cur = first[:, None]  # [B, 1] device
        pending: List[jax.Array] = [first]
        t0 = time.perf_counter()
        steps = 0
        max_steps = min(
            gen.max_new_tokens,
            int(self.max_seq_len - cur_lens[:n].max()),
        )

        def drain_one():
            tok_host = np.asarray(pending.pop(0))
            for i in range(n):
                if done[i]:
                    continue
                tk = int(tok_host[i])
                if tk in stop:
                    done[i] = True
                    continue
                emitted[i] += 1
                if emitted[i] >= gen.max_new_tokens:
                    done[i] = True
                yield (i, tk)

        active_np = np.zeros((B,), bool)
        active_np[:n] = True
        max_len_host = int(cur_lens[:n].max())
        try:
            for _ in range(max_steps - 1):
                max_len_host += 1
                nxt, self.cache = self._decode_sample(
                    self.params, cur, self.cache, seeds,
                    jnp.asarray(steps_np), t, p,
                    jnp.asarray(active_np),
                    attn_window=self.decode_window(max_len_host + 1),
                    top_k=gen.top_k,
                )
                steps_np[active_np] += 1
                pending.append(nxt)
                cur = nxt[:, None]
                steps += 1
                yield from drain_one()
                if done.all():
                    break
                active_np[:n] = ~done
            while pending:
                yield from drain_one()
        finally:
            self.stats.decode_time += time.perf_counter() - t0
            self.stats.decode_tokens += steps * int(n)

    def generate(
        self,
        prompts: List[List[int]],
        gen: GenerationConfig = GenerationConfig(),
        on_token: Optional[Callable[[int, int], None]] = None,
        reset: bool = True,
    ) -> List[List[int]]:
        """Greedy/top-p generation for a batch of prompts. Returns
        generated token lists (stop token not included)."""
        out: List[List[int]] = [[] for _ in range(len(prompts))]
        for slot, tok in self.generate_stream(prompts, gen, reset=reset):
            out[slot].append(tok)
            if on_token is not None:
                on_token(slot, tok)
        return out
