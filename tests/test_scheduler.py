"""Continuous-batching scheduler tests."""

import numpy as np
import pytest

from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
from mlc_llm_tpu.models import get_config, init_random_params


@pytest.fixture(scope="module")
def engine():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    return InferenceEngine(cfg, params, max_batch=4, max_seq_len=64)


def _greedy(n, seed=None):
    return GenerationConfig(max_new_tokens=n, temperature=0.0)


def test_single_request_matches_plain_generate(engine):
    sched = ContinuousBatchingScheduler(engine)
    req = sched.submit([5, 6, 7], _greedy(6))
    sched.run()
    assert req.done
    want = engine.generate([[5, 6, 7]], _greedy(6))[0]
    assert req.output == want


def test_more_requests_than_slots(engine):
    sched = ContinuousBatchingScheduler(engine)
    prompts = [[i + 1, i + 2, i + 3] for i in range(10)]  # 10 reqs, 4 slots
    reqs = [sched.submit(p, _greedy(5)) for p in prompts]
    sched.run()
    assert all(r.done for r in reqs)
    # each matches its solo greedy run
    for p, r in zip(prompts, reqs):
        want = engine.generate([p], _greedy(5))[0]
        assert r.output == want, (p, r.output, want)


def test_mixed_lengths_and_limits(engine):
    sched = ContinuousBatchingScheduler(engine)
    a = sched.submit([1, 2], _greedy(2))
    b = sched.submit(list(range(1, 30)), _greedy(7))
    sched.run()
    assert a.done and b.done
    assert len(a.output) <= 2 and len(b.output) <= 7
    assert a.output == engine.generate([[1, 2]], _greedy(2))[0]


def test_streaming_callbacks_and_ttft(engine):
    sched = ContinuousBatchingScheduler(engine)
    seen = []
    req = sched.submit([3, 4, 5], _greedy(4), on_token=seen.append)
    sched.run()
    assert seen == req.output
    assert req.ttft is not None and req.ttft >= 0
    assert req.finished_at >= req.first_token_at


def test_late_submission_joins_running_batch(engine):
    sched = ContinuousBatchingScheduler(engine)
    first = sched.submit([5, 6, 7], _greedy(8))
    # run a few steps, then add another request mid-flight
    for _ in range(3):
        sched.step()
    second = sched.submit([9, 10], _greedy(4))
    sched.run()
    assert first.done and second.done
    assert first.output == engine.generate([[5, 6, 7]], _greedy(8))[0]
    assert second.output == engine.generate([[9, 10]], _greedy(4))[0]


def test_per_request_sampling_params(engine):
    sched = ContinuousBatchingScheduler(engine, seed=7)
    greedy = sched.submit([5, 6, 7], GenerationConfig(max_new_tokens=5, temperature=0.0))
    hot = sched.submit([5, 6, 7], GenerationConfig(max_new_tokens=5, temperature=1.5, top_p=0.9))
    sched.run()
    want = engine.generate([[5, 6, 7]], _greedy(5))[0]
    assert greedy.output == want  # greedy slot unaffected by hot slot


def test_window_shrinks_after_long_request_finishes(engine):
    """A finished slot's stale KV (longer than the current window) must
    not corrupt remaining requests when the decode window shrinks."""
    sched = ContinuousBatchingScheduler(engine)
    long_req = sched.submit(list(range(1, 40)), _greedy(12))   # len 39+
    # run until the long request finishes
    while not long_req.done:
        sched.step()
    short = sched.submit([7, 8], _greedy(6))  # window now much smaller
    sched.run()
    assert short.done
    want = engine.generate([[7, 8]], _greedy(6))[0]
    assert short.output == want


def test_per_request_seed_reproducible_across_batch_compositions(engine):
    """GenerationConfig.seed must reproduce a request's sampled stream
    regardless of what else shares the batch (VERDICT r1 weak #8)."""
    gen = GenerationConfig(max_new_tokens=6, temperature=1.1, top_p=0.9, seed=42)

    sched = ContinuousBatchingScheduler(engine, seed=1)
    solo = sched.submit([5, 6, 7], gen)
    sched.run()

    sched2 = ContinuousBatchingScheduler(engine, seed=2)
    crowd = [sched2.submit([i + 2, i + 9], _greedy(8)) for i in range(3)]
    again = sched2.submit([5, 6, 7], gen)
    sched2.run()
    assert all(r.done for r in crowd)
    assert again.output == solo.output

    # and unseeded requests with identical prompts do NOT correlate
    s3 = ContinuousBatchingScheduler(engine, seed=3)
    hot = GenerationConfig(max_new_tokens=8, temperature=2.0, top_p=1.0)
    a = s3.submit([5, 6, 7], hot)
    b = s3.submit([5, 6, 7], hot)
    s3.run()
    assert a.output != b.output


def test_admission_clamp_when_max_new_tokens_exceeds_window(engine):
    """prompt >= max_seq_len with huge max_new_tokens used to keep the
    wrong end of the prompt and crash bucket_for (ADVICE r1)."""
    sched = ContinuousBatchingScheduler(engine)
    long_prompt = list(range(1, engine.max_seq_len + 30))
    req = sched.submit(long_prompt, GenerationConfig(
        max_new_tokens=engine.max_seq_len + 5, temperature=0.0))
    sched.run()
    assert req.done
    assert len(req.prompt) >= 1
    assert req.prompt == long_prompt[-len(req.prompt):]  # newest end kept


def test_exact_top_p_path(engine):
    """top_k=0 requests the exact full-vocab nucleus sampler."""
    sched = ContinuousBatchingScheduler(engine, seed=5)
    req = sched.submit([4, 5], GenerationConfig(
        max_new_tokens=4, temperature=1.0, top_p=0.999, top_k=0, seed=9))
    sched.run()
    assert req.done and len(req.output) >= 1


def test_sessions_share_one_scheduler(engine):
    """N ChatSessions ride one scheduler: reserved slots, multi-turn
    append-prefill, interleaved turns (VERDICT r1 weak #7)."""
    from mlc_llm_tpu.engine.session import ChatConfig, ChatSession
    from mlc_llm_tpu.models import get_config

    class ByteTok:
        def encode(self, s):
            return [b % 50 + 2 for b in s.encode()]

        def decode(self, ids):
            return "".join(chr(i + 64) for i in ids)

    cfg = get_config("tiny-llama").replace(max_seq_len=64)
    chat = ChatConfig(temperature=0.0, max_gen_len=6, mean_gen_len=6,
                      max_window_size=64)
    sched = ContinuousBatchingScheduler(engine)
    s1 = ChatSession(tokenizer=ByteTok(), cfg=cfg, chat=chat,
                     conv_template="vicuna_v1.1", scheduler=sched)
    s2 = ChatSession(tokenizer=ByteTok(), cfg=cfg, chat=chat,
                     conv_template="dolly", scheduler=sched)
    assert s1.slot != s2.slot

    r1a = s1.ask("Hi")
    r2a = s2.ask("Yo")
    r1b = s1.ask("More")  # turn 2: append-prefill into the SAME slot
    assert isinstance(r1a, str) and isinstance(r2a, str) and isinstance(r1b, str)
    assert s1.total_len > 0 and s2.total_len > 0

    # a session's greedy reply is unaffected by sharing the scheduler:
    # fresh single-session run reproduces turn 1
    sched_solo = ContinuousBatchingScheduler(engine)
    solo = ChatSession(tokenizer=ByteTok(), cfg=cfg, chat=chat,
                       conv_template="vicuna_v1.1", scheduler=sched_solo)
    assert solo.ask("Hi") == r1a
    s1.close()
    s2.close()
    solo.close()


def test_pinned_request_not_starved_by_unadmittable_transient():
    """A transient request with no free slot must not block a pinned
    session request queued behind it: with every slot session-reserved,
    the old `break` in _admit left the pinned request pending forever
    while has_work() stayed true — a permanent hang (caught in
    review)."""
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
    sched = ContinuousBatchingScheduler(eng)
    s0 = sched.reserve_slot()
    s1 = sched.reserve_slot()
    assert {s0, s1} == set(sched.slots)

    transient = sched.submit([5, 6, 7], _greedy(4))          # no slot free
    pinned = sched.submit([8, 9], _greedy(4), pin_slot=s1)   # must run
    # run() would spin forever on the never-admittable transient (the
    # reservations are permanent here); drive bounded steps instead
    for _ in range(12):
        if pinned.done:
            break
        sched.step()
    assert pinned.done and len(pinned.output) == 4
    # the transient stays pending (still no unreserved slot), not lost
    assert not transient.done and transient in sched.pending


def test_append_bucket_must_fit_history():
    """The padded prefill bucket is DUS'd at start_len into the
    contiguous cache; a bucket overrunning max_seq_len would clamp the
    DUS start and shift the block back over valid KV (caught in
    review). Admission must clamp the prompt to a bucket that fits, and
    refuse loudly when none does."""
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
    sched = ContinuousBatchingScheduler(eng)
    s0 = sched.reserve_slot()

    # turn 1: fill the slot to length 40 (prompt 38 + 2 generated)
    r1 = sched.submit(list(range(1, 39)), _greedy(2), pin_slot=s0)
    for _ in range(8):
        if r1.done:
            break
        sched.step()
    assert r1.done
    start = int(np.asarray(eng.cache.lengths)[s0])
    assert start == 40

    # turn 2: 20-token append; limit 24 -> largest fitting bucket is 16,
    # so the prompt is clamped to its last 16 tokens (never shifted)
    r2 = sched.submit(list(range(100, 120)), _greedy(2), pin_slot=s0,
                      append=True)
    for _ in range(8):
        if r2.done:
            break
        sched.step()
    assert r2.done and len(r2.prompt) == 16
    assert int(np.asarray(eng.cache.lengths)[s0]) == 40 + 16 + 2

    # turn 3: slot nearly full -> no bucket fits -> loud error, not
    # silent KV corruption
    r3 = sched.submit([7, 8, 9], _greedy(2), pin_slot=s0, append=True)
    with pytest.raises(ValueError, match="no room"):
        sched.step()


# ---------------------------------------------------------- chunked prefill

def test_chunked_prefill_matches_whole_prompt():
    """prefill_chunk admission must produce identical outputs to
    whole-prompt admission (same prompts, greedy), for slot and paged
    engines."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    gen = GenerationConfig(max_new_tokens=5, temperature=0.0)
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=n))
               for n in (45, 30, 7)]

    for kv_layout in ("slot", "paged"):
        kwargs = {"kv_layout": kv_layout, "page_size": 8} \
            if kv_layout == "paged" else {}
        eng_a = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64,
                                **kwargs)
        plain = ContinuousBatchingScheduler(eng_a)
        want = [plain.submit(p, gen) for p in prompts]
        plain.run()

        eng_b = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64,
                                **kwargs)
        chunked = ContinuousBatchingScheduler(eng_b, prefill_chunk=16)
        got = [chunked.submit(p, gen) for p in prompts]
        chunked.run()
        for w, g in zip(want, got):
            assert g.output == w.output, kv_layout


def test_chunked_prefill_interleaves_decode():
    """While a long prompt is being admitted chunk by chunk, an already
    active slot must keep emitting tokens — the whole point (vLLM-style
    decode-latency protection)."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
    sched = ContinuousBatchingScheduler(eng, prefill_chunk=16)
    gen = GenerationConfig(max_new_tokens=12, temperature=0.0)

    r_short = sched.submit([1, 2, 3], gen)
    sched.step()  # r_short admitted + first decode dispatched
    long_prompt = list(np.random.default_rng(3).integers(
        1, cfg.vocab_size, size=48))
    r_long = sched.submit(long_prompt, gen)  # needs 3 chunks
    progress = []
    for _ in range(3):
        sched.step()
        progress.append((len(r_short.output), r_long.pf_pos))
    # the long admission advanced by one chunk per step...
    chunk_steps = [p for _, p in progress]
    assert chunk_steps[0] >= 16 and chunk_steps[-1] >= 48, progress
    # ...while the short request kept decoding between chunks
    deltas = [progress[i + 1][0] - progress[i][0] for i in range(2)]
    assert all(d >= 1 for d in deltas), progress
    sched.run()
    assert r_short.done and r_long.done
    # chunked result still matches a solo run
    solo = InferenceEngine(cfg, params, max_batch=1, max_seq_len=64)
    assert r_long.output == solo.generate([r_long.prompt], gen)[0]


def test_chunked_prefill_cancel_frees_pages():
    """Cancelling a request mid-admission releases its slot AND its
    pages (the _finish path must handle the prefilling set)."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64,
                          kv_layout="paged", page_size=8)
    sched = ContinuousBatchingScheduler(eng, prefill_chunk=16)
    free0 = eng.allocator.free_pages
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0)
    r = sched.submit(list(range(2, 50)), gen)
    sched.step()  # first chunk in; still prefilling
    assert r.slot in sched._prefilling
    sched.cancel(r)
    assert r.done and r.slot not in sched._prefilling
    assert eng.allocator.free_pages == free0
    # the slot is reusable afterwards
    r2 = sched.submit([1, 2, 3], gen)
    sched.run()
    assert r2.done and len(r2.output) > 0


def test_chunked_prefill_rejects_non_bucket():
    from mlc_llm_tpu.engine import InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    eng = InferenceEngine(cfg, init_random_params(cfg, "f32", seed=0),
                          max_batch=1, max_seq_len=64)
    with pytest.raises(ValueError):
        ContinuousBatchingScheduler(eng, prefill_chunk=24)


def test_chunked_prefill_unaligned_tail_regression():
    """Review repro: max_seq_len=40 (a non-power-of-2 tail bucket),
    chunk=16, 35-token prompt — a remainder-LAST segmentation pads the
    final segment past max_seq_len, and the clamped DUS start silently
    overwrites earlier chunks' KV. Remainder-FIRST segmentation must
    match whole-prompt admission exactly."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0)
    prompt = list(np.random.default_rng(7).integers(1, cfg.vocab_size,
                                                    size=35))

    eng_a = InferenceEngine(cfg, params, max_batch=1, max_seq_len=40)
    plain = ContinuousBatchingScheduler(eng_a)
    w = plain.submit(prompt, gen)
    plain.run()

    eng_b = InferenceEngine(cfg, params, max_batch=1, max_seq_len=40)
    chunked = ContinuousBatchingScheduler(eng_b, prefill_chunk=16)
    g = chunked.submit(prompt, gen)
    chunked.run()
    assert g.output == w.output, (g.output, w.output)


def test_chunked_prefill_admits_past_single_bucket():
    """Chunked admission must NOT clamp a long append prompt to one
    bucket (review finding: the whole-prompt fit clamp silently dropped
    context that per-chunk writes can admit in full)."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama").replace(max_seq_len=128)
    params = init_random_params(cfg, "f32", seed=0)
    # buckets (16..128): largest single bucket is 128, but with 20
    # tokens of history only 108 remain -> whole-prompt fit would be 64
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    sched = ContinuousBatchingScheduler(eng, prefill_chunk=16)
    gen = GenerationConfig(max_new_tokens=3, temperature=0.0)
    slot = sched.reserve_slot()
    r0 = sched.submit(list(range(2, 22)), gen, pin_slot=slot)  # history 20+
    sched.run()
    hist = int(np.asarray(eng.cache.lengths)[slot])
    prompt = list(np.random.default_rng(8).integers(
        1, cfg.vocab_size, size=100))
    r1 = sched.submit(prompt, gen, pin_slot=slot, append=True)
    sched.run()
    assert r1.done
    # nothing was silently truncated: all 100 prompt tokens landed
    assert len(r1.prompt) == 100
    assert int(np.asarray(eng.cache.lengths)[slot]) >= hist + 100


# ------------------------------------------------------ batched speculation

def test_scheduler_speculative_matches_plain():
    """Batched speculation (all-greedy transient batch) must emit the
    exact plain-scheduler streams — accepting prompts that draft well
    and ones that don't — and must actually take fewer decode passes."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    gen = GenerationConfig(max_new_tokens=16, temperature=0.0)
    prompts = [
        [5, 6, 7] * 4,                 # repetitive: drafts accept
        [11, 3, 19, 42, 7, 23, 2, 31][:6],  # arbitrary
        [9, 8] * 5,
    ]

    eng_a = InferenceEngine(cfg, params, max_batch=2, max_seq_len=128)
    plain = ContinuousBatchingScheduler(eng_a)
    want = [plain.submit(p, gen) for p in prompts]
    plain.run()

    eng_b = InferenceEngine(cfg, params, max_batch=2, max_seq_len=128)
    spec = ContinuousBatchingScheduler(eng_b, speculative_k=4)
    passes = []
    orig = spec._decode_dispatch_speculative
    spec._decode_dispatch_speculative = lambda: (passes.append(1), orig())
    got = [spec.submit(p, gen) for p in prompts]
    spec.run()
    for w, g in zip(want, got):
        assert g.output == w.output, (g.output, w.output)
    total = sum(len(g.output) for g in got)
    assert passes, "the speculative path never engaged"
    # strictly fewer verify passes than tokens would need plain steps
    assert len(passes) < total, (len(passes), total)


def test_scheduler_speculative_falls_back_on_sampled():
    """A sampled request in the batch must force the plain path (the
    gate), and everything still completes with correct greedy outputs
    for the greedy requests."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
    sched = ContinuousBatchingScheduler(eng, speculative_k=4)
    greedy = GenerationConfig(max_new_tokens=8, temperature=0.0)
    sampled = GenerationConfig(max_new_tokens=8, temperature=0.8, seed=3)
    r_g = sched.submit([5, 6, 7] * 3, greedy)
    r_s = sched.submit([1, 2, 3], sampled)
    sched.run()
    assert r_g.done and r_s.done and len(r_s.output) > 0

    solo = InferenceEngine(cfg, params, max_batch=1, max_seq_len=64)
    assert r_g.output == solo.generate([r_g.prompt], greedy)[0]


def test_scheduler_speculative_mode_switch_mid_run():
    """Speculative passes, then a sampled request arrives mid-run: the
    switch back to the plain pipeline must feed each slot's LAST emitted
    token (the _cur_tokens sync), keeping greedy streams exact."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=128)
    sched = ContinuousBatchingScheduler(eng, speculative_k=4)
    greedy = GenerationConfig(max_new_tokens=20, temperature=0.0)
    r_g = sched.submit([5, 6, 7] * 4, greedy)
    for _ in range(3):  # a few speculative passes
        sched.step()
    assert not r_g.done
    sampled = GenerationConfig(max_new_tokens=6, temperature=0.9, seed=5)
    r_s = sched.submit([4, 4], sampled)  # flips the gate to plain
    sched.run()
    assert r_g.done and r_s.done

    solo = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    assert r_g.output == solo.generate([r_g.prompt], greedy)[0]


def test_chunked_admission_with_batched_speculation():
    """Both serving features on at once: long prompts admitted in
    chunks, then decoded with batched speculation — streams must still
    equal the plain scheduler's."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    gen = GenerationConfig(max_new_tokens=12, temperature=0.0)
    prompts = [([5, 6, 7] * 16)[:40], list(range(2, 40))]

    eng_a = InferenceEngine(cfg, params, max_batch=2, max_seq_len=128)
    plain = ContinuousBatchingScheduler(eng_a)
    want = [plain.submit(p, gen) for p in prompts]
    plain.run()

    eng_b = InferenceEngine(cfg, params, max_batch=2, max_seq_len=128)
    combo = ContinuousBatchingScheduler(eng_b, prefill_chunk=16,
                                        speculative_k=4)
    got = [combo.submit(p, gen) for p in prompts]
    combo.run()
    for w, g in zip(want, got):
        assert g.output == w.output, (g.output, w.output)


def test_scheduler_speculative_batch_gate():
    """Speculation must NOT engage above speculative_max_batch (on-chip
    r3 measurement: 1.55x at b1, 0.81x at b4 — scripts/spec_bench.py),
    and must engage when the cap is raised."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0)
    prompts = [[5, 6, 7] * 4, [9, 8] * 5, [1, 2, 3, 4]]

    def run(max_batch_gate):
        eng = InferenceEngine(cfg, params, max_batch=4, max_seq_len=128)
        sched = ContinuousBatchingScheduler(
            eng, speculative_k=4, speculative_max_batch=max_batch_gate)
        passes = []
        orig = sched._decode_dispatch_speculative
        sched._decode_dispatch_speculative = (
            lambda: (passes.append(1), orig()))
        reqs = [sched.submit(p, gen) for p in prompts]
        sched.run()
        return passes, [r.output for r in reqs]

    gated_passes, gated_out = run(2)       # 3 active > 2 => plain path
    open_passes, open_out = run(4)         # cap raised => speculation
    assert not gated_passes
    assert open_passes
    assert gated_out == open_out           # streams identical either way


def test_decode_ahead_outputs_identical():
    """decode_ahead > 1 only deepens the dispatch pipeline: token
    streams, stop behavior, and slot recycling must be identical to the
    depth-1 scheduler (greedy, so exact comparison)."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    prompts = [[3, 4, 5], [6, 7], [8, 9, 10, 11], [12], [13, 14]]
    gen = GenerationConfig(max_new_tokens=7, temperature=0.0)

    def run(ahead):
        eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
        s = ContinuousBatchingScheduler(eng, decode_ahead=ahead)
        reqs = [s.submit(p, gen) for p in prompts]
        s.run()
        assert all(r.done for r in reqs)
        return [r.output for r in reqs]

    base = run(1)
    for ahead in (3, 6):
        assert run(ahead) == base


def test_multi_step_outputs_identical():
    """The on-device multi-step block must emit EXACTLY the single-step
    scheduler's token streams — including stops inside a block,
    max_new_tokens inside a block, and slot recycling — because the
    per-token PRNG is position-indexed and the drain discards post-stop
    rows."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    prompts = [[3, 4, 5], [6, 7], [8, 9, 10, 11], [12], [13, 14, 15]]
    for gen in (
        GenerationConfig(max_new_tokens=9, temperature=0.0),
        GenerationConfig(max_new_tokens=7, temperature=0.8, top_p=0.9,
                         seed=5),
        # stop token guaranteed to hit mid-block for SOME request:
        # sample from a tiny effective vocab via temperature 0 plus a
        # stop set covering many ids
        GenerationConfig(max_new_tokens=11, temperature=0.0,
                         stop_tokens=tuple(range(0, 200, 3))),
    ):
        def run(multi_step=None, ahead=1):
            eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
            s = ContinuousBatchingScheduler(eng, multi_step=multi_step,
                                            decode_ahead=ahead)
            reqs = [s.submit(p, gen) for p in prompts]
            s.run()
            assert all(r.done for r in reqs)
            return [r.output for r in reqs]

        base = run()
        assert run(multi_step=4) == base
        assert run(multi_step=3, ahead=2) == base
        # adaptive mode must emit the same streams as single-step too —
        # it only changes WHEN tokens arrive, never which tokens
        assert run(multi_step="auto:4") == base
        assert run(multi_step="auto", ahead=2) == base


def test_adaptive_multi_step_choose_k():
    """auto mode: single-step when sparse, full K under backlog,
    power-of-two partial K at high occupancy (round-4 verdict item 4)."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=4, max_seq_len=64)
    s = ContinuousBatchingScheduler(eng, multi_step="auto:8")
    assert s.adaptive_multi_step and s.multi_step == 8
    gen = GenerationConfig(max_new_tokens=4, temperature=0.0)

    # 1/4 occupancy: no block decode
    s.submit([3, 4, 5], gen)
    s._admit()
    assert s._choose_k() is None
    # full occupancy, nothing pending: partial K = 8*4//4 = 8
    for p in ([6, 7], [8, 9], [10, 11]):
        s.submit(p, gen)
    s._admit()
    assert s._choose_k() == 8
    # backlog beyond the slots: full K
    s.submit([12, 13], gen)
    s._admit()
    assert s.pending and s._choose_k() == 8
    s.run()

    # 3/4 occupancy: K scales down to the next power of two (8*3//4=6->4)
    s2 = ContinuousBatchingScheduler(eng, multi_step="auto:8")
    for p in ([3, 4], [5, 6], [7, 8]):
        s2.submit(p, gen)
    s2._admit()
    assert s2._choose_k() == 4
    s2.run()


def test_multi_step_respects_window_edge():
    """Near max_seq_len the gate must fall back to single-step rather
    than write a block past the window."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq_len=32)
    s = ContinuousBatchingScheduler(eng, multi_step=8)
    gen = GenerationConfig(max_new_tokens=30, temperature=0.0)
    r = s.submit(list(range(2, 22)), gen)  # 20 prompt + window 32
    s.run()
    assert r.done
    # window-limited: 20 + len(output) stays inside max_seq_len
    assert 20 + len(r.output) <= 32


def test_grouped_admission_engages_and_matches_solo(engine):
    """A burst of same-bucket fresh requests admits through ONE grouped
    prefill dispatch (engine._prefill_slots) and produces exactly the
    single-admission token streams (round-5 serving lever)."""
    sched = ContinuousBatchingScheduler(engine)
    calls = []
    orig = engine._prefill_slots
    assert orig is not None  # slot layout exposes the grouped program

    def spy(params, toks, lens, cache, slots, **kw):
        calls.append(kw["group"])
        return orig(params, toks, lens, cache, slots, **kw)

    engine._prefill_slots = spy
    try:
        prompts = [[i + 1, i + 2, i + 3] for i in range(4)]
        reqs = [sched.submit(p, _greedy(5)) for p in prompts]
        sched.run()
    finally:
        engine._prefill_slots = orig
    assert calls == [4]  # one dispatch, group of 4
    assert all(r.done for r in reqs)
    for p, r in zip(prompts, reqs):
        assert r.output == engine.generate([p], _greedy(5))[0]


def test_grouped_admission_sampled_seed_parity(engine):
    """Sampled requests: the grouped first-token draw must equal the
    single-path draw (same fold_in(seed, 0) key, temp, top_p, top_k)."""
    gen = lambda seed: GenerationConfig(  # noqa: E731
        max_new_tokens=6, temperature=0.8, top_p=0.9, seed=seed)
    # grouped: both submitted before any step
    s1 = ContinuousBatchingScheduler(engine)
    a1 = s1.submit([5, 6, 7], gen(11))
    b1 = s1.submit([9, 8, 7], gen(22))
    s1.run()
    # single path: submitted one step apart (group scan needs >= 2)
    s2 = ContinuousBatchingScheduler(engine)
    a2 = s2.submit([5, 6, 7], gen(11))
    s2.step()
    b2 = s2.submit([9, 8, 7], gen(22))
    s2.run()
    assert a1.output == a2.output
    assert b1.output == b2.output


def test_grouped_admission_mixed_buckets_fall_back(engine):
    """Different padded buckets stop the group scan; everything still
    admits correctly through the single path."""
    sched = ContinuousBatchingScheduler(engine)
    small = sched.submit([1, 2], _greedy(4))           # bucket A
    big = sched.submit(list(range(1, 30)), _greedy(4))  # bucket B
    sched.run()
    assert small.done and big.done
    assert small.output == engine.generate([[1, 2]], _greedy(4))[0]
    assert big.output == engine.generate([list(range(1, 30))],
                                         _greedy(4))[0]


def test_dispatch_budget_prunes_dead_blocks():
    """A synchronized wave of length-capped transients must not keep
    dispatching fully wasted rows while it finishes: total dispatched
    decode rows stays within one block of max_new_tokens (round-5
    saturation fix), and outputs are unchanged."""
    from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=4, max_seq_len=64)
    sched = ContinuousBatchingScheduler(eng, multi_step=4, decode_ahead=2)
    rows = []
    orig_k, orig_1 = eng._decode_sample_k, eng._decode_sample

    def spy_k(*a, **kw):
        rows.append(kw.get("k_steps", 4))
        return orig_k(*a, **kw)

    def spy_1(*a, **kw):
        rows.append(1)
        return orig_1(*a, **kw)

    eng._decode_sample_k, eng._decode_sample = spy_k, spy_1
    try:
        gen = GenerationConfig(max_new_tokens=8, temperature=0.0)
        reqs = [sched.submit([i + 1, i + 2, i + 3], gen) for i in range(4)]
        sched.run()
    finally:
        eng._decode_sample_k, eng._decode_sample = orig_k, orig_1
    assert all(r.done and len(r.output) == 8 for r in reqs)
    # first token comes from prefill; 7 more decode rows needed. Allow
    # one block of slack for the adaptive gate, but the old behavior
    # (ahead extra K-blocks at the tail = 8+ dead rows) must not return
    assert sum(rows) <= 8 + 4, rows
    for p, r in zip([[1, 2, 3], [2, 3, 4], [3, 4, 5], [4, 5, 6]], reqs):
        assert r.output == eng.generate([p], gen)[0]
