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
