"""Compile-stability guards: a repeated identical workload must hit the
jit cache, not XLA.

Round-1 and round-2 advisors each found a dead-static-arg bug that
silently compiled duplicate identical programs (engine._prefill_slot
and engine._prefill prefill_flash on paged engines); on the tunneled
TPU a surprise recompile costs minutes. These tests pin the property
itself: after a warmup run, an identical run triggers ZERO XLA
compilations, for every serving path.
"""

import logging
from contextlib import contextmanager

import jax
import pytest

from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
from mlc_llm_tpu.models import get_config, init_random_params


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.count = 0
        self.names = []

    def emit(self, record):
        msg = record.getMessage()
        if "Finished XLA compilation" in msg:
            self.count += 1
            self.names.append(msg)


@contextmanager
def count_compiles():
    counter = _CompileCounter()
    logger = logging.getLogger("jax")
    prev_level = logger.level
    logger.addHandler(counter)
    logger.setLevel(logging.WARNING)
    prev = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        yield counter
    finally:
        jax.config.update("jax_log_compiles", prev)
        logger.removeHandler(counter)
        logger.setLevel(prev_level)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    return cfg, params


def test_generate_compile_stable(setup):
    cfg, params = setup
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
    greedy = GenerationConfig(max_new_tokens=6, temperature=0.0)
    sampled = GenerationConfig(max_new_tokens=6, temperature=0.8, seed=7)
    prompts = [[1, 2, 3], [4, 5]]
    eng.generate(prompts, greedy)
    eng.generate(prompts, sampled)
    with count_compiles() as c:
        eng.generate(prompts, greedy)
        eng.generate(prompts, sampled)
    assert c.count == 0, c.names


def test_paged_generate_compile_stable(setup):
    cfg, params = setup
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64,
                          kv_layout="paged", page_size=16)
    gen = GenerationConfig(max_new_tokens=6, temperature=0.0)
    prompts = [[1, 2, 3], [4, 5]]
    eng.generate(prompts, gen)
    with count_compiles() as c:
        eng.generate(prompts, gen)
    assert c.count == 0, c.names


def test_scheduler_compile_stable(setup):
    from mlc_llm_tpu.engine.scheduler import ContinuousBatchingScheduler

    cfg, params = setup
    eng = InferenceEngine(cfg, params, max_batch=2, max_seq_len=64)
    sched = ContinuousBatchingScheduler(eng)
    gen = GenerationConfig(max_new_tokens=5, temperature=0.0)
    sched.submit([1, 2, 3], gen)
    sched.run()
    with count_compiles() as c:
        sched.submit([1, 2, 3], gen)
        sched.run()
    assert c.count == 0, c.names


def test_speculative_compile_stable(setup):
    from mlc_llm_tpu.engine.speculative import generate_speculative

    cfg, params = setup
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq_len=64)
    generate_speculative(eng, [5, 6, 7, 5, 6, 7], max_new_tokens=8,
                         draft_k=4)
    with count_compiles() as c:
        generate_speculative(eng, [5, 6, 7, 5, 6, 7], max_new_tokens=8,
                             draft_k=4)
    assert c.count == 0, c.names
