"""Prompt-lookup speculative decoding: EXACT greedy equivalence.

The acceptance rule only keeps a draft token when it equals the
model's own argmax, so the emitted stream must be identical to plain
greedy decode — on repetitive prompts (drafts accepted) and random
prompts (drafts rejected) alike.
"""

import numpy as np
import pytest

from mlc_llm_tpu.engine import GenerationConfig, InferenceEngine
from mlc_llm_tpu.engine.speculative import NgramDrafter, generate_speculative
from mlc_llm_tpu.models import get_config, init_random_params


@pytest.fixture(scope="module")
def eng():
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    return InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)


def test_ngram_drafter():
    d = NgramDrafter([1, 2, 3, 9, 1, 2, 3])
    # suffix [1,2,3] recurs at position 0; the continuation was [9,1,2]
    assert d.propose(3) == [9, 1, 2]
    d.extend([7])
    assert d.propose(2) == []  # suffix ...3,7 never seen before
    # single-token fallback: last occurrence of 3 -> followed by 9
    d2 = NgramDrafter([3, 9, 5, 3], max_ngram=1)
    assert d2.propose(1) == [9]


@pytest.mark.parametrize("prompt", [
    [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6],     # repetitive: drafts accepted
    [11, 3, 19, 42, 7, 23, 2, 31],          # arbitrary: drafts rejected
])
@pytest.mark.parametrize("draft_k", [4, 8])
def test_speculative_matches_plain_greedy(eng, prompt, draft_k):
    gen = GenerationConfig(max_new_tokens=24, temperature=0.0)
    want = eng.generate([prompt], gen)[0]
    stats = {}
    got = generate_speculative(eng, prompt, max_new_tokens=24,
                               draft_k=draft_k, stats=stats)
    assert got == want, (stats, got, want)
    assert stats["passes"] >= 1
    # the speculative path must not take MORE forward passes than plain
    # decode would (worst case: one emitted token per pass)
    assert stats["passes"] <= len(got) or len(got) == 0


def test_speculative_accepts_on_cycled_output(eng):
    """Random-weight greedy generation settles into a cycle; once the
    cycle is in history the drafter must start getting tokens accepted
    (multi-token passes — the entire point of speculation)."""
    prompt = [5, 6, 7]
    gen = GenerationConfig(max_new_tokens=48, temperature=0.0)
    want = eng.generate([prompt], gen)[0]
    stats = {}
    got = generate_speculative(eng, prompt, max_new_tokens=48,
                               draft_k=8, stats=stats)
    assert got == want
    if len(set(want)) < len(want):  # output actually repeats tokens
        assert stats["passes"] < len(got), stats  # fewer passes than tokens
        assert stats["accepted_drafts"] > 0, stats

def test_speculative_matches_greedy_at_window_edge():
    """Generation limited by max_seq_len (not max_new_tokens): the
    speculative path must shrink to single-token passes near the edge
    instead of stopping K tokens early (review finding r3)."""
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq_len=64)
    prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5]
    gen = GenerationConfig(max_new_tokens=100, temperature=0.0)
    want = eng.generate([prompt], gen)[0]
    stats = {}
    got = generate_speculative(eng, prompt, max_new_tokens=100,
                               draft_k=8, stats=stats)
    assert got == want, (len(got), len(want), stats)


def test_speculative_reuses_programs():
    """The verify/advance jits are cached on the engine — a second call
    must NOT rebuild them (review finding r3: per-call re-jit put a full
    XLA compile inside every generation)."""
    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    eng = InferenceEngine(cfg, params, max_batch=1, max_seq_len=64)
    generate_speculative(eng, [1, 2, 3], max_new_tokens=4, draft_k=4)
    progs = eng._speculative_programs
    generate_speculative(eng, [1, 2, 3], max_new_tokens=4, draft_k=4)
    assert eng._speculative_programs is progs


def test_session_speculative_matches_plain(eng):
    """ChatSession with speculative_k produces the same reply text as
    the plain engine-mode session (greedy, multi-turn incl. append)."""
    from mlc_llm_tpu.engine.session import ChatConfig, ChatSession
    from mlc_llm_tpu.models import get_config, init_random_params
    from mlc_llm_tpu.tokenizer import ByteTokenizer

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)

    def mk(spec_k):
        e = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
        chat = ChatConfig(temperature=0.0, max_gen_len=8, mean_gen_len=8,
                          max_window_size=128, seed=1)
        return ChatSession(e, ByteTokenizer(), cfg, chat,
                           conv_template="vicuna_v1.1",
                           speculative_k=spec_k)

    plain, spec = mk(None), mk(4)
    for turn in ("Hi", "More please"):
        assert spec.ask(turn) == plain.ask(turn)
