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


def test_session_speculative_matches_plain():
    """ChatSession with speculative_k produces the same reply text as
    the plain engine-mode session (greedy, multi-turn incl. append).
    Turns are long enough (max_gen_len=16) that verify passes actually
    accept drafts — with 8-token turns acceptance was zero and the test
    was vacuous on the multi-turn KV-length contract (review r3)."""
    from mlc_llm_tpu.engine.session import ChatConfig, ChatSession
    from mlc_llm_tpu.models import get_config, init_random_params
    from mlc_llm_tpu.tokenizer import ByteTokenizer

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)

    def mk(spec_k):
        e = InferenceEngine(cfg, params, max_batch=1, max_seq_len=256)
        chat = ChatConfig(temperature=0.0, max_gen_len=16, mean_gen_len=16,
                          max_window_size=256, seed=1)
        return ChatSession(e, ByteTokenizer(), cfg, chat,
                           conv_template="vicuna_v1.1",
                           speculative_k=spec_k), e

    (plain, eng_p), (spec, eng_s) = mk(None), mk(4)
    for turn in ("Hi hi hi hi hi", "More please more please"):
        assert spec.ask(turn) == plain.ask(turn)
        lp = int(np.asarray(eng_p.cache.lengths)[0])
        ls = int(np.asarray(eng_s.cache.lengths)[0])
        assert ls == lp, (ls, lp)


def test_speculative_multiturn_append_matches_plain():
    """Review repro: accepted-but-never-emitted tokens must NOT stay in
    the KV. Turn 1 is capped mid-pass (max_new_tokens=12 with draft_k=4
    on a repetitive prompt -> nonzero acceptance), then turn 2 appends
    (reset=False): token streams AND device lengths must match plain
    greedy in both turns."""
    from mlc_llm_tpu.engine.speculative import generate_speculative

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    prompt = [5, 6, 7] * 3
    gen = GenerationConfig(max_new_tokens=12, temperature=0.0)

    eng_p = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    want1 = eng_p.generate([prompt], gen)[0]
    len_p = int(np.asarray(eng_p.cache.lengths)[0])

    eng_s = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    stats = {}
    got1 = generate_speculative(eng_s, prompt, max_new_tokens=12,
                                draft_k=4, stats=stats)
    len_s = int(np.asarray(eng_s.cache.lengths)[0])
    assert got1 == want1
    assert stats["accepted_drafts"] > 0, (
        "repro needs nonzero acceptance; adjust prompt/draft_k"
    )
    assert len_s == len_p, (len_s, len_p)

    # turn 2: append
    turn2 = [9, 9, 5, 6, 7]
    want2 = eng_p.generate([turn2], gen, reset=False)[0]
    got2 = generate_speculative(eng_s, turn2, max_new_tokens=12,
                                draft_k=4, reset=False)
    assert got2 == want2, (got2, want2)


def test_speculative_stop_token_matches_plain():
    """A stop token hit mid-pass must leave the KV exactly as the plain
    loop does (the plain loop's dispatch-ahead feeds the stop token
    before detecting it)."""
    from mlc_llm_tpu.engine.speculative import generate_speculative

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    prompt = [5, 6, 7] * 3
    base_gen = GenerationConfig(max_new_tokens=12, temperature=0.0)

    probe = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    base = probe.generate([prompt], base_gen)[0]
    if len(base) < 4:
        pytest.skip("need a few tokens to pick a stop from")
    stop_tok = base[3]  # cut generation at the 4th token

    gen = GenerationConfig(max_new_tokens=12, temperature=0.0,
                           stop_tokens=(stop_tok,))
    eng_p = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    want = eng_p.generate([prompt], gen)[0]
    eng_s = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128)
    got = generate_speculative(eng_s, prompt, max_new_tokens=12,
                               draft_k=4, stop_tokens={stop_tok})
    assert got == want, (got, want)
    len_p = int(np.asarray(eng_p.cache.lengths)[0])
    len_s = int(np.asarray(eng_s.cache.lengths)[0])
    assert len_s == len_p, (len_s, len_p)


def test_speculative_matches_plain_int8_kv():
    """Speculation must hold its exactness with an int8 KV cache: the
    per-token absmax quantization is identical whether a token is
    written by an S=K verify pass or an S=1 decode step."""
    from mlc_llm_tpu.engine.speculative import generate_speculative

    cfg = get_config("tiny-llama")
    params = init_random_params(cfg, "f32", seed=0)
    import jax.numpy as jnp

    gen = GenerationConfig(max_new_tokens=16, temperature=0.0)
    prompt = [5, 6, 7] * 3
    eng_p = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128,
                            cache_dtype=jnp.int8)
    want = eng_p.generate([prompt], gen)[0]
    eng_s = InferenceEngine(cfg, params, max_batch=1, max_seq_len=128,
                            cache_dtype=jnp.int8)
    stats = {}
    got = generate_speculative(eng_s, prompt, max_new_tokens=16,
                               draft_k=4, stats=stats)
    assert got == want, (got, want, stats)
