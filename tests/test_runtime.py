"""Conversation templating, tokenizer, chat session, checkpoint tests."""

import numpy as np
import pytest

from mlc_llm_tpu.conversation import CONV_TEMPLATES, get_conversation
from mlc_llm_tpu.tokenizer import ByteTokenizer, load_tokenizer


def test_vicuna_prompt_shape():
    c = get_conversation("vicuna_v1.1")
    c.append(c.roles[0], "Hello!")
    c.append(c.roles[1], None)
    p = c.get_prompt()
    assert p.startswith("A chat between a curious user")
    assert p.endswith("USER: Hello! ASSISTANT:")


def test_vicuna_incremental_round2():
    c = get_conversation("vicuna_v1.1")
    c.append(c.roles[0], "Hi")
    c.append(c.roles[1], None)
    c.get_prompt()
    c.update_last("Hello there")
    c.append(c.roles[0], "How are you?")
    c.append(c.roles[1], None)
    inc = c.get_prompt_unprocessed()
    # starts with sep2 and contains only the new turns
    assert inc.startswith("</s>")
    assert "How are you?" in inc and "Hi" not in inc
    assert inc.endswith("ASSISTANT:")


def test_dolly_prompt():
    c = get_conversation("dolly")
    c.append(c.roles[0], "Write a poem")
    c.append(c.roles[1], None)
    p = c.get_prompt()
    assert "### Instruction:\nWrite a poem\n" in p
    assert p.endswith("### Response:\n")


def test_one_shot_has_example_and_offset():
    c = get_conversation("conv_one_shot")
    assert len(c.messages) == 2
    c.append(c.roles[0], "Hello")
    c.append(c.roles[1], None)
    p = c.get_prompt()
    assert "renewable" in p  # baked-in example
    c.reset()
    assert len(c.messages) == 2  # offset-protected example survives reset


def test_moss_and_stablelm_styles():
    m = get_conversation("moss")
    m.append(m.roles[0], "你好")
    m.append(m.roles[1], None)
    p = m.get_prompt()
    assert p.endswith("<|MOSS|>:")
    assert "<|Human|>: 你好<eoh>\n" in p

    s = get_conversation("stablelm")
    s.append(s.roles[0], "hey")
    s.append(s.roles[1], None)
    assert s.get_prompt().endswith("<|USER|>hey<|ASSISTANT|>")


def test_all_templates_render():
    for name in CONV_TEMPLATES:
        c = get_conversation(name)
        c.append(c.roles[0], "test")
        c.append(c.roles[1], None)
        assert isinstance(c.get_prompt(), str)


def test_byte_tokenizer_round_trip():
    t = ByteTokenizer()
    s = "hello, 世界!"
    assert t.decode(t.encode(s)) == s
    assert load_tokenizer(None).vocab_size == 256


def test_chat_session_end_to_end():
    from mlc_llm_tpu.engine import InferenceEngine
    from mlc_llm_tpu.engine.session import ChatConfig, ChatSession
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama").replace(max_seq_len=512)
    eng = InferenceEngine(cfg, init_random_params(cfg, "f32", seed=0),
                          max_batch=1, max_seq_len=512)
    chat = ChatConfig(temperature=0.0, max_gen_len=8, mean_gen_len=8,
                      max_window_size=512, seed=1)
    sess = ChatSession(eng, ByteTokenizer(), cfg, chat,
                       conv_template="vicuna_v1.1")
    r1 = sess.ask("Hi")
    assert isinstance(r1, str)
    assert sess.total_len > 0
    t1 = sess.total_len
    r2 = sess.ask("More")  # second turn uses incremental prefill
    assert sess.total_len > t1
    # reply recorded in history
    assert sess.conv.messages[-1][1] == r2.strip()
    sess.reset()
    assert sess.total_len == 0


def test_chat_session_window_shift():
    from mlc_llm_tpu.engine import InferenceEngine
    from mlc_llm_tpu.engine.session import ChatConfig, ChatSession
    from mlc_llm_tpu.models import get_config, init_random_params

    cfg = get_config("tiny-llama")
    eng = InferenceEngine(cfg, init_random_params(cfg, "f32", seed=0),
                          max_batch=1, max_seq_len=128)
    chat = ChatConfig(temperature=0.0, max_gen_len=4, mean_gen_len=16,
                      max_window_size=64, seed=1)
    sess = ChatSession(eng, ByteTokenizer(), cfg, chat,
                       conv_template="vicuna_v1.1")
    for i in range(6):  # enough turns to overflow a 64-token window
        sess.ask(f"question number {i}, please elaborate")
        assert sess.total_len + chat.mean_gen_len <= 2 * 128


def test_checkpoint_round_trip(tmp_path):
    import jax.numpy as jnp

    from mlc_llm_tpu.models import forward, get_config, init_kv_cache, init_random_params
    from mlc_llm_tpu.utils.checkpoint import load_params, save_params

    cfg = get_config("tiny-gpt_neox")
    params = init_random_params(cfg, "q4bf16", seed=5)
    save_params(params, str(tmp_path / "ckpt"), meta={"model": cfg.name})
    loaded, meta = load_params(str(tmp_path / "ckpt"))
    assert meta["model"] == cfg.name

    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    la, _ = forward(params, cfg, toks, init_kv_cache(cfg, 1, 16), last_only=True)
    lb, _ = forward(loaded, cfg, toks, init_kv_cache(cfg, 1, 16), last_only=True)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_cli_one_shot(capsys):
    from mlc_llm_tpu import cli

    cli.main([
        "--model", "tiny-llama", "--random-weights", "--quantization", "f32",
        "--platform", "cpu", "--prompt", "Hello", "--max-gen-len", "4",
        "--temperature", "0", "--seed", "3", "--max-window-size", "64",
    ])
    out = capsys.readouterr().out
    assert isinstance(out, str)


def test_build_then_cli_roundtrip(tmp_path, capsys):
    """build driver -> checkpoint -> CLI one-shot (full artifact path)."""
    from mlc_llm_tpu import build as build_mod
    from mlc_llm_tpu import cli

    out = str(tmp_path / "ck")
    build_mod.main([
        "--model", "tiny-llama", "--random", "--quantization", "q4bf16",
        "-o", out, "--platform", "cpu",
    ])
    capsys.readouterr()
    cli.main([
        "--model", "tiny-llama", "--weights", out, "--platform", "cpu",
        "--prompt", "Hey", "--max-gen-len", "3", "--temperature", "0",
        "--seed", "1", "--max-window-size", "256",
    ])
    assert isinstance(capsys.readouterr().out, str)


def test_version():
    from mlc_llm_tpu.version import full_version

    assert full_version().startswith("0.1.0+g")


def test_incremental_chunks_reassemble_full_prompt():
    """For every template: first chunk + generated reply + later chunks
    must reassemble the full prompt a fresh conversation would render
    (the KV-cache incremental-prefill invariant; whitespace-insensitive
    because some styles add cosmetic newlines only in the full render,
    exactly as the reference does)."""

    def canon(t):
        return "".join(t.split())

    replies = ["Sure!", "Here you go."]
    for name in CONV_TEMPLATES:
        c = get_conversation(name)
        assembled = ""
        for q, r in [("first question", replies[0]),
                     ("second question", replies[1])]:
            c.append(c.roles[0], q)
            c.append(c.roles[1], None)
            assembled += c.get_prompt_unprocessed()
            c.update_last(r)  # the generated reply enters the KV as-is
            assembled += r
            # MOSS-style models emit their own <eom> marker, which lands
            # in the KV before the stop is detected (OASST's marker is
            # re-supplied by the next incremental chunk instead)
            from mlc_llm_tpu.conversation import SeparatorStyle

            if c.sep_style == SeparatorStyle.MOSS:
                assembled += c.stop_str() or ""

        fresh = get_conversation(name)
        for q, r in [("first question", replies[0]),
                     ("second question", replies[1])]:
            fresh.append(fresh.roles[0], q)
            fresh.append(fresh.roles[1], r)
        full = canon(fresh.get_prompt())
        got = canon(assembled)
        # the full render may append trailing separators after the last
        # reply that the live session never generated
        assert full.startswith(got) or got.startswith(full), (
            name, got[-80:], full[-80:])


def test_cli_artifact_search(tmp_path, capsys, monkeypatch):
    """Without --weights, the CLI searches dist/<model>* like the
    reference's FindFile (cli_main.cc:259-338)."""
    import subprocess
    import sys

    from mlc_llm_tpu.build import main as build_main
    from mlc_llm_tpu.cli import main as cli_main

    monkeypatch.chdir(tmp_path)
    build_main(["--model", "tiny-llama", "--random", "--platform", "cpu",
                "--quantization", "q4bf16",
                "-o", str(tmp_path / "dist" / "tiny-llama-q4bf16")])
    capsys.readouterr()
    cli_main(["--model", "tiny-llama", "--quantization", "q4bf16",
              "--platform", "cpu", "--prompt", "hi", "--temperature", "0",
              "--max-gen-len", "4", "--max-window-size", "64"])
    out = capsys.readouterr()
    assert "using checkpoint dist/tiny-llama-q4bf16" in out.err
    assert "decode:" in out.err  # generated and printed the stats line


def test_cli_artifact_search_skips_wrong_quantization(tmp_path, capsys, monkeypatch):
    """A dist/<model> checkpoint built with a different quantization is
    skipped with a warning, not silently loaded (review finding r3)."""
    import pytest

    from mlc_llm_tpu.build import main as build_main
    from mlc_llm_tpu.cli import find_artifacts

    monkeypatch.chdir(tmp_path)
    build_main(["--model", "tiny-llama", "--random", "--platform", "cpu",
                "--quantization", "q3bf16",
                "-o", str(tmp_path / "dist" / "tiny-llama")])
    capsys.readouterr()
    assert find_artifacts("tiny-llama", "q4bf16") is None
    assert "built as q3bf16" in capsys.readouterr().err
    # matching request finds it
    assert find_artifacts("tiny-llama", "q3bf16") == "dist/tiny-llama"


# ---------------------------------------------------------------------------
# Real-BPE tokenizer fixture (tests/fixtures/tiny_bpe): a 491-token
# byte-level BPE trained offline and committed, so the HFTokenizer
# bridge + UTF-8 holdback + multi-token stop strings run in CI against
# real multi-byte BPE token streams instead of only the 1-byte
# ByteTokenizer (reference: llm_chat.cc:428-448,726-749).

import os as _os

FIXTURE_TOK = _os.path.join(_os.path.dirname(__file__), "fixtures", "tiny_bpe")


def test_bpe_fixture_loads_and_round_trips():
    from mlc_llm_tpu.tokenizer import HFTokenizer

    t = load_tokenizer(FIXTURE_TOK)
    assert isinstance(t, HFTokenizer)
    for s in ("Hello, world!", "naïve café — déjà vu", "日本語 🚀✨",
              "### Instruction:\ndef f(x):\n    return x + 1"):
        assert t.decode(t.encode(s)) == s
    # multi-byte chars span multiple byte-level tokens: partial decodes
    # surface U+FFFD, which the streaming layer must hold back
    ids = t.encode("🚀")
    assert len(ids) > 1
    assert "�" in t.decode(ids[:1])


def test_chat_session_bpe_streaming_utf8_holdback_and_stop():
    """Drive ChatSession's streaming layer with a scripted BPE token
    stream: a multi-byte emoji split across tokens (held back until
    complete) and a stop string arriving ACROSS MULTIPLE TOKENS (never
    emitted)."""
    from types import SimpleNamespace

    from mlc_llm_tpu.engine.session import ChatConfig, ChatSession

    t = load_tokenizer(FIXTURE_TOK)
    # scripted reply: emoji (multi-token), text, then the vicuna stop
    # string "</s>" built from two pieces, then junk that must not leak
    reply_ids = (t.encode("ok 🚀 fine") + t.encode("</") + t.encode("s>")
                 + t.encode(" JUNK"))
    stop_text = t.decode(t.encode("</") + t.encode("s>"))
    assert stop_text == "</s>"

    cfg = SimpleNamespace(conv_template="vicuna_v1.1", bos_token_id=None)
    sess = ChatSession(engine=SimpleNamespace(max_seq_len=512,
                                              reset=lambda slots: None),
                       tokenizer=t,
                       cfg=cfg,
                       chat=ChatConfig(temperature=0.0, max_gen_len=64,
                                       max_window_size=512))
    def scripted(tokens, gen):
        yield from reply_ids

    sess._engine_tokens = scripted

    chunks = list(sess.chat_stream("hi"))
    text = "".join(chunks)
    assert text == "ok 🚀 fine"
    # no partial UTF-8 ever leaked mid-stream
    assert all("�" not in c for c in chunks)
    # the emoji arrived in one piece in a single chunk
    assert any("🚀" in c for c in chunks)
    # the multi-token stop string and everything after it were cropped
    assert "</s>" not in text and "JUNK" not in text
    # reply recorded in conversation history without the stop string
    assert sess.conv.messages[-1][1] == "ok 🚀 fine"
