"""Tokenizer bridge.

The reference wraps sentencepiece + the Rust `tokenizers` crate behind a
C++ shim with auto-detection by artifact file
(/root/reference/cpp/llm_chat.cc:368-448). Here the bridge wraps HF
`transformers` fast tokenizers (same tokenizer.json / tokenizer.model /
vocab.json+merges.txt artifacts), plus a pure-Python byte tokenizer for
offline tests and random-weight benchmarking.
"""

from __future__ import annotations

import os
from typing import List, Protocol


class Tokenizer(Protocol):
    def encode(self, text: str) -> List[int]: ...
    def decode(self, ids: List[int]) -> str: ...

    @property
    def vocab_size(self) -> int: ...


class HFTokenizer:
    """transformers.AutoTokenizer wrapper (tokenizer.json / .model /
    vocab.json+merges.txt are all handled by AutoTokenizer, mirroring
    the reference's three-way detection at llm_chat.cc:428-448)."""

    def __init__(self, path: str, add_prefix_space: bool = False):
        from transformers import AutoTokenizer

        kwargs = {}
        if add_prefix_space:
            # MOSS quirk (llm_chat.cc:498)
            kwargs["add_prefix_space"] = True
        self._tok = AutoTokenizer.from_pretrained(path, use_fast=True, **kwargs)

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text, add_special_tokens=False)

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=False)

    @property
    def vocab_size(self) -> int:
        return len(self._tok)


class ByteTokenizer:
    """1 byte = 1 token (ids 0..255). Deterministic, dependency-free;
    used by tests and random-weight benchmarks (tiny configs have
    vocab_size 256)."""

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids: List[int]) -> str:
        return bytes(i for i in ids if 0 <= i < 256).decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return 256


def load_tokenizer(path: str | None, add_prefix_space: bool = False) -> Tokenizer:
    """Auto-detect: HF artifacts if present at `path`, else bytes."""
    if path and os.path.isdir(path):
        for f in ("tokenizer.json", "tokenizer.model", "vocab.json"):
            if os.path.exists(os.path.join(path, f)):
                return HFTokenizer(path, add_prefix_space=add_prefix_space)
    if path and path not in ("bytes", None):
        try:
            return HFTokenizer(path, add_prefix_space=add_prefix_space)
        except Exception:
            pass
    return ByteTokenizer()
