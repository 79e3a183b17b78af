"""Perplexity evaluation (quantization-quality gate).

BASELINE.md requires perplexity parity at equal bit-width; the
reference only eyeballs logits (tests/chat.py:80-84). This tool
computes token-level NLL/perplexity over a token stream with a sliding
window, for any quantization preset, so formats can be compared:

  python -m mlc_llm_tpu.ppl --model tiny-llama --random --platform cpu \
      --tokens-file toks.npy
  python -m mlc_llm_tpu.ppl --weights dist/vicuna-q4 --model vicuna-v1-7b \
      --text-file wiki.txt --tokenizer /path/to/tok
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(
    params, cfg, tokens: np.ndarray, *, window: int = 512, stride: int = 256,
    cache_dtype=jnp.bfloat16,
) -> dict:
    """Sliding-window NLL over a 1-D token array."""
    from .models.transformer import forward, init_kv_cache

    tokens = np.asarray(tokens, np.int32)
    assert tokens.ndim == 1 and len(tokens) >= 2

    @jax.jit
    def window_nll(params, toks):
        cache = init_kv_cache(cfg, 1, window, cache_dtype)
        logits, _ = forward(params, cfg, toks[None, :], cache, last_only=False)
        logp = jax.nn.log_softmax(logits[0], axis=-1)
        nll = -jnp.take_along_axis(logp[:-1], toks[1:, None], axis=-1)[:, 0]
        return nll  # [window-1]

    total_nll = 0.0
    total_cnt = 0
    pos = 0
    while pos + 2 <= len(tokens):
        chunk = tokens[pos : pos + window]
        if len(chunk) < window:
            chunk = np.pad(chunk, (0, window - len(chunk)))
        nll = np.asarray(window_nll(params, jnp.asarray(chunk)))
        # score only tokens whose full left context is in this window
        start_score = 0 if pos == 0 else window - stride - 1
        end_score = min(window, len(tokens) - pos) - 1
        if end_score > start_score:
            total_nll += float(nll[start_score:end_score].sum())
            total_cnt += end_score - start_score
        pos += stride
        if pos + window > len(tokens) and pos + 2 > len(tokens):
            break
    mean_nll = total_nll / max(total_cnt, 1)
    return {
        "tokens_scored": total_cnt,
        "nll": mean_nll,
        "perplexity": float(np.exp(mean_nll)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser("mlc_llm_tpu.ppl")
    ap.add_argument("--model", required=True)
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--tokens-file", default=None, help=".npy int token array")
    ap.add_argument("--text-file", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass

    from .models import get_config, init_random_params

    cfg = get_config(args.model)
    if args.weights:
        from .utils.checkpoint import load_params

        params, _ = load_params(args.weights)
    else:
        params = init_random_params(cfg, args.quantization, seed=0)

    if args.tokens_file:
        toks = np.load(args.tokens_file)
    elif args.text_file:
        from .tokenizer import load_tokenizer

        tok = load_tokenizer(args.tokenizer)
        toks = np.asarray(tok.encode(open(args.text_file).read()), np.int32)
    else:
        # deterministic synthetic stream (structure-free; for smoke runs)
        toks = np.random.default_rng(0).integers(
            0, cfg.vocab_size, size=2048, dtype=np.int32
        )

    window = min(args.window, cfg.max_seq_len)
    res = perplexity(params, cfg, toks, window=window,
                     stride=min(args.stride, window // 2))
    res["model"] = cfg.name
    res["quantization"] = args.quantization if not args.weights else "from-checkpoint"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
