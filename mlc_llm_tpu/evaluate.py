"""Performance evaluation + per-op profiling harness.

The analog of the reference's tests/evaluate.py (single prefill+decode
timing, evaluate.py:83-130) and its --profile per-kernel tables
(evaluate.py:132-160, print_as_table :59-79). Timing uses chained
dispatch with long-minus-short subtraction because this environment's
tunneled TPU has ~25 ms readback RTT and a non-blocking
block_until_ready (see bench.py).

Usage:
  python -m mlc_llm_tpu.evaluate --model vicuna-v1-7b --fabricate
  python -m mlc_llm_tpu.evaluate --model tiny-llama --random --platform cpu
  python -m mlc_llm_tpu.evaluate ... --profile   # per-op table
"""

from __future__ import annotations

import argparse
import time
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _readback(x) -> float:
    return float(jnp.asarray(x).reshape(-1)[0])


def _chain_time(fn, x0, n_short: int, n_long: int) -> float:
    """Per-call seconds via chained dependent dispatch."""

    def chain(n):
        x = x0
        for _ in range(n):
            x = fn(x)
        return x

    _readback(chain(2))
    t = {}
    for n in (n_short, n_long):
        t0 = time.perf_counter()
        _readback(chain(n))
        t[n] = time.perf_counter() - t0
    return (t[n_long] - t[n_short]) / (n_long - n_short)


def profile_ops(cfg, params, max_len: int, ctx_len: int) -> List[Tuple[str, float, float]]:
    """Per-op (name, ms, GB/s) rows for the decode-path hot ops."""
    from .models.transformer import init_kv_cache
    from .ops.attention import attend_cache
    from .ops.matmul import qmatmul
    from .ops.sampling import sample_token
    from .quant.groupwise import QuantizedTensor

    rows = []
    short, long_ = (4, 20) if jax.default_backend() == "cpu" else (8, 72)

    def leaf_bytes(w):
        if isinstance(w, QuantizedTensor):
            return w.nbytes()
        return w.size * w.dtype.itemsize

    # one layer's weights (slice layer 0 off the stacked params)
    l0 = jax.tree_util.tree_map(lambda x: x[0], params["layers"])
    H = cfg.hidden_size
    x = jnp.ones((1, H), jnp.bfloat16) * 0.01
    for name in ("wqkv", "wo", "w_in", "w_out"):
        w = l0.get(name)
        if w is None:
            continue
        xin = jnp.ones((1, w.shape[0] if hasattr(w, "shape") else H), jnp.bfloat16) * 0.01
        f = jax.jit(lambda t, w=w, k=xin.shape[1]: (
            qmatmul(t, w).astype(jnp.bfloat16)[:, :k]
            if w.shape[1] >= k
            else jnp.pad(qmatmul(t, w).astype(jnp.bfloat16), ((0, 0), (0, k - w.shape[1])))
        ))
        per = _chain_time(f, xin, short, long_)
        nbytes = leaf_bytes(w) / (1 if not hasattr(w, "data") else 1)
        rows.append((f"dequant_matmul[{name}]", per * 1e3, nbytes / per / 1e9))

    # lm head
    lm = params["lm_head"]["w"]
    xl = jnp.ones((1, H), jnp.float32) * 0.01
    f = jax.jit(lambda t: qmatmul(t, lm, out_dtype=jnp.float32)[:, :H].astype(jnp.float32))
    per = _chain_time(f, xl, short, long_)
    rows.append(("lm_head", per * 1e3, leaf_bytes(lm) / per / 1e9))

    # attention at ctx_len
    cache = init_kv_cache(cfg, 1, max_len)
    kc, vc = cache.k[0], cache.v[0]
    q0 = jnp.ones((1, cfg.num_kv_heads, 1, cfg.head_dim), jnp.bfloat16)
    lengths = jnp.full((1,), ctx_len, jnp.int32)
    f = jax.jit(
        lambda t: attend_cache(t, kc, vc, None, None, lengths - 1).astype(jnp.bfloat16)
    )
    per = _chain_time(f, q0, short, long_)
    attn_bytes = 2 * cfg.num_kv_heads * ctx_len * cfg.head_dim * kc.dtype.itemsize
    rows.append((f"decode_attention[L={ctx_len}]x1layer", per * 1e3, attn_bytes / per / 1e9))

    # sampling
    logits = jnp.ones((1, cfg.vocab_size), jnp.float32)
    key = jax.random.PRNGKey(0)
    f = jax.jit(
        lambda t: sample_token(t + 0.0, key, 0.7, 0.95).astype(jnp.float32)[None, :]
        * jnp.ones((1, cfg.vocab_size), jnp.float32)
    )
    per = _chain_time(f, logits, short, long_)
    rows.append(("sample_top_p", per * 1e3, 0.0))
    return rows


def print_table(rows: List[Tuple[str, float, float]]) -> None:
    total = sum(ms for _, ms, _ in rows)
    print(f"{'op':<36} {'ms':>9} {'GB/s':>8} {'%':>6}")
    for name, ms, gbs in rows:
        pct = 100 * ms / total if total else 0
        print(f"{name:<36} {ms:>9.3f} {gbs:>8.1f} {pct:>5.1f}%")


def main(argv=None):
    ap = argparse.ArgumentParser("mlc_llm_tpu.evaluate")
    ap.add_argument("--model", default="vicuna-v1-7b")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--random", action="store_true")
    ap.add_argument("--fabricate", action="store_true")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen-len", type=int, default=64)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass

    from .models import forward, get_config, init_kv_cache, init_random_params
    from .ops.sampling import sample_token

    cfg = get_config(args.model)
    max_len = min(cfg.max_seq_len, args.max_seq_len)
    if args.prompt_len + args.gen_len >= max_len:
        raise SystemExit(
            f"--prompt-len {args.prompt_len} + --gen-len {args.gen_len} "
            f"must fit in max_seq_len {max_len}"
        )
    if args.weights:
        from .utils.checkpoint import load_params

        params, _ = load_params(args.weights)
    else:
        params = init_random_params(
            cfg, args.quantization, seed=0, fabricate=args.fabricate
        )

    cache = init_kv_cache(cfg, 1, max_len)
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(10, min(1000, cfg.vocab_size - 1),
                                          size=(1, args.prompt_len)),
        jnp.int32,
    )
    seq_lens = jnp.full((1,), args.prompt_len, jnp.int32)

    @jax.jit
    def prefill(params, tokens, seq_lens, cache):
        return forward(params, cfg, tokens, cache, seq_lens=seq_lens, last_only=True)

    @partial(jax.jit, donate_argnames=("cache",))
    def decode_n(params, tok, cache, key, n):
        def body(_, carry):
            tok, cache, key = carry
            logits, cache = forward(params, cfg, tok, cache, last_only=True)
            key, sub = jax.random.split(key)
            nxt = sample_token(logits, sub, 0.7, 0.95)
            return (nxt[:, None], cache, key)

        return jax.lax.fori_loop(0, n, body, (tok, cache, key))

    # prefill timing (compile, then timed)
    logits, cache = prefill(params, prompt, seq_lens, cache)
    _readback(logits)
    cache = init_kv_cache(cfg, 1, max_len)
    t0 = time.perf_counter()
    logits, cache = prefill(params, prompt, seq_lens, cache)
    _readback(logits)
    prefill_s = time.perf_counter() - t0
    print(f"prefill[{args.prompt_len}]: {prefill_s*1e3:.1f} ms "
          f"({args.prompt_len/prefill_s:.1f} tok/s incl. readback RTT)")

    tok = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
    key = jax.random.PRNGKey(0)
    out = decode_n(params, tok, cache, key, 2)
    _readback(out[0])
    cache = out[1]
    ts = {}
    short, long_ = (2, 6) if jax.default_backend() == "cpu" else (8, 8 + args.gen_len)
    for n in (short, long_):
        t0 = time.perf_counter()
        out = decode_n(params, tok, cache, key, n)
        _readback(out[0])
        cache = out[1]
        ts[n] = time.perf_counter() - t0
    per = (ts[long_] - ts[short]) / (long_ - short)
    print(f"decode: {per*1e3:.2f} ms/tok ({1/per:.1f} tok/s)")

    if args.profile:
        print()
        print_table(profile_ops(cfg, params, max_len, args.prompt_len))


if __name__ == "__main__":
    main()
