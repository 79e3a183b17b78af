"""Cross-path differential comparison (the compare_lib.py analog).

The reference replays every kernel call on a second device/backend and
diffs numerically (/root/reference/tests/debug/compare_lib.py:26-57,
atol 1e-2 / rtol 1e-3). Our two "backends" are the jnp reference path
and the Pallas kernel path; this tool runs a forward under each and
reports logits + per-quantized-matmul deltas.

  python -m mlc_llm_tpu.debug.compare --model tiny-llama --platform cpu
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def compare_paths(cfg, params, tokens, max_len=None, atol=1e-2, rtol=1e-3):
    from ..models.transformer import forward, init_kv_cache
    from ..ops import use_kernels
    from ..ops.matmul import qmatmul
    from ..quant.groupwise import QuantizedTensor

    max_len = max_len or min(cfg.max_seq_len, 256)
    rows = []

    # per-weight matmul diffs (layer 0 weights, random activations)
    l0 = jax.tree_util.tree_map(lambda x: x[0], params["layers"])
    key = jax.random.PRNGKey(0)
    for name, w in sorted(l0.items()):
        if not isinstance(w, QuantizedTensor):
            continue
        x = jax.random.normal(key, (2, w.shape[0]), jnp.float32).astype(
            jnp.dtype(w.spec.dtype)
        )
        with use_kernels("jnp"):
            a = np.asarray(qmatmul(x, w), np.float32)
        with use_kernels("pallas"):
            b = np.asarray(qmatmul(x, w), np.float32)
        max_abs = float(np.abs(a - b).max())
        ok = np.allclose(a, b, atol=atol, rtol=rtol)
        rows.append((f"qmatmul[{name}]", max_abs, ok))

    # end-to-end logits diff
    caches = []
    outs = []
    for mode in ("jnp", "pallas"):
        with use_kernels(mode):
            cache = init_kv_cache(cfg, tokens.shape[0], max_len)
            logits, cache = forward(params, cfg, tokens, cache, last_only=True)
            outs.append(np.asarray(logits, np.float32))
            caches.append(cache)
    max_abs = float(np.abs(outs[0] - outs[1]).max())
    rows.append(("forward logits", max_abs, np.allclose(*outs, atol=atol, rtol=rtol)))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser("mlc_llm_tpu.debug.compare")
    ap.add_argument("--model", default="tiny-llama")
    ap.add_argument("--quantization", default="q4bf16")
    ap.add_argument("--atol", type=float, default=1e-2)
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        try:
            jax.config.update("jax_platforms", args.platform)
        except RuntimeError:
            pass

    from ..models import get_config, init_random_params

    cfg = get_config(args.model)
    params = init_random_params(cfg, args.quantization, seed=0)
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    rows = compare_paths(cfg, params, tokens, atol=args.atol, rtol=args.rtol)
    worst = 0.0
    for name, max_abs, ok in rows:
        print(f"{'OK ' if ok else 'DIFF'} {name:<28} max|Δ| = {max_abs:.3e}")
        worst = max(worst, max_abs)
    print(f"worst: {worst:.3e}")
    return 0 if all(ok for _, _, ok in rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())
