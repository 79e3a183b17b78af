"""Compiler-stage debug dumps (the reference's bisection surface).

The reference exposes --debug-dump-script (TVMScript per pipeline
stage), --debug-load-script and --debug-dump-shader as first-class
build.py flags (/root/reference/build.py:68-101) — SURVEY.md §4 idiom 5
calls this "compiler-stage observability as test surface".

The XLA analog dumps each engine program at its three stages:

  <name>.jaxpr.txt      the traced jaxpr (closest to "relax stage" dump)
  <name>.stablehlo.txt  lowered StableHLO (pre-XLA-pipeline module)
  <name>.hlo_opt.txt    optimized HLO after XLA compilation (the
                        "shader source" analog — what actually runs)

Hand-patching a stage (--debug-load-script) has no XLA equivalent at
this layer; the supported bisection flow is editing the model fn and
re-dumping, plus XLA_FLAGS=--xla_dump_to=<dir> for pass-by-pass dumps.

Used via `--debug-dump-dir` on the CLI and evaluate entry points.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _write(path: str, text: str) -> None:
    with open(path, "w") as f:
        f.write(text)


def dump_lowered(name: str, lowered, outdir: str, compile_too: bool = True):
    """Write the three stage dumps for one jax .lower() result."""
    os.makedirs(outdir, exist_ok=True)
    _write(os.path.join(outdir, f"{name}.stablehlo.txt"), lowered.as_text())
    if compile_too:
        compiled = lowered.compile()
        _write(os.path.join(outdir, f"{name}.hlo_opt.txt"), compiled.as_text())
    return lowered


def dump_engine_programs(
    engine,
    outdir: str,
    prefill_bucket: int = 128,
    compile_too: bool = True,
) -> list:
    """Dump the engine's prefill / decode / slot-prefill programs.

    Returns the list of artifact basenames written.
    """
    os.makedirs(outdir, exist_ok=True)
    B = engine.max_batch
    cache = engine.cache
    params = engine.params
    bucket = engine.bucket_for(prefill_bucket)
    toks = jnp.zeros((B, bucket), jnp.int32)
    seq_lens = jnp.full((B,), bucket, jnp.int32)
    written = []

    def jaxpr_of(fn, *a, **kw):
        try:
            return str(jax.make_jaxpr(fn, static_argnums=())(*a, **kw))
        except Exception as e:  # jaxpr of donated jitted fns can differ
            return f"<jaxpr unavailable: {type(e).__name__}: {e}>"

    # prefill (batched, bucketed)
    low = engine._prefill.lower(params, toks, seq_lens, cache)
    dump_lowered("prefill", low, outdir, compile_too)
    _write(
        os.path.join(outdir, "prefill.jaxpr.txt"),
        jaxpr_of(engine._prefill, params, toks, seq_lens, cache),
    )
    written += ["prefill.jaxpr.txt", "prefill.stablehlo.txt"]

    # decode + fused sampling (one window bucket)
    window = engine.decode_window(bucket + 1)
    args = (
        params,
        jnp.zeros((B, 1), jnp.int32),
        cache,
        jnp.zeros((B,), jnp.uint32),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.float32),
        jnp.ones((B,), jnp.float32),
        jnp.ones((B,), bool),
    )
    low = engine._decode_sample.lower(*args, attn_window=window)
    dump_lowered(f"decode_w{window}", low, outdir, compile_too)
    _write(
        os.path.join(outdir, f"decode_w{window}.jaxpr.txt"),
        jaxpr_of(lambda *a: engine._decode_sample(*a, attn_window=window), *args),
    )
    written += [f"decode_w{window}.jaxpr.txt", f"decode_w{window}.stablehlo.txt"]

    # single-slot admission prefill. engine._prefill_slot can be a plain
    # wrapper on paged engines (no .lower); _prefill_slot_jit is the
    # underlying jitted program for both layouts, and the positional
    # prefix (params, tokens, seq_len, cache, slot, append) is shared.
    low = engine._prefill_slot_jit.lower(
        params,
        jnp.zeros((1, bucket), jnp.int32),
        jnp.asarray(bucket, jnp.int32),
        cache,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    dump_lowered("prefill_slot", low, outdir, compile_too)
    written += ["prefill_slot.stablehlo.txt"]
    if compile_too:
        written += [
            "prefill.hlo_opt.txt",
            f"decode_w{window}.hlo_opt.txt",
            "prefill_slot.hlo_opt.txt",
        ]
    return sorted(written)
