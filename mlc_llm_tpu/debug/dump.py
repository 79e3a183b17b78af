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

Hand-patching a stage (--debug-load-script, reference build.py:78-82)
DOES have an XLA analog here: edit a dumped <name>.stablehlo.txt and
re-inject it with `load_stablehlo` / `reinject_engine_program` — the
edited module is compiled directly by the backend (bypassing tracing)
and executed on the same example arguments the dump used. Plus
XLA_FLAGS=--xla_dump_to=<dir> for pass-by-pass compiler dumps.

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


def engine_program_args(engine, prefill_bucket: int = 128) -> dict:
    """Example (jitted_fn, args, static_kwargs) per engine program name
    — shared by the dump and re-injection paths so an edited dump is
    executed on exactly the arguments it was lowered with."""
    B = engine.max_batch
    cache = engine.cache
    params = engine.params
    bucket = engine.bucket_for(prefill_bucket)
    toks = jnp.zeros((B, bucket), jnp.int32)
    seq_lens = jnp.full((B,), bucket, jnp.int32)
    window = engine.decode_window(bucket + 1)
    decode_args = (
        params,
        jnp.zeros((B, 1), jnp.int32),
        cache,
        jnp.zeros((B,), jnp.uint32),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), jnp.float32),
        jnp.ones((B,), jnp.float32),
        jnp.ones((B,), bool),
    )
    slot_args = (
        params,
        jnp.zeros((1, bucket), jnp.int32),
        jnp.asarray(bucket, jnp.int32),
        cache,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    return {
        "prefill": (engine._prefill, (params, toks, seq_lens, cache), {}),
        f"decode_w{window}": (
            engine._decode_sample, decode_args, {"attn_window": window}
        ),
        "prefill_slot": (engine._prefill_slot_jit, slot_args, {}),
    }


def dump_engine_programs(
    engine,
    outdir: str,
    prefill_bucket: int = 128,
    compile_too: bool = True,
) -> list:
    """Dump the engine's prefill / decode / slot-prefill programs.

    (The slot prefill is lowered via engine._prefill_slot_jit: on paged
    engines engine._prefill_slot is a plain wrapper with no .lower.)
    Returns the list of artifact basenames written.
    """
    os.makedirs(outdir, exist_ok=True)
    written = []

    def jaxpr_of(fn, *a, **kw):
        try:
            return str(jax.make_jaxpr(fn, static_argnums=())(*a, **kw))
        except Exception as e:  # jaxpr of donated jitted fns can differ
            return f"<jaxpr unavailable: {type(e).__name__}: {e}>"

    programs = engine_program_args(engine, prefill_bucket)
    for name, (fn, args, static_kw) in programs.items():
        low = fn.lower(*args, **static_kw)
        dump_lowered(name, low, outdir, compile_too)
        written.append(f"{name}.stablehlo.txt")
        if name != "prefill_slot":  # matches the round-1 dump surface
            _write(
                os.path.join(outdir, f"{name}.jaxpr.txt"),
                jaxpr_of(lambda *a: fn(*a, **static_kw), *args),
            )
            written.append(f"{name}.jaxpr.txt")
        if compile_too:
            written.append(f"{name}.hlo_opt.txt")
    return sorted(written)


# ------------------------------------------------ stage re-injection

def compile_stablehlo(text: str):
    """Compile (possibly hand-edited) StableHLO module text directly via
    the backend — the analog of the reference's --debug-load-script
    (reference build.py:78-82: re-run one hand-patched compiler stage).

    Returns run(*flat_args) -> list of output arrays; flat_args must
    match the module's entry signature (use jax.tree.leaves of the
    original example args)."""
    import jax as _jax
    from jax._src import compiler as _compiler  # debug-only private dep
    from jaxlib import _jax as _xc

    client = _jax.devices()[0].client
    devs = _xc.DeviceList(tuple(_jax.devices()[:1]))
    opts = _compiler.get_compile_options(num_replicas=1, num_partitions=1)
    exe = client.compile_and_load(text, devs, opts)

    def run(*flat_args):
        # REAL copies, not device_put: modules dumped from donating jits
        # carry input-output aliases, and executing them consumes the
        # input buffers (device_put on a same-device array is a no-op
        # that would hand the caller's live buffers to the aliaser)
        bufs = [jnp.array(a, copy=True) for a in flat_args]
        res = exe.execute_sharded(bufs)
        return [
            pieces[0] for pieces in
            res.disassemble_into_single_device_arrays()
        ]

    return run


def load_stablehlo(path: str):
    """compile_stablehlo over a dumped (and possibly edited) file."""
    with open(path) as f:
        return compile_stablehlo(f.read())


def reinject_engine_program(engine, name: str, path: str,
                            prefill_bucket: int = 128):
    """Round-trip: execute the (edited) StableHLO dump of one engine
    program on the same example arguments the dump was lowered with.

    Returns the flat list of output arrays (e.g. for 'prefill':
    [logits, *cache leaves])."""
    programs = engine_program_args(engine, prefill_bucket)
    if name not in programs:
        raise KeyError(f"unknown engine program {name!r}; "
                       f"have {sorted(programs)}")
    _, args, _ = programs[name]
    run = load_stablehlo(path)
    flat = jax.tree_util.tree_leaves(args)
    return run(*flat)
