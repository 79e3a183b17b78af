"""mlc_llm_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of early
MLC-LLM (reference: /root/reference, see SURVEY.md):

- group-wise weight-only quantization (int4 / int3 / fp4, sym / asym)
  with packed storage and fused dequant+matmul Pallas kernels
- Llama / GPT-NeoX / MOSS model families as pure-functional JAX graphs
- static-shape bucketed prefill + single-token decode with a
  preallocated KV cache (fp16/bf16/int8)
- on-device sampling (temperature / top-p / top-k)
- conversation templating, tokenizer bridge, streaming chat CLI
- tensor-parallel sharding over a `jax.sharding.Mesh` (ICI/DCN axes)
  and a continuous-batching engine

The reference's compiler stack (Relax tracing, TIR schedules,
MetaSchedule DBs) is replaced by XLA compilation of jitted functions
plus hand-written Pallas kernels for the hot dequant/attention paths.
"""

__version__ = "0.1.0"

import os as _os

# Pallas/Mosaic compiles are expensive in this environment (tens of
# seconds per kernel variant); persist compiled executables across
# processes unless the user already configured a cache.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    _cache = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
    try:
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# Diagnostics for persistent-cache misses (a full 7B bench session costs
# ~20 min of Mosaic recompiles when the cache silently misses): set
# MLC_EXPLAIN_CACHE_MISSES=1 to have JAX log WHY each key missed, and to
# surface cache read/write errors instead of swallowing them.
if _os.environ.get("MLC_EXPLAIN_CACHE_MISSES"):
    import jax as _jax

    try:
        _jax.config.update("jax_explain_cache_misses", True)
        _jax.config.update("jax_raise_persistent_cache_errors", True)
    except Exception:
        pass
