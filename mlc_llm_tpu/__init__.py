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
