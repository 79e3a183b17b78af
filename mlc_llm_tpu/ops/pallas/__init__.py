"""Pallas TPU kernels for the hot compute paths.

Kernel inventory (replacing the reference's ~80 hand-scheduled TIR
kernel variants in /root/reference/mlc_llm/dispatch/ with a handful of
parameterized kernels):

- dequant_matmul: fused group-dequant + matmul (prefill tiles and
  decode gemv), epilogue fusion handled by XLA around the call
- flash attention over the static KV cache (added with paged KV)
"""

from .dequant_matmul import dequant_matmul, dequant_matmul_supported

__all__ = ["dequant_matmul", "dequant_matmul_supported"]
