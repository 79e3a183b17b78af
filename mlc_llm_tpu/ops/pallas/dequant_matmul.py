"""Fused group-dequant + matmul Pallas kernel (placeholder — jnp path
is used until the kernel lands; see ops/matmul.py routing)."""

from __future__ import annotations

from ...quant.groupwise import QuantizedTensor


def dequant_matmul_supported(w: QuantizedTensor) -> bool:
    return False


def dequant_matmul(x, w: QuantizedTensor, out_dtype=None):
    raise NotImplementedError("Pallas dequant_matmul kernel not yet implemented")
