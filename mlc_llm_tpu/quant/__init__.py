"""Group-wise weight-only quantization core.

Math matches the reference's GroupQuantize pass
(/root/reference/mlc_llm/transform/quantization.py:104-232):

- asym int: per-group min/max, ``scale = (max-min)/(2^n-1)``,
  ``q = clip(round((w-min)/scale), 0, 2^n-1)``, decode ``q*scale + min``.
- sym int: per-group absmax (floored at 1e-4), ``scale = absmax/max_int``
  with ``max_int = 2^(n-1)-1``, ``q = clip(round(w/scale)+max_int, 0, 2*max_int)``,
  decode ``(q-max_int)*scale``.
- fp4 (sym only): sign + 3-bit exponent, values ``±2^(e-7)`` for e in 1..7
  and 0 for e=0; ``scale = absmax``; round-to-nearest via mantissa MSB
  (quantization.py:51-101).

Storage layout is TPU-native, NOT the reference's u32-transposed packing:
logical weights are kept ``[k, n]`` (reduction-major) so ``y = x @ W``;
4-bit planes use XLA's native ``uint4`` dtype (2 values/byte in HBM),
3-bit uses u32 words of 10 values packed along k. Groups run along k.
"""

from .spec import QuantSpec, QUANT_PRESETS, resolve_spec
from .groupwise import (
    QuantizedTensor,
    quantize,
    dequantize,
    take_dequantize,
)

__all__ = [
    "QuantSpec",
    "QUANT_PRESETS",
    "resolve_spec",
    "QuantizedTensor",
    "quantize",
    "dequantize",
    "take_dequantize",
]
