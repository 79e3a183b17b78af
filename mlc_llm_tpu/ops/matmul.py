"""Quantized matmul: y = x @ W (+ bias), W dense or group-quantized.

Replaces the reference's FuseDecodeMatmulEwise + hand-scheduled TIR
gemv kernels (/root/reference/mlc_llm/transform/decode_matmul_ewise.py,
/root/reference/mlc_llm/dispatch/llama/main.py) with: XLA fusion of the
dequant epilogue in the jnp path, and fused dequant-matmul Pallas
kernels on TPU (ops/pallas/).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..quant.groupwise import QuantizedTensor, dequantize

Array = jax.Array

# Largest flattened-m the fused dequant kernels serve in auto mode; above
# this, XLA full-dequant takes over. The kernels re-read packed weights
# once per 256-row m-tile, so their weight traffic grows ~m/256 x packed
# bytes, while the XLA path pays a fixed dequant materialization (packed
# read + fp write + fp re-read per m-tile) — the kernels' traffic stays
# lower through m=2048 (8 x packed < 1 x packed + 2(m/512) x fp at q4's
# 4x expansion), and round 2 measured the XLA path as a 10x TTFT cliff
# at ctx 512. Bounded (not unlimited) so a pathological m can't starve
# VMEM-guarded block choices; override per-run with
# MLC_PREFILL_KERNEL_MAX_M for on-chip A/B.
_PREFILL_KERNEL_MAX_M = 2048


def prefill_kernel_max_m() -> int:
    import os

    return int(os.environ.get("MLC_PREFILL_KERNEL_MAX_M",
                              _PREFILL_KERNEL_MAX_M))


def _supported_by_pallas(w: QuantizedTensor) -> bool:
    from . import pallas as _p

    return _p.dequant_matmul_supported(w)


def qmatmul(
    x: Array,
    w: Union[Array, QuantizedTensor],
    bias: Optional[Array] = None,
    out_dtype=None,
) -> Array:
    """x: [..., k]; w: [k, n] (dense array or QuantizedTensor); returns [..., n]."""
    from . import kernel_mode

    if isinstance(w, QuantizedTensor):
        mode = kernel_mode()
        m = 1
        for d in x.shape[:-1]:
            m *= d
        # decode/gemv AND prefill-class shapes ride the fused kernels
        # (weights never materialize in fp) up to prefill_kernel_max_m —
        # see the constant's rationale above.
        from . import sharded_params

        use_pallas = mode == "pallas" or (
            mode == "auto"
            and m <= prefill_kernel_max_m()
            and jax.default_backend() not in ("cpu",)
            and not sharded_params()
            and _supported_by_pallas(w)
        )
        if use_pallas:
            from .pallas import dequant_matmul

            y = dequant_matmul(x, w, out_dtype=out_dtype)
        else:
            wd = dequantize(w, dtype=x.dtype)
            y = jnp.matmul(x, wd, preferred_element_type=out_dtype)
            if out_dtype is not None:
                y = y.astype(out_dtype)
    else:
        y = jnp.matmul(x, w.astype(x.dtype) if w.dtype != x.dtype else w)
        if out_dtype is not None:
            y = y.astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def qmatmul_stacked(
    x: Array,
    w,
    layer: Array,
    bias: Optional[Array] = None,
    out_dtype=None,
) -> Array:
    """Layer-stacked qmatmul: w holds leaves with a leading layer axis
    and `layer` is a traced index (the decoder's scan variable).

    Routing mirrors qmatmul, with one extra concern: slicing the layer
    out of a stacked QuantizedTensor materializes a copy of the whole
    layer's packed weights (~100 MB/layer/step at 7B), so on TPU the
    stacked Pallas kernel indexes the resting buffers directly.
    """
    from . import kernel_mode

    if isinstance(w, QuantizedTensor):
        mode = kernel_mode()
        m = 1
        for d in x.shape[:-1]:
            m *= d
        from .pallas.dequant_matmul import (
            dequant_matmul_stacked,
            dequant_matmul_stacked_supported,
        )

        from . import sharded_params

        use_pallas = dequant_matmul_stacked_supported(w.spec) and (
            mode == "pallas"
            or (
                mode == "auto"
                and m <= prefill_kernel_max_m()
                and jax.default_backend() != "cpu"
                and not sharded_params()
            )
        )
        if use_pallas:
            y = dequant_matmul_stacked(x, w, layer, out_dtype=out_dtype)
        else:
            wl = QuantizedTensor(
                data=jax.lax.dynamic_index_in_dim(w.data, layer, 0, False),
                scale=jax.lax.dynamic_index_in_dim(w.scale, layer, 0, False),
                zero=None if w.zero is None else jax.lax.dynamic_index_in_dim(
                    w.zero, layer, 0, False
                ),
                spec=w.spec,
                shape=w.shape,
            )
            return qmatmul(x, wl, bias=bias, out_dtype=out_dtype)
    else:
        wl = jax.lax.dynamic_index_in_dim(w, layer, 0, False)
        return qmatmul(x, wl, bias=bias, out_dtype=out_dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
