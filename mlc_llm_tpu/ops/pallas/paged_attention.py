"""Paged flash-decode attention: head-packed pages, block-diagonal dots.

Decode attention over a paged KV cache is per-invocation-overhead
bound on TPU: the per-(batch, kv-head) grids of both round 2's first
kernel (27x slower than the slot-contiguous einsum) and the substrate's
library kernel (3.6x slower at b8/w256 — ~0.5 us of grid overhead per
invocation x B x Hkv x pages invocations, with every dot a sublane-1
[1, D] row at MHA) drown the actual DMA time. This kernel restructures
the layout so one invocation covers a HEAD BLOCK:

- pages store hb heads interleaved in the lane dim: [G, L, P, ps, hb*D]
  (G = Hkv/hb head groups) — each (group, page) tile is one contiguous
  [ps, hb*D] DMA (hb=8, ps=128, D=128 -> 256 KB), and no in-kernel
  transpose is ever needed;
- the grid is (B, G, pages): hb x fewer invocations, and every score
  dot is ONE dense MXU op — the query rides in BLOCK-DIAGONAL form
  q_bd[r, h*D+d] = q[h, r%rep, d] * (h == r//rep), built in-kernel by a
  broadcast+mask+reshape, so q_bd @ [hb*D, ps] contracts to exactly the
  per-head scores (the same trick as the gp dequant kernel's banded
  activations, ops/pallas/dequant_matmul.py);
- the output dot computes the full [R, hb*D] cross-product and the
  diagonal head blocks are extracted by a masked sum — MXU flops are
  hb x "wasted", but decode attention is bandwidth-bound and the MXU is
  idle (hb=8: ~17 GFLOP/step at 7B b8 vs the chip's ~196 TFLOP/s).

int8 KV (the north star's "paged KV-cache in fp16/int8") keeps
per-(head, position) absmax scales at [ps] granularity: k-scales rest
[G, L, P, hb, ps] (score-row aligned), v-scales [G, L, P, ps, hb]
(value-column aligned, lane-broadcast to [ps, hb*D] in-kernel) — no
broadcast-to-head_dim f32 scale pages (the library kernel's quantized
mode streams 4 bytes/elem of scales, defeating int8).

Page-table indirection rides scalar prefetch; block indices past a
slot's valid length clamp to the last valid page, so Mosaic skips the
re-DMA and short slots in a mixed batch stop paying the window bound.

Masking matches ops/attention.attend: position j valid iff j <= q_pos
(q_pos = the slot's PRE-advance length; the current token's KV is
written before attending).

Replaces, for TPU serving, what the reference's fused attention-score
TIR kernels did on GPU (/root/reference/mlc_llm/dispatch/llama/main.py
fused_NT_matmul1_divide_add_maximum*), re-thought for paging.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    layer_ref, table_ref, lens_ref,
    # operands
    q_ref, kp_ref, vp_ref, ks_ref, vs_ref,
    # outputs
    o_ref,
    # scratch
    acc_ref, m_ref, l_ref,
    *,
    ps: int,
    np_: int,
    hb: int,
    rep: int,
    int8: bool,
    scale: float,
):
    b = pl.program_id(0)
    p = pl.program_id(2)
    R = hb * rep
    D = q_ref.shape[-1]

    @pl.when(p == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]  # [R, D]
    # block-diagonal expansion: row r owns lanes of head h = r // rep
    row_h = jax.lax.broadcasted_iota(jnp.int32, (R, hb, 1), 0) // rep
    col_h = jax.lax.broadcasted_iota(jnp.int32, (R, hb, 1), 1)
    hmask = (row_h == col_h).astype(q.dtype)
    q_bd = (q[:, None, :] * hmask).reshape(R, hb * D)

    k = kp_ref[0, 0, 0]  # [ps, hb*D]
    if int8:
        k = k.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q_bd.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, ps]
    if int8:
        ks = ks_ref[0, 0, 0].astype(jnp.float32)  # [hb, ps]
        if rep > 1:
            ks = jnp.broadcast_to(ks[:, None, :], (hb, rep, ps)).reshape(R, ps)
        s = s * ks
    s = s * scale

    q_pos = lens_ref[b]
    pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (R, ps), 1)
    s = jnp.where(pos <= q_pos, s, NEG_INF)

    m_prev = m_ref[:]  # [R, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    pij = jnp.exp(s - m_new)  # [R, ps] f32
    l_ref[:] = l_ref[:] * alpha + jnp.sum(pij, axis=1, keepdims=True)
    m_ref[:] = m_new

    v = vp_ref[0, 0, 0]  # [ps, hb*D]
    if int8:
        vs = vs_ref[0, 0, 0].astype(jnp.float32)  # [ps, hb]
        vs_e = jnp.broadcast_to(vs[:, :, None], (ps, hb, D)).reshape(ps, hb * D)
        v = v.astype(jnp.float32) * vs_e
    ov = jax.lax.dot_general(
        pij.astype(jnp.bfloat16) if v.dtype == jnp.bfloat16 else pij,
        v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, hb*D] — only the diagonal head blocks are wanted
    od = jnp.sum(ov.reshape(R, hb, D) * hmask.astype(jnp.float32), axis=1)
    acc_ref[:] = acc_ref[:] * alpha + od

    @pl.when(p == np_ - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-20)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_pages_window", "head_dim", "interpret"),
)
def paged_flash_decode(
    q: Array,            # [B, Hq, 1, D] (UNSCALED; kernel applies 1/sqrt D)
    k_pages: Array,      # [G, L, P, ps, hb*D]
    v_pages: Array,      # [G, L, P, ps, hb*D]
    k_scale: Optional[Array],   # [G, L, P, hb, ps] (int8) or None
    v_scale: Optional[Array],   # [G, L, P, ps, hb] (int8) or None
    page_table: Array,   # [B, maxp] int32
    lengths: Array,      # [B] int32 (PRE-advance)
    layer: Array,        # scalar int32
    *,
    num_pages_window: int,
    head_dim: int,
    interpret: bool = False,
) -> Array:
    """Returns [B, Hq, 1, D] attention output for one decode step."""
    B, Hq, S, D = q.shape
    assert S == 1 and D == head_dim
    G, L, P, ps, hbD = k_pages.shape
    hb = hbD // D
    Hkv = G * hb
    rep = Hq // Hkv
    R = hb * rep
    np_ = min(num_pages_window, page_table.shape[1])
    int8 = k_pages.dtype == jnp.int8

    # [B, Hq, D] -> [B, G, R, D] (R rows = hb heads x rep q-heads each)
    q4 = q[:, :, 0, :].reshape(B, G, R, D)
    lt = jnp.asarray(layer, jnp.int32).reshape(1)

    if k_scale is None:
        k_scale = jnp.zeros((1, 1, 1, hb, ps), jnp.float32)
        v_scale = jnp.zeros((1, 1, 1, ps, hb), jnp.float32)

    def _pclamp(b, p, ln):
        # past-length blocks repeat the previous index -> Mosaic skips
        # the re-DMA (short slots don't pay the window bound)
        return jnp.minimum(p, ln[b] // ps)

    def q_idx(b, g, p, lt_, tb, ln):
        return (b, g, 0, 0)

    def kv_idx(b, g, p, lt_, tb, ln):
        return (g, lt_[0], tb[b, _pclamp(b, p, ln)], 0, 0)

    def sc_idx(b, g, p, lt_, tb, ln):
        if int8:
            return (g, lt_[0], tb[b, _pclamp(b, p, ln)], 0, 0)
        return (0, 0, 0, 0, 0)

    kern = functools.partial(
        _kernel, ps=ps, np_=np_, hb=hb, rep=rep, int8=int8,
        scale=1.0 / (D ** 0.5),
    )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, G, np_),
        in_specs=[
            pl.BlockSpec((1, 1, R, D), q_idx),
            pl.BlockSpec((1, 1, 1, ps, hbD), kv_idx),
            pl.BlockSpec((1, 1, 1, ps, hbD), kv_idx),
            pl.BlockSpec((1, 1, 1, hb, ps), sc_idx),
            pl.BlockSpec((1, 1, 1, ps, hb), sc_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, R, D), lambda b, g, p, *_: (b, g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, G, R, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lt, page_table, lengths, q4, k_pages, v_pages, k_scale, v_scale)
    return out.reshape(B, Hq, D)[:, :, None, :]
