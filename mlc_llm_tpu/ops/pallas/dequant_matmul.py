"""Fused group-dequant + matmul Pallas TPU kernel.

Replaces the reference's fused_decodeN_matmulM TIR kernels and their
~80 hand-tuned schedule variants (/root/reference/mlc_llm/dispatch/
llama/main.py, decode_matmul_ewise.py) with ONE parameterized kernel.

Key layout trick (no weight-side relayout): packed words [KW, N] hold
epw values along k, word kw covering k = kw*epw + i. Instead of
unpacking to [BK, BN] (a sublane interleave Mosaic handles slowly), the
activation is pre-reshaped OUTSIDE the kernel to x_t[epw, M, KW] with
x_t[i, m, kw] = x[m, kw*epw + i]. Each nibble plane
  nib_i = (w >> i*nbit) & mask            (pure elementwise on [BKw,BN])
then dots against the contiguous slice x_t[i]:
  acc += x_t[i] @ (value(nib_i) * scale_e)
and the per-group offset (asym min, or sym -max_int*scale) folds into a
single extra dot:  acc += (sum_i x_t[i]) @ offset_e.

Weight bytes are read exactly once per (n, k) tile -> the kernel is
HBM-bandwidth-bound by construction, which is the q4 decode roofline
(BASELINE.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quant.groupwise import QuantizedTensor
from ...quant.spec import QuantSpec

Array = jax.Array

# default-on: the m=1 gp kernels take x as u32 lane-pair words and
# deinterleave even/odd elements in-kernel via a sublane-expanding
# bitcast (band_scratch mode only). Measured on-chip: identical kernel
# time, −0.13 ms/step of XLA reshape glue at 7B b1. MLC_GP_RAW_X=0
# restores the XLA-side deinterleave.
import os as _os
GP_RAW_X = _os.environ.get("MLC_GP_RAW_X", "1") != "0"

# optional autotuned block table (written by mlc_llm_tpu.tune)
_TUNED = None


def _tuned_table():
    global _TUNED
    if _TUNED is None:
        import json
        import os

        # MLC_TUNED_BLOCKS: alternate table (per-model sweeps, tests)
        path = os.environ.get("MLC_TUNED_BLOCKS") or os.path.join(
            os.path.dirname(__file__), "tuned_blocks.json"
        )
        try:
            with open(path) as f:
                raw = json.load(f)
        except Exception:
            raw = {}
        # entries are either the legacy bare [bkw, bn] or the
        # provenance dict {"blocks": [bkw, bn], "gbps": .., "validated":
        # bool, ...} written by mlc_llm_tpu.tune's validation protocol —
        # normalize to the block pair here so the pickers stay simple
        _TUNED = {
            k: (v["blocks"] if isinstance(v, dict) else v)
            for k, v in raw.items()
        }
    return _TUNED


def dequant_matmul_supported(w: QuantizedTensor) -> bool:
    spec = w.spec
    if spec.storage not in ("u32", "u16", "i8"):
        return False
    if w.data.shape[1] % 128 != 0:
        return False
    return True


def _largest_divisor(n: int, candidates) -> Optional[int]:
    for c in candidates:
        if c <= n and n % c == 0:
            return c
    return None


def _pick_blocks(m: int, kw: int, n: int, words_per_group: int, epw: int = 8,
                 layout: str = "pair"):
    """Block sizes in (m, k-words, n) units.

    epw = x-plane elements per stored word (the kernels stream epw
    activation planes of [bm, bkw] alongside each weight block).

    Mosaic requires each block's last dim to be 128-divisible (or the
    full axis) and the second-to-last 8-divisible (or full). bkw is the
    LAST dim of the x_t block, so it must be a 128-multiple divisor of
    kw that also respects group alignment — else we take the whole k
    axis in one step (the grid still tiles m and n).

    Split layouts consult a layout-prefixed key first (qs:/hs:) so the
    quarter-split pairs kernel — 4 narrow MXU dots per grid step vs
    hsplit's 2 — can tune its prefill tiles independently; they fall
    back to the shared {m}:{kw}:{n} entries (same bytes, same grid).
    """
    bm = m if m <= 16 else (_largest_divisor(m, (256, 128, 64, 32, 16, 8)) or m)
    tab = _tuned_table()
    tuned = None
    if layout == "qsplit":
        tuned = tab.get(f"qs:{m}:{kw}:{n}")
    elif layout == "hsplit":
        tuned = tab.get(f"hs:{m}:{kw}:{n}")
    tuned = tuned or tab.get(f"int:{m}:{kw}:{n}") or tab.get(
        f"{m}:{kw}:{n}"
    )
    if tuned:
        if len(tuned) == 3:
            # prefill-class entries may tune bm as well: a bigger m-tile
            # dequantizes each weight block FEWER times (the pairs
            # kernels re-dequantize per m-tile)
            return tuned[0], tuned[1], tuned[2]
        return bm, tuned[0], tuned[1]
    bkw = None
    for c in (2048, 1024, 512, 384, 256, 128):
        if c <= kw and kw % c == 0 and c % words_per_group == 0:
            bkw = c
            break
    if bkw is None:
        bkw = kw  # full k axis in one step

    # (bkw=512, bn=512)-class blocks measured fastest on-chip; wider bn
    # (2048) and a column-tiled 3-D layout were both tried and REGRESSED
    # (Mosaic pipelining/VMEM effects dominate the DMA-stride theory).
    bn = _largest_divisor(n, (512, 384, 256, 128)) or 128

    # VMEM guard: the scoped limit is 16 MB and every streamed block is
    # double-buffered — w u32 block, epw x-planes (the killer at
    # prefill m with q3/u32's epw=10), accumulator + out. Shrink bkw
    # first (keeping group alignment and k divisibility), then bm.
    def _vmem(bm_, bkw_):
        return (
            2 * bkw_ * bn * 4            # w block
            + 2 * epw * bm_ * bkw_ * 2   # x planes (compute dtype)
            + bm_ * bn * 4               # f32 accumulator scratch
            + 2 * bm_ * bn * 2           # out block
        )

    while _vmem(bm, bkw) > 12 * 1024 * 1024:
        h = bkw // 2
        if bkw > 256 and kw % h == 0 and h % words_per_group == 0:
            bkw = h
        elif bm > 16:
            bm //= 2
        else:
            break
    return bm, bkw, bn


def _nib_value(nib_u32: Array, mode: str, dtype) -> Array:
    """Map extracted codes to (unscaled) float values.

    int modes: value = code (offset handled by the folded offset dot).
    fp4: sign|3-bit-exponent -> ±2^(e-7), built by integer bit assembly
    (cheap VPU ops, no transcendentals).
    """
    if mode == "fp4":
        e = nib_u32 & 7
        s = nib_u32 >> 3
        # bf16: sign<<15 | (e+120)<<7 ; f32 path built via bf16 then cast
        bits = (s << 15 | (e + 120) << 7).astype(jnp.uint16)
        val = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
        val = jnp.where(e == 0, jnp.bfloat16(0), val)
        return val.astype(dtype)
    # Mosaic has no u32->float cast; go through i32
    return nib_u32.astype(jnp.int32).astype(dtype)


def _row_repeat(a: Array, r: int) -> Array:
    """Element-wise row repeat [g, n] -> [g*r, n] (row i -> rows i*r..).

    NOTE: pltpu.repeat has tile semantics at these shapes, so build the
    repeat from broadcast+reshape instead.
    """
    g, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, r, n)).reshape(g * r, n)


def _nibble_planes(w32: Array, interpret: bool):
    """u32 [R, N] -> (lo, hi) int8 [4R, N]: row 4r+j holds byte j of
    word r (little-endian sublane expansion), so lo[4r+j] = the code of
    k = 8r + 2j and hi[4r+j] = k = 8r + 2j + 1.

    The nibble isolation runs on u32 lanes (3 ops per word) and the
    expansion is a free bitcast; all per-element work downstream (cast,
    scale-mul) runs at int8/bf16 vector width. This is what lifts the
    kernel from ~200 GB/s (VPU-unpack-bound, 8 shift/mask/cast chains
    per word) to ~480 GB/s.
    """
    lo32 = w32 & jnp.uint32(0x0F0F0F0F)
    hi32 = (w32 >> 4) & jnp.uint32(0x0F0F0F0F)
    if interpret:  # emulate the sublane bitcast layout
        def expand(a):
            parts = [((a >> (8 * j)) & 0xFF).astype(jnp.int8) for j in range(4)]
            r, n = a.shape
            return jnp.stack(parts, axis=1).reshape(4 * r, n)

        return expand(lo32), expand(hi32)
    return (
        pltpu.bitcast(lo32, jnp.int8),
        pltpu.bitcast(hi32, jnp.int8),
    )


def _kernel_pairs(xlo_ref, xhi_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                  spec: QuantSpec, k_steps: int, out_dtype, interpret: bool):
    """int4/u32 fast path: one (m, n, k) grid step.

    xlo/xhi_ref: [BM, 4*BKw] activations at even/odd k (pre-split);
    w_ref: [BKw, BN] packed u32; s_ref/z_ref: [BKg, BN] scales/minima;
    o_ref: [BM, BN]; acc_ref: [BM, BN] f32 scratch.
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = xlo_ref.dtype
    rows_per_group = spec.group_size // 2  # u8 rows per group
    lo8, hi8 = _nibble_planes(w_ref[:], interpret)
    scale_e = _row_repeat(s_ref[:].astype(cdtype), rows_per_group)
    wv_lo = lo8.astype(cdtype) * scale_e
    wv_hi = hi8.astype(cdtype) * scale_e
    if spec.sym:
        off_e = scale_e * (-spec.max_int)
    else:
        off_e = _row_repeat(z_ref[:].astype(cdtype), rows_per_group)

    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[:]
    acc += jax.lax.dot_general(xlo_ref[:], wv_lo, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xhi_ref[:], wv_hi, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        xlo_ref[:] + xhi_ref[:], off_e, dn, preferred_element_type=jnp.float32
    )
    acc_ref[:] = acc

    @pl.when(k_idx == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_pairs_hs(*refs, spec: QuantSpec, k_steps: int, out_dtype,
                     stacked: bool, interpret: bool):
    """int4/u32 HALF-SPLIT path (spec.layout == 'hsplit'), flat or
    stacked: one (m, n, k) grid step.

    With half-split packing the sublane-expanded nibble planes are the
    codes of x's two contiguous halves, so xlo/xhi are FREE lane slices
    of the raw activation (the pair layout needs a stride-2 XLA
    deinterleave costing ~0.4 ms/step at 7B decode). The two halves
    cover DISJOINT group ranges, so scales/offsets arrive as separate
    lo/hi blocks and the weight value is built in AFFINE form
    (w = q*s + z): 2 MXU dots instead of the pair kernel's 3 (the
    shared-offset dot no longer exists), at +1 VPU add per element.
    """
    if stacked:
        (_l, xlo_ref, xhi_ref, w_ref, slo_ref, zlo_ref, shi_ref, zhi_ref,
         o_ref, acc_ref) = refs
        w_in = w_ref[0]
        slo, zlo, shi, zhi = slo_ref[0], zlo_ref[0], shi_ref[0], zhi_ref[0]
    else:
        (xlo_ref, xhi_ref, w_ref, slo_ref, zlo_ref, shi_ref, zhi_ref,
         o_ref, acc_ref) = refs
        w_in = w_ref[:]
        slo, zlo, shi, zhi = slo_ref[:], zlo_ref[:], shi_ref[:], zhi_ref[:]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = xlo_ref.dtype
    rpg = spec.group_size  # plane rows per group: 32 consecutive elements
    lo8, hi8 = _nibble_planes(w_in, interpret)

    def wv(plane8, s, z):
        se = _row_repeat(s.astype(cdtype), rpg)
        if spec.sym:
            off = se * (-spec.max_int)
        else:
            off = _row_repeat(z.astype(cdtype), rpg)
        return plane8.astype(cdtype) * se + off

    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[:]
    acc += jax.lax.dot_general(
        xlo_ref[:], wv(lo8, slo, zlo), dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        xhi_ref[:], wv(hi8, shi, zhi), dn, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k_idx == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel_pairs_qs(*refs, spec: QuantSpec, k_steps: int, out_dtype,
                     stacked: bool, interpret: bool):
    """int4/u32 QUARTER-SPLIT pairs path (spec.layout == 'qsplit'),
    flat or stacked: one (m, n, k) grid step.

    The four activation quarters arrive as FREE lane slices of x (like
    hsplit's halves) and each field plane is bit-assembled to exact
    bf16 values 16+q with NO i8->bf16 cast (see _qs_planes_bf16). The
    weight value is built in affine form with the +16 folded into the
    offset: w = (16+q)*s + (z - 16*s); 4 MXU dots per grid step on
    quarter-width lhs slices (same total MXU work as hsplit's 2)."""
    if stacked:
        (_l, x0_ref, x1_ref, x2_ref, x3_ref, w_ref, *rest) = refs
        srefs, (o_ref, acc_ref) = rest[:8], rest[8:]
        w_in = w_ref[0]
        svals = [r[0] for r in srefs]
    else:
        (x0_ref, x1_ref, x2_ref, x3_ref, w_ref, *rest) = refs
        srefs, (o_ref, acc_ref) = rest[:8], rest[8:]
        w_in = w_ref[:]
        svals = [r[:] for r in srefs]
    xrefs = (x0_ref, x1_ref, x2_ref, x3_ref)
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = x0_ref.dtype
    rpg = spec.group_size  # plane rows per group: 32 consecutive elements
    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[:]
    for f in range(4):
        plane = _qs_planes_bf16(w_in, f, interpret)  # [2*BKw, BN], 16+q
        s, z = svals[2 * f], svals[2 * f + 1]
        se = _row_repeat(s.astype(cdtype), rpg)
        if spec.sym:
            off = se * (-(spec.max_int + 16))
        else:
            off = _row_repeat(z.astype(cdtype), rpg) - se * 16
        wv = plane.astype(cdtype) * se + off
        acc += jax.lax.dot_general(
            xrefs[f][:], wv, dn, preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k_idx == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, spec: QuantSpec,
            wpg: int, k_steps: int, out_dtype):
    """One (m, n, k) grid step.

    x_ref: [epw, BM, BKw]   activation planes
    w_ref: [BKw, BN]        packed words (u32/u16) or int8 plane
    s_ref: [BKg, BN]        group scales
    z_ref: [BKg, BN]        group minima (asym) — aliased to s_ref if sym
    o_ref: [BM, BN]         output
    acc_ref: [BM, BN] f32   accumulator scratch
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = x_ref.dtype
    scale = s_ref[:].astype(cdtype)
    scale_e = _row_repeat(scale, wpg)  # [BKw, BN]

    acc = acc_ref[:]
    if spec.storage == "i8":
        w = w_ref[:].astype(cdtype) * scale_e
        acc += jax.lax.dot_general(
            x_ref[0], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        epw = spec.elems_per_word
        mask = jnp.uint32((1 << spec.nbit) - 1)
        w32 = w_ref[:].astype(jnp.uint32)
        for i in range(epw):
            nib = (w32 >> (i * spec.nbit)) & mask
            wv = _nib_value(nib, spec.mode, cdtype) * scale_e
            acc += jax.lax.dot_general(
                x_ref[i], wv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        # folded offset term
        if spec.mode != "fp4":
            if spec.sym:
                off_e = scale_e * (-spec.max_int)
            else:
                off_e = _row_repeat(z_ref[:].astype(cdtype), wpg)
            xs = jnp.sum(x_ref[:], axis=0)  # [BM, BKw]
            acc += jax.lax.dot_general(
                xs, off_e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc_ref[:] = acc

    @pl.when(k_idx == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


# --------------------------------------------------------------------------
# gp3: group-partial kernel for int3 / u16 storage (the reference's
# --quantization-storage-nbit 16 int3 format, build.py:19-25).
#
# u16 words hold 5 codes in 15 bits, so no field straddles a halfword;
# a free sublane bitcast merges u16 row pairs into u32 words whose two
# halfwords are k-adjacent u16 rows. Each of the 5 field positions then
# bit-assembles EXACT bf16 values (8 + q: bits 0x4100 | q<<4 — ulp at
# 2^3 is 2^-4, so all 8 codes are exact; the +8 folds into the group
# offset together with sym's -max_int). Group scales apply to [Cg, BN]
# partials as in the gp kernel. ~1.6 u32 VPU ops per element, no cast.


def gp3_matmul_supported(spec: QuantSpec, n_groups: int, m: int) -> bool:
    return (
        spec.mode == "int3"
        and spec.storage == "u16"
        and spec.group_size == 40
        and spec.sym
        and m <= 2
        and n_groups % 16 == 0
    )


def _merge_u16(w16: Array, interpret: bool) -> Array:
    """u16 [2R, N] -> u32 [R, N]; low halfword = even row."""
    if interpret:
        r, n = w16.shape
        a = w16.astype(jnp.uint32).reshape(r // 2, 2, n)
        return a[:, 0] | (a[:, 1] << 16)
    return pltpu.bitcast(w16, jnp.uint32)


def _split_bf16(bits32: Array, interpret: bool) -> Array:
    """u32 [R, N] -> bf16 [2R, N]; row 2r = low halfword of word r."""
    if interpret:
        r, n = bits32.shape
        lo = (bits32 & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        hi = (bits32 >> 16).astype(jnp.uint16)
        st = jnp.stack([lo, hi], axis=1).reshape(2 * r, n)
        return jax.lax.bitcast_convert_type(st, jnp.bfloat16)
    return pltpu.bitcast(bits32, jnp.bfloat16)


def _prep_gp3_planes(x: Array, ngroups: int):
    """x [M, K] -> xp [5, M, K/5] per-field plane activations.

    After the u16->u32 merge, u32 row R covers k = 10R..10R+9 with
    halfword j = u16 row 2R+j; field i of halfword j is k = 10R+5j+i.
    bf16 plane i row p = 2R+j <-> k = 10R+5j+i; group g owns plane rows
    [8g, 8g+8)."""
    M = x.shape[0]
    K = ngroups * 40
    if x.shape[1] != K:
        x = jnp.pad(x, ((0, 0), (0, K - x.shape[1])))
    # [M, R, j, i] with k = 10R + 5j + i
    x4 = x.reshape(M, K // 10, 2, 5)
    return x4.transpose(3, 0, 1, 2).reshape(5, M, K // 5)


def _band_store_gp3(xp_ref, xd_ref, *, Cg: int, cpt: int, M: int):
    """Band the [5, M, K/5] plane activations into the block-diagonal
    scratch [5, cpt*Cg*M, 8*Cg] ONCE (first grid step); the body then
    reuses the banded planes for every n-tile. gp3 previously re-banded
    per chunk per plane per n-tile — the pattern measured 27% slower on
    the gp kernel when recomputed per tile."""
    band = _band_mask(Cg, 8, xd_ref.dtype)
    cols = 8 * Cg
    rpc = Cg * M
    for i in range(5):
        for c in range(cpt):
            xs = xp_ref[i, :, c * cols:(c + 1) * cols]  # [M, 8Cg]
            xd_ref[i, c * rpc:(c + 1) * rpc, :] = (
                band[:, None, :] * xs[None, :, :]
            ).reshape(rpc, cols)


def _gp3_body(xd, w16, s2d, acc, *, max_int: int, Cg: int, cpt: int,
              M: int, interpret: bool):
    """xd: [5, cpt*Cg*M, 8Cg] PRE-BANDED plane activations (VMEM
    scratch, written once at the first grid step);
    w16: [BKW16, BN] u16; s2d: [Gt, BN]; acc [Cg*M, BN] f32."""
    dn = (((1,), (0,)), ((), ()))
    rpc = Cg * M
    w32 = _merge_u16(w16, interpret)  # [BKW16/2, BN]
    wrpc = 4 * Cg  # u32 rows per chunk
    for c in range(cpt):
        wc = w32[c * wrpc:(c + 1) * wrpc, :]
        sc = s2d[c * Cg:(c + 1) * Cg, :].astype(jnp.float32)
        if M > 1:
            sc = _row_repeat(sc, M)
        psum = jnp.zeros((rpc, wc.shape[1]), jnp.float32)
        sx = jnp.zeros((rpc, 1), jnp.float32)
        for i in range(5):
            if i == 0:
                t = (wc << 4) & jnp.uint32(0x00700070)
            elif i == 1:
                t = (wc << 1) & jnp.uint32(0x00700070)
            else:
                t = (wc >> (3 * i - 4)) & jnp.uint32(0x00700070)
            plane = _split_bf16(t | jnp.uint32(0x41004100), interpret)
            xi = xd[i, c * rpc:(c + 1) * rpc, :]
            psum += jax.lax.dot_general(
                xi, plane, dn, preferred_element_type=jnp.float32
            )
            sx += jnp.sum(xi, axis=1, keepdims=True).astype(jnp.float32)
        # assembled value = 8 + q; sym int3 value = q - max_int
        acc = acc + sc * (psum - float(8 + max_int) * sx)
    return acc


def _kernel_gp3(xp_ref, w_ref, s_ref, o_ref, acc_ref, xd_ref, *,
                max_int: int, Cg: int, cpt: int, M: int, k_steps: int,
                out_dtype, interpret: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((pl.program_id(1) == 0) & (kk == 0))
    def _():
        _band_store_gp3(xp_ref, xd_ref, Cg=Cg, cpt=cpt, M=M)

    acc_ref[:] = _gp3_body(
        xd_ref[:], w_ref[:], s_ref[:], acc_ref[:],
        max_int=max_int, Cg=Cg, cpt=cpt, M=M, interpret=interpret,
    )

    @pl.when(kk == k_steps - 1)
    def _():
        a = acc_ref[:]
        o_ref[:] = jnp.sum(a.reshape(Cg, M, a.shape[-1]), axis=0).astype(out_dtype)


def _kernel_gp3_stacked(l_ref, xp_ref, w_ref, s_ref, o_ref, acc_ref, xd_ref,
                        *, max_int: int, Cg: int, cpt: int, M: int,
                        k_steps: int, out_dtype, interpret: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when((pl.program_id(1) == 0) & (kk == 0))
    def _():
        _band_store_gp3(xp_ref, xd_ref, Cg=Cg, cpt=cpt, M=M)

    acc_ref[:] = _gp3_body(
        xd_ref[:], w_ref[0], s_ref[0], acc_ref[:],
        max_int=max_int, Cg=Cg, cpt=cpt, M=M, interpret=interpret,
    )

    @pl.when(kk == k_steps - 1)
    def _():
        a = acc_ref[:]
        o_ref[:] = jnp.sum(a.reshape(Cg, M, a.shape[-1]), axis=0).astype(out_dtype)


def _gp3_bn(m: int, kw16: int, n: int) -> int:
    """n-tile width for the gp3 kernel: tuned table else 512."""
    tuned = _tuned_table().get(f"gp3:{m}:{kw16}:{n}")
    if tuned:
        return tuned[1]
    # on-chip sweep (scripts/gp_sweep2.py --quant q3bf16_s16): wider
    # n-tiles win at every 7B shape (bn=1024/2048 vs 512: 530->698 GB/s
    # on 4096x22528); prefer the widest divisor
    return _largest_divisor(n, (1024, 512, 384, 256, 128)) or 128


@functools.partial(
    jax.jit, static_argnames=("spec", "shape", "out_dtype", "interpret", "stacked")
)
def _dequant_matmul_gp3_2d(
    x: Array,
    layer: Optional[Array],
    data: Array,
    scale: Array,
    *,
    spec: QuantSpec,
    shape,
    out_dtype,
    interpret: bool,
    stacked: bool,
) -> Array:
    k, n = shape
    m = x.shape[0]
    kw16, n_stored = data.shape[-2], data.shape[-1]
    G = scale.shape[-2]
    Cg = 16
    cptotal = G // Cg

    bn = _gp3_bn(m, kw16, n_stored)
    xp = _prep_gp3_planes(x, G)

    kernel_fn = _kernel_gp3_stacked if stacked else _kernel_gp3
    kernel = functools.partial(
        kernel_fn, max_int=spec.max_int, Cg=Cg, cpt=cptotal, M=m,
        k_steps=1, out_dtype=out_dtype, interpret=interpret,
    )
    if stacked:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1, n_stored // bn, 1),
            in_specs=[
                pl.BlockSpec((5, m, G * 8), lambda i, j, kk, l: (0, 0, 0)),
                pl.BlockSpec((1, kw16, bn), lambda i, j, kk, l: (l[0], 0, j)),
                pl.BlockSpec((1, G, bn), lambda i, j, kk, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i, j, kk, l: (0, j)),
            scratch_shapes=[
                pltpu.VMEM((Cg * m, bn), jnp.float32),
                pltpu.VMEM((5, cptotal * Cg * m, 8 * Cg), x.dtype),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((m, n_stored), out_dtype),
            compiler_params=pltpu.CompilerParams(
                # banded scratch written at the first n-tile, reused by
                # the rest: the n dimension must run sequentially
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(layer, xp, data, scale)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(1, n_stored // bn, 1),
            in_specs=[
                pl.BlockSpec((5, m, G * 8), lambda i, j, kk: (0, 0, 0)),
                pl.BlockSpec((kw16, bn), lambda i, j, kk: (0, j)),
                pl.BlockSpec((G, bn), lambda i, j, kk: (0, j)),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda i, j, kk: (0, j)),
            out_shape=jax.ShapeDtypeStruct((m, n_stored), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((Cg * m, bn), jnp.float32),
                pltpu.VMEM((5, cptotal * Cg * m, 8 * Cg), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(xp, data, scale)
    return out[:, :n]


def _kernel_stacked_generic(l_ref, x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
                            *, spec: QuantSpec, wpg: int, k_steps: int,
                            out_dtype):
    """Stacked variant of the generic plane kernel (int3 / u16 / fp4 /
    i8): layer l_ref[0]'s blocks are DMA'd straight from the [L, KW, N]
    resting buffers via scalar-prefetch index maps, extending the
    no-per-layer-copy trick beyond int4/u32 (round-1 VERDICT gap: q3f16
    decode was paying a dynamic_index weight copy per layer per step).
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = x_ref.dtype
    scale = s_ref[0].astype(cdtype)
    scale_e = _row_repeat(scale, wpg)

    acc = acc_ref[:]
    if spec.storage == "i8":
        w = w_ref[0].astype(cdtype) * scale_e
        acc += jax.lax.dot_general(
            x_ref[0], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        epw = spec.elems_per_word
        mask = jnp.uint32((1 << spec.nbit) - 1)
        w32 = w_ref[0].astype(jnp.uint32)
        for i in range(epw):
            nib = (w32 >> (i * spec.nbit)) & mask
            wv = _nib_value(nib, spec.mode, cdtype) * scale_e
            acc += jax.lax.dot_general(
                x_ref[i], wv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if spec.mode != "fp4":
            if spec.sym:
                off_e = scale_e * (-spec.max_int)
            else:
                off_e = _row_repeat(z_ref[0].astype(cdtype), wpg)
            xs = jnp.sum(x_ref[:], axis=0)
            acc += jax.lax.dot_general(
                xs, off_e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc_ref[:] = acc

    @pl.when(k_idx == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("spec", "shape", "out_dtype", "interpret")
)
def _dequant_matmul_stacked_generic_2d(
    x: Array,
    layer: Array,         # [1] int32
    data: Array,          # [L, KW, N]
    scale: Array,         # [L, G, N]
    zero: Optional[Array],
    *,
    spec: QuantSpec,
    shape,
    out_dtype,
    interpret: bool,
) -> Array:
    k, n = shape
    m = x.shape[0]
    _, kw, n_stored = data.shape

    if spec.storage == "i8":
        epw, wpg = 1, spec.group_size
    else:
        epw = spec.elems_per_word
        wpg = -(-spec.group_size // epw)
    k_stored = kw * epw
    if x.shape[1] != k_stored:
        x = jnp.pad(x, ((0, 0), (0, k_stored - x.shape[1])))

    bm, bkw, bn = _pick_blocks(m, kw, n_stored, wpg, epw=epw)
    x_t = x.reshape(m, kw, epw).transpose(2, 0, 1)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x_t = jnp.pad(x_t, ((0, 0), (0, m_pad - m), (0, 0)))
    k_steps = kw // bkw
    bkg = bkw // wpg
    if zero is None:
        zero = scale

    kernel = functools.partial(
        _kernel_stacked_generic, spec=spec, wpg=wpg, k_steps=k_steps,
        out_dtype=out_dtype,
    )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, n_stored // bn, k_steps),
        in_specs=[
            pl.BlockSpec((epw, bm, bkw), lambda i, j, kk, l: (0, i, kk)),
            pl.BlockSpec((1, bkw, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg, bn), lambda i, j, kk, l: (l[0], kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_stored), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(layer, x_t, data, scale, zero)
    return out[:m, :n]


@functools.partial(
    jax.jit, static_argnames=("spec", "shape", "out_dtype", "interpret")
)
def _dequant_matmul_2d(
    x: Array,
    data: Array,
    scale: Array,
    zero: Optional[Array],
    *,
    spec: QuantSpec,
    shape,
    out_dtype,
    interpret: bool,
) -> Array:
    """x: [M, k] -> [M, n] (n = logical columns; internals padded)."""
    k, n = shape
    m = x.shape[0]
    n_stored = data.shape[1]
    g = spec.group_size

    if spec.storage == "i8":
        epw = 1
        kw = data.shape[0]
        wpg = g
    else:
        epw = spec.elems_per_word
        kw = data.shape[0]
        wpg = -(-g // epw)  # words per group

    k_stored = kw * epw
    # pad x's k to the stored k (zeros contribute nothing)
    if x.shape[1] != k_stored:
        x = jnp.pad(x, ((0, 0), (0, k_stored - x.shape[1])))

    bm, bkw, bn = _pick_blocks(m, kw, n_stored, wpg, epw=epw,
                               layout=spec.layout)

    if spec.mode == "int4" and spec.storage == "u32":
        # fast path: i8 nibble pairs (see _nibble_planes)
        hsplit = spec.layout == "hsplit"
        qsplit = spec.layout == "qsplit"
        if qsplit:
            # the field planes are x's contiguous quarters: free slices
            kq = k_stored // 4
            xparts = [x[:, f * kq:(f + 1) * kq] for f in range(4)]
        elif hsplit:
            # the nibble planes are x's contiguous halves: free slices
            kh = k_stored // 2
            xparts = [x[:, :kh], x[:, kh:]]
        else:
            xr = x.reshape(m, kw, 4, 2)
            xparts = [xr[..., 0].reshape(m, kw * 4),
                      xr[..., 1].reshape(m, kw * 4)]
        m_pad = -(-m // bm) * bm
        if m_pad != m:
            xparts = [jnp.pad(xp_, ((0, m_pad - m), (0, 0)))
                      for xp_ in xparts]
        k_steps = kw // bkw
        bkg = bkw // wpg
        if zero is None:
            zero = scale
        if qsplit:
            gq = bkg // 4  # groups per field quarter per k-tile
            assert bkg % 4 == 0 and (gq % 8 == 0 or k_steps == 1), (
                f"qsplit k-tile must cover a 4-divisible group count "
                f"with 8-sublane quarter blocks, got bkg={bkg} "
                f"(bkw={bkw}): tune qsplit bkw to 128-word units")
            kernel = functools.partial(
                _kernel_pairs_qs, spec=spec, k_steps=k_steps,
                out_dtype=out_dtype, stacked=False, interpret=interpret,
            )
            in_specs = [
                pl.BlockSpec((bm, 2 * bkw), lambda i, j, kk: (i, kk))
                for _ in range(4)
            ] + [pl.BlockSpec((bkw, bn), lambda i, j, kk: (kk, j))]
            for f in range(4):
                in_specs += [
                    pl.BlockSpec((gq, bn),
                                 lambda i, j, kk, _f=f:
                                 (_f * k_steps + kk, j)),
                ] * 2
            operands = tuple(xparts) + (data,) + (scale, zero) * 4
        elif hsplit:
            assert bkg % 2 == 0, (
                f"hsplit k-tile must cover an even group count, got "
                f"bkg={bkg} (bkw={bkw}): tune hsplit bkw to 8-word units")
            kernel = functools.partial(
                _kernel_pairs_hs, spec=spec, k_steps=k_steps,
                out_dtype=out_dtype, stacked=False, interpret=interpret,
            )
            # each half covers bkg//2 DISJOINT groups per k-tile; the
            # hi half's blocks start at row G//2 = block index k_steps
            in_specs = [
                pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bkw, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bkg // 2, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bkg // 2, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bkg // 2, bn),
                             lambda i, j, kk: (k_steps + kk, j)),
                pl.BlockSpec((bkg // 2, bn),
                             lambda i, j, kk: (k_steps + kk, j)),
            ]
            operands = (xparts[0], xparts[1], data, scale, zero, scale, zero)
        else:
            kernel = functools.partial(
                _kernel_pairs, spec=spec, k_steps=k_steps,
                out_dtype=out_dtype, interpret=interpret,
            )
            in_specs = [
                pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((bkw, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bkg, bn), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((bkg, bn), lambda i, j, kk: (kk, j)),
            ]
            operands = (xparts[0], xparts[1], data, scale, zero)
        out = pl.pallas_call(
            kernel,
            grid=(m_pad // bm, n_stored // bn, k_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m_pad, n_stored), out_dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * k_stored * n_stored,
                bytes_accessed=data.size * 4 + m_pad * k_stored * x.dtype.itemsize
                + m_pad * n_stored * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*operands)
        return out[:m, :n]

    # generic path (int3, u16, fp4, i8)
    # plane-transpose: x_t[i, m, kw] = x[m, kw*epw + i]
    x_t = x.reshape(m, kw, epw).transpose(2, 0, 1)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x_t = jnp.pad(x_t, ((0, 0), (0, m_pad - m), (0, 0)))
    k_steps = kw // bkw
    bkg = bkw // wpg
    grid = (m_pad // bm, n_stored // bn, k_steps)

    if zero is None:
        zero = scale  # placeholder, unused in sym/fp4/i8 paths

    kernel = functools.partial(
        _kernel, spec=spec, wpg=wpg, k_steps=k_steps, out_dtype=out_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((epw, bm, bkw), lambda i, j, kk: (0, i, kk)),
            pl.BlockSpec((bkw, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bkg, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bkg, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_stored), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k_stored * n_stored,
            bytes_accessed=data.size * data.dtype.itemsize
            + m_pad * k_stored * x.dtype.itemsize
            + m_pad * n_stored * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_t, data, scale, zero)
    return out[:m, :n]


# --------------------------------------------------------------------------
# Group-partial ("gp") kernel — round-2 bandwidth rework.
#
# The pairs kernel above is VPU-bound: every weight element pays an
# i8->bf16 cast AND a bf16 scale-multiply (~2.4 VPU ops/elem -> ~420
# GB/s measured on the 45 MB w_in shape). The gp kernel removes the
# per-element scale-multiply by restructuring the math around GROUP
# PARTIALS:
#
#   P[g, n] = sum_{k in group g} x[k] * q[k, n]        (UNSCALED codes)
#   y[n]    = sum_g s[g, n] * P[g, n] + offset[g, n] * sx[g]
#
# P is computed on the MXU by dotting BLOCK-DIAGONAL activation chunks
# (Cg groups per chunk; lhs [Cg*M, 16*Cg], one bf16 cast per element,
# no multiply) against the raw i8 nibble planes; the scale/offset work
# then touches only [groups, n] partials — 1/32nd of the elements. The
# dense-banded MXU overhead is 4*M*Cg flops per weight byte, kept ~128
# by shrinking Cg as M grows. Measured 46 us vs the pairs kernel's 137
# us on the same 45 MB shape (scripts/kexp.py, same-process A/B).
# Exact weight-only math (same bf16 product precision as pairs).


def _gp_pick_cg(n_groups_tile: int, m: int) -> Optional[int]:
    """Chunk width (groups per diagonal block). Bounded so the banded
    MXU work (4*M*Cg flops/byte) stays far from the bf16 peak; must
    divide the k-tile's group count; lane floor 16*Cg >= 128."""
    budget = {1: 32, 2: 16, 4: 8, 8: 8}.get(m)
    if budget is None:
        for mm in (8, 4, 2, 1):
            if m >= mm:
                budget = {1: 32, 2: 16, 4: 8, 8: 8}[mm]
                break
    for c in (budget, 16, 8):
        if c <= budget and n_groups_tile % c == 0:
            return c
    return None


def gp_matmul_supported(spec: QuantSpec, n_groups: int, m: int) -> bool:
    if not split_groups_blockable(spec, n_groups):
        # split layouts partition the group range per nibble/field
        # plane, and the per-plane scale blocks ([G/2, bn] hsplit,
        # [G/4, bn] qsplit) must satisfy Mosaic's 8-sublane block rule.
        # Engines group-pad to multiples of 32 so this never triggers
        # on their path; raw callers fall back to the jnp dequantize
        # matmul (dispatch below).
        return False
    if spec.layout == "qsplit" and _gp_pick_cg_qs(n_groups, m) is None:
        return False
    return (
        spec.mode == "int4"
        and spec.storage == "u32"
        and spec.group_size == 32
        and m <= 8
        and _gp_pick_cg(n_groups, m) is not None
    )


def hs_groups_blockable(n_groups: int) -> bool:
    """hsplit kernels fetch per-plane scale HALF-blocks [G/2, bn]; the
    Mosaic block rule needs the sublane dim divisible by 8 (or full)."""
    return n_groups % 2 == 0 and (n_groups // 2) % 8 == 0


def qs_groups_blockable(n_groups: int) -> bool:
    """qsplit kernels fetch per-field scale QUARTER-blocks [G/4, bn]."""
    return n_groups % 4 == 0 and (n_groups // 4) % 8 == 0


def split_groups_blockable(spec: QuantSpec, n_groups: int) -> bool:
    """Can the fused kernels block this split layout's scale fetches?
    (pair always can; engines group-pad to 32 so this never fails on
    their path — raw callers fall back to the jnp dequantize matmul)."""
    if spec.layout == "hsplit":
        return hs_groups_blockable(n_groups)
    if spec.layout == "qsplit":
        return qs_groups_blockable(n_groups)
    return True


def _gp_pick_cg_qs(n_groups_tile: int, m: int) -> Optional[int]:
    """qsplit chunk width (groups per diagonal block, all four fields
    combined). The banded quarter-plane lane dim is 8*Cg (width-32
    bands on Cg/4 rows per field), so Cg >= 16 keeps the scratch at
    the 128-lane tile; budgets otherwise follow _gp_pick_cg."""
    budget = 32 if m <= 1 else 16
    for c in (budget, 16):
        if c <= budget and n_groups_tile % c == 0:
            return c
    return None


def _band_mask(Cg: int, width: int, dtype):
    """[Cg, Cg*width] 0/1 mask: row u keeps cols [u*width, (u+1)*width)."""
    cols = Cg * width
    iu = jax.lax.broadcasted_iota(jnp.int32, (Cg, cols), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (Cg, cols), 1)
    return (ic // width == iu).astype(dtype)


def _gp_body(xp, w2d, s2d, z2d, acc, *, spec: QuantSpec, Cg: int,
             cpt: int, M: int, prebanded: bool, interpret: bool):
    """Shared chunk loop for the flat and stacked gp kernels.

    xp stacks the even-k (plane 0) and odd-k (plane 1) activations:
    prebanded (m=1) as [2, cpt*Cg, 16Cg] block-diagonal chunks built in
    XLA; otherwise as [2, M, 4*BKW] plane activations banded in-kernel
    per chunk.
    w2d: [BKW, BN] u32; s2d/z2d: [Gt, BN]; acc: [Cg*M, BN] f32."""
    dn = (((1,), (0,)), ((), ()))
    wpc = 4 * Cg
    cols = 16 * Cg
    rpc = Cg * M
    band = None if prebanded else _band_mask(Cg, 16, xp.dtype)
    for c in range(cpt):
        wc = w2d[c * wpc:(c + 1) * wpc, :]
        lo8, hi8 = _nibble_planes(wc, interpret)
        sc = s2d[c * Cg:(c + 1) * Cg, :].astype(jnp.float32)
        if M > 1:
            sc = _row_repeat(sc, M)
        if prebanded:
            xl = xp[0, c * rpc:(c + 1) * rpc, :]
            xh = xp[1, c * rpc:(c + 1) * rpc, :]
        else:
            xsl = xp[0, :, c * cols:(c + 1) * cols]  # [M, 16Cg]
            xsh = xp[1, :, c * cols:(c + 1) * cols]
            xl = (band[:, None, :] * xsl[None, :, :]).reshape(rpc, cols)
            xh = (band[:, None, :] * xsh[None, :, :]).reshape(rpc, cols)
        plo = jax.lax.dot_general(
            xl, lo8.astype(xl.dtype), dn, preferred_element_type=jnp.float32
        )
        phi = jax.lax.dot_general(
            xh, hi8.astype(xh.dtype), dn, preferred_element_type=jnp.float32
        )
        psum = plo + phi
        sx = (
            jnp.sum(xl, axis=1, keepdims=True)
            + jnp.sum(xh, axis=1, keepdims=True)
        ).astype(jnp.float32)
        if spec.sym:
            acc = acc + sc * (psum - float(spec.max_int) * sx)
        else:
            zc = z2d[c * Cg:(c + 1) * Cg, :].astype(jnp.float32)
            if M > 1:
                zc = _row_repeat(zc, M)
            acc = acc + sc * psum + zc * sx
    return acc


def _gp_body_hs(xb, w2d, halves, acc, *, spec: QuantSpec, Cg: int,
                cpt: int, M: int, interpret: bool):
    """Half-split gp chunk loop, WIDTH-32 bands.

    xb: [2, cpt*Cg2*M, 32*Cg2] banded halves for THIS k-tile (Cg2 =
    Cg//2; plane 0 = bands of x[:, :K/2], plane 1 = x[:, K/2:]);
    w2d: [BKW, BN]; halves: ((slo, zlo), (shi, zhi)) — each plane's
    scale/offset block for this tile ([Gt//2, BN]; the two planes read
    disjoint group ranges, fetched as separate blocks so k-tiling
    works: lo at row kk*Gt/2, hi at G/2 + kk*Gt/2).

    Each band row holds 32 CONSECUTIVE original elements = exactly ONE
    quant group, so scales slice directly per chunk ([Cg2, BN], no row
    expansion). The round-3 width-16 form put HALF a group per row and
    had to 2*M-interleave-repeat every scale row per chunk per plane —
    a Mosaic sublane relayout in the hot loop that measured the hsplit
    decode 21% slower than the pair layout (tpu_logs/hs_ab2.log); the
    width-32 form measured 150.4 vs the pair layout's 138.8 tok/s at
    7B b1 (tpu_logs/hs_ab_r4.log). Same dot count as the pair gp body
    (2 per chunk) on a HALF-height banded lhs."""
    dn = (((1,), (0,)), ((), ()))
    Cg2 = Cg // 2
    wpc = 4 * Cg
    rpc = Cg2 * M
    for c in range(cpt):
        wc = w2d[c * wpc:(c + 1) * wpc, :]
        lo8, hi8 = _nibble_planes(wc, interpret)
        for p, plane8 in ((0, lo8), (1, hi8)):
            s2d, z2d = halves[p]
            g0 = c * Cg2
            sc = s2d[g0:g0 + Cg2, :].astype(jnp.float32)
            if M > 1:
                sc = _row_repeat(sc, M)
            xpb = xb[p, c * rpc:(c + 1) * rpc, :]
            P = jax.lax.dot_general(
                xpb, plane8.astype(xpb.dtype), dn,
                preferred_element_type=jnp.float32)
            sx = jnp.sum(xpb, axis=1, keepdims=True).astype(jnp.float32)
            if spec.sym:
                acc = acc + sc * (P - float(spec.max_int) * sx)
            else:
                zc = z2d[g0:g0 + Cg2, :].astype(jnp.float32)
                if M > 1:
                    zc = _row_repeat(zc, M)
                acc = acc + sc * P + zc * sx
    return acc


def _band_store_hs(x_ref, xd_ref, *, Cg: int, cpt: int, M: int,
                   k_steps: int = 1):
    """Band the raw activation's two contiguous halves into the
    block-diagonal scratch [k_steps, 2, cpt*Cg2*M, 32*Cg2] (Cg2 =
    Cg//2; one full quant group per band row; section kk holds the
    chunks k-tile kk consumes). x_ref: [M, K] in the compute
    dtype — every slice below is a stride-1 lane slice, so no
    XLA-side deinterleave exists at all (the whole point of hsplit)."""
    Cg2 = Cg // 2
    band = _band_mask(Cg2, 32, xd_ref.dtype)
    cols = 32 * Cg2  # == 16 * Cg
    rpc = Cg2 * M
    KH = k_steps * cpt * cols  # == K // 2
    for sec in range(k_steps):
        for c in range(cpt):
            g = sec * cpt + c
            for p in range(2):
                xs = x_ref[:, p * KH + g * cols:p * KH + (g + 1) * cols]
                xd_ref[sec, p, c * rpc:(c + 1) * rpc, :] = (
                    band[:, None, :] * xs[None, :, :]
                ).reshape(rpc, cols)


def _band_store_qs(x_ref, xd_ref, *, Cg: int, cpt: int, M: int,
                   k_steps: int = 1):
    """Band the raw activation's four contiguous quarters into the
    block-diagonal scratch [k_steps, 4, cpt*Cg4*M, 32*Cg4] (Cg4 =
    Cg//4; one full quant group per band row; section kk holds the
    chunks k-tile kk consumes). Every slice is a stride-1 lane slice
    of x — like hsplit, no XLA-side deinterleave exists at all."""
    Cg4 = Cg // 4
    band = _band_mask(Cg4, 32, xd_ref.dtype)
    cols = 32 * Cg4  # == 8 * Cg
    rpc = Cg4 * M
    KQ = k_steps * cpt * cols  # == K // 4
    for sec in range(k_steps):
        for c in range(cpt):
            g = sec * cpt + c
            for f in range(4):
                xs = x_ref[:, f * KQ + g * cols:f * KQ + (g + 1) * cols]
                xd_ref[sec, f, c * rpc:(c + 1) * rpc, :] = (
                    band[:, None, :] * xs[None, :, :]
                ).reshape(rpc, cols)


def _qs_planes_bf16(wc: Array, f: int, interpret: bool) -> Array:
    """qsplit u32 words [W, N] -> field-f bf16 plane [2W, N] holding
    EXACT values 16+q (q = the 4-bit code): bit-assembled as
    0x4180 | q<<3 per halfword (bf16 16.0 = 0x4180; ulp at 2^4 is
    2^-3, so all 16 codes land exactly — the gp3 trick at 4 bits).
    Row 2w+h of the plane is element f*(K/4) + 2*(word w) + h, i.e.
    CONTIGUOUS elements of x's f-th quarter. No i8->bf16 cast — the
    cast was the measured per-element floor of the hsplit kernels
    (tpu_logs/qsplit_ab_r5.log)."""
    t = (wc << 3) if f == 0 else (wc >> (4 * f - 3))
    bits = (t & jnp.uint32(0x00780078)) | jnp.uint32(0x41804180)
    return _split_bf16(bits, interpret)


def _gp_body_qs(xb, w2d, fields, acc, *, spec: QuantSpec, Cg: int,
                cpt: int, M: int, interpret: bool):
    """Quarter-split gp chunk loop, WIDTH-32 bands, CAST-FREE planes.

    xb: [4, cpt*Cg4*M, 32*Cg4] banded quarters for THIS k-tile (Cg4 =
    Cg//4; plane f = bands of x[:, f*K/4:(f+1)*K/4]);
    w2d: [BKW, BN]; fields: 4x (scale, zero) blocks for this tile
    ([Gt//4, BN] each — the four field planes read disjoint group
    quarters, fetched as separate blocks so k-tiling works).

    The assembled plane value is 16+q, so the +16 folds into the
    offset term exactly like gp3's +8: sym P - (16+max_int)*sx;
    asym s*(P - 16*sx) + z*sx. Same f32 partial math as hsplit."""
    dn = (((1,), (0,)), ((), ()))
    Cg4 = Cg // 4
    wpc = 4 * Cg  # u32 words per chunk (16 * Cg4)
    rpc = Cg4 * M
    for c in range(cpt):
        wc = w2d[c * wpc:(c + 1) * wpc, :]
        for f in range(4):
            plane = _qs_planes_bf16(wc, f, interpret)  # [32*Cg4, BN]
            s2d, z2d = fields[f]
            g0 = c * Cg4
            sc = s2d[g0:g0 + Cg4, :].astype(jnp.float32)
            if M > 1:
                sc = _row_repeat(sc, M)
            xpb = xb[f, c * rpc:(c + 1) * rpc, :]
            P = jax.lax.dot_general(
                xpb, plane.astype(xpb.dtype), dn,
                preferred_element_type=jnp.float32)
            sx = jnp.sum(xpb, axis=1, keepdims=True).astype(jnp.float32)
            if spec.sym:
                acc = acc + sc * (P - float(16 + spec.max_int) * sx)
            else:
                zc = z2d[g0:g0 + Cg4, :].astype(jnp.float32)
                if M > 1:
                    zc = _row_repeat(zc, M)
                acc = acc + sc * (P - 16.0 * sx) + zc * sx
    return acc


def _u32_halves_bf16(xu: Array, interpret: bool) -> Array:
    """u32 [M, C] -> bf16 [2M, C]: row 2m = bits 0-15 of row m (the
    EVEN original element), row 2m+1 = bits 16-31 (the ODD element) —
    little-endian sublane expansion, same convention as
    _nibble_planes."""
    if interpret:
        lo = jax.lax.bitcast_convert_type(
            (xu & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16)
        hi = jax.lax.bitcast_convert_type(
            (xu >> 16).astype(jnp.uint16), jnp.bfloat16)
        m, c = xu.shape
        return jnp.stack([lo, hi], axis=1).reshape(2 * m, c)
    return pltpu.bitcast(xu, jnp.bfloat16)


def _band_store(xp_ref, xd_ref, *, Cg: int, cpt: int, M: int,
                raw: bool = False, interpret: bool = False,
                k_steps: int = 1):
    """Band the FULL-k plane activations into the block-diagonal
    scratch layout [k_steps, 2, cpt*Cg*M, 16*Cg] (rows Cg-major per
    chunk; section kk holds the chunks k-tile kk consumes).

    raw=False: xp_ref is the XLA-deinterleaved [2, M, 4*KW] planes.
    raw=True (M==1 only): xp_ref is the activation viewed as u32 lane
    pairs [1, K/2] (a FREE XLA bitcast — adjacent bf16 lanes share one
    word). The even/odd element split (plane p = x[2j+p], forced by the
    weight u32->i8 byte layout) falls out of the sublane-expanding
    bitcast here — deleting the 4-per-layer XLA reshape/transpose
    chains (~0.4 ms/step at 7B). Mosaic cannot do stride-2 lane slices
    ('extract_strided_slice strides confined to [1,2)'), so the bitcast
    IS the deinterleave."""
    band = _band_mask(Cg, 16, xd_ref.dtype)
    cols = 16 * Cg
    rpc = Cg * M
    for sec in range(k_steps):
        for c in range(cpt):
            g = sec * cpt + c  # global chunk along full k
            if raw:
                xc = xp_ref[:, g * cols:(g + 1) * cols]  # [1, 16Cg] u32
                halves = _u32_halves_bf16(xc, interpret)  # [2, 16Cg]
            for p in range(2):
                if raw:
                    xs = halves[p:p + 1, :]  # [1, 16Cg]
                else:
                    xs = xp_ref[p, :, g * cols:(g + 1) * cols]  # [M, 16Cg]
                xd_ref[sec, p, c * rpc:(c + 1) * rpc, :] = (
                    band[:, None, :] * xs[None, :, :]
                ).reshape(rpc, cols)


def _kernel_gp(*refs, spec: QuantSpec, Cg: int, cpt: int, M: int,
               k_steps: int, prebanded: bool, band_scratch: bool,
               raw_x: bool, stacked: bool, out_dtype, interpret: bool,
               hsplit: bool = False, qsplit: bool = False):
    """One (n, k) grid step of the group-partial kernel.

    stacked=True prepends the scalar-prefetch layer ref, and the
    weight/scale blocks keep a leading layer axis — they are DMA'd
    straight from the [L, ...] resting buffers via the index maps
    (same trick as _kernel_pairs_stacked: no per-layer weight copy).
    """
    # hsplit: (slo, zlo, shi, zhi) half-blocks; qsplit: 4x (s, z)
    ns = 8 if qsplit else (4 if hsplit else 2)
    if stacked:
        _l, xp_ref, w_ref, *rest = refs
        srefs, (o_ref, acc_ref, *scratch) = rest[:ns], rest[ns:]
        w_in = w_ref[0]
        svals = [r[0] for r in srefs]
    else:
        xp_ref, w_ref, *rest = refs
        srefs, (o_ref, acc_ref, *scratch) = rest[:ns], rest[ns:]
        w_in = w_ref[:]
        svals = [r[:] for r in srefs]
    if not (hsplit or qsplit):
        s_in, z_in = svals
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if band_scratch:
        # band the FULL k range ONCE into VMEM scratch at the first
        # grid step and reuse for every (n, k) tile — no XLA-side diag
        # prep (each prep chain cost ~5 us/op of latency-bound glue),
        # no per-tile re-banding (27% slower when recomputed per tile).
        # Round 4 extends this to k_steps > 1 (the w_out shape was
        # pinned to one huge full-k tile and ran at 75% of its own
        # streaming ceiling): the scratch holds one section per k-tile
        # and the body reads section kk.
        xd_ref = scratch[0]

        @pl.when((pl.program_id(1) == 0) & (kk == 0))
        def _():
            if qsplit:
                _band_store_qs(xp_ref, xd_ref, Cg=Cg, cpt=cpt, M=M,
                               k_steps=k_steps)
            elif hsplit:
                _band_store_hs(xp_ref, xd_ref, Cg=Cg, cpt=cpt, M=M,
                               k_steps=k_steps)
            else:
                _band_store(xp_ref, xd_ref, Cg=Cg, cpt=cpt, M=M, raw=raw_x,
                            interpret=interpret, k_steps=k_steps)

        x_in = xd_ref[kk]
        banded = True
    else:
        x_in = xp_ref[:]
        banded = prebanded
    if qsplit:
        fields = tuple((svals[2 * f], svals[2 * f + 1]) for f in range(4))
        acc_ref[:] = _gp_body_qs(
            x_in, w_in, fields, acc_ref[:],
            spec=spec, Cg=Cg, cpt=cpt, M=M, interpret=interpret,
        )
    elif hsplit:
        halves = ((svals[0], svals[1]), (svals[2], svals[3]))
        acc_ref[:] = _gp_body_hs(
            x_in, w_in, halves, acc_ref[:],
            spec=spec, Cg=Cg, cpt=cpt, M=M, interpret=interpret,
        )
    else:
        acc_ref[:] = _gp_body(
            x_in, w_in, s_in, z_in, acc_ref[:],
            spec=spec, Cg=Cg, cpt=cpt, M=M, prebanded=banded,
            interpret=interpret,
        )

    @pl.when(kk == k_steps - 1)
    def _():
        a = acc_ref[:]
        # split layouts band one GROUP per row: Cg/2 (hsplit) / Cg/4
        # (qsplit) band rows per chunk
        red = (Cg // 4) if qsplit else ((Cg // 2) if hsplit else Cg)
        o_ref[:] = jnp.sum(a.reshape(red, M, a.shape[-1]), axis=0).astype(out_dtype)


def _gp_blocks(m: int, kw: int, n: int, layout: str = "pair"):
    """Full-k tiles (k_steps=1) unless VMEM-bound; bn from the tuned
    table else 512. Split-layout shapes get their own key namespaces
    (gph:/gpq:) so they never silently reuse blocks tuned for the pair
    layout; an untuned split shape falls back along qsplit -> hsplit ->
    pair (same bytes, same grid, same k-tiling)."""
    pref = {"hsplit": "gph", "qsplit": "gpq"}.get(layout, "gp")
    tuned = _tuned_table().get(f"{pref}:{m}:{kw}:{n}")
    if tuned is None and layout == "qsplit":
        tuned = _tuned_table().get(f"gph:{m}:{kw}:{n}")
    if tuned is None and layout in ("hsplit", "qsplit"):
        tuned = _tuned_table().get(f"gp:{m}:{kw}:{n}")
    if tuned:
        return tuned[0], tuned[1]
    bkw = kw
    bn = _largest_divisor(n, (512, 384, 256, 128)) or 128
    # keep the double-buffered weight tile under ~6 MB
    while bkw * bn * 4 * 2 > 12 * 1024 * 1024 and bkw % 2 == 0 and (
        (bkw // 2) % 4 == 0
    ):
        bkw //= 2
    return bkw, bn


@functools.partial(
    jax.jit,
    static_argnames=("spec", "shape", "out_dtype", "interpret", "stacked"),
)
def _dequant_matmul_gp_2d(
    x: Array,
    layer: Optional[Array],   # [1] int32 when stacked, else None
    data: Array,              # [KW, N] or [L, KW, N]
    scale: Array,             # [G, N] or [L, G, N]
    zero: Optional[Array],
    *,
    spec: QuantSpec,
    shape,
    out_dtype,
    interpret: bool,
    stacked: bool,
) -> Array:
    k, n = shape
    m = x.shape[0]
    kw, n_stored = data.shape[-2], data.shape[-1]
    G = scale.shape[-2]
    k_stored = kw * spec.elems_per_word
    if x.shape[1] != k_stored:
        x = jnp.pad(x, ((0, 0), (0, k_stored - x.shape[1])))

    hsplit = spec.layout == "hsplit"
    qsplit = spec.layout == "qsplit"
    bkw, bn = _gp_blocks(m, kw, n_stored, layout=spec.layout)
    if hsplit and ((G // (kw // bkw)) % 2 != 0):
        # each k-tile must cover a whole, EVEN group count per plane
        # (the two nibble planes read disjoint halves of the tile's
        # group range); fall back to full-k when the split is odd
        bkw = kw
    if qsplit:
        gt = G // (kw // bkw)
        if gt % 4 != 0 or (gt // 4) % 8 != 0:
            # each k-tile must cover a whole group count per FIELD
            # quarter AND the per-field scale blocks [Gt/4, bn] must
            # satisfy Mosaic's 8-sublane rule; fall back to full-k
            bkw = kw
    k_steps = kw // bkw
    Gt = G // k_steps
    Cg = _gp_pick_cg_qs(Gt, m) if qsplit else _gp_pick_cg(Gt, m)
    cpt = (4 * bkw) // (16 * Cg)
    # full-k band scratch at ANY k_steps (round 4): the raw activation
    # rides in whole with a constant index map (a few KB at m<=8) and
    # is banded once at the first grid step into one scratch section
    # per k-tile. The old prebanded XLA-diag path (m==1, k_steps>1)
    # is gone — it paid ~5 us/op of latency-bound XLA prep per call.
    band_scratch = True
    prebanded = False
    raw_x = (not (hsplit or qsplit) and GP_RAW_X and m == 1
             and x.dtype == jnp.bfloat16)

    # the stacked (scalar-prefetch) grid passes the layer ref as a
    # trailing index-map argument; x/out maps never consult it
    am = (lambda f: (lambda i, j, kk, l: f(i, j, kk))) if stacked else (
        lambda f: f)

    if qsplit:
        acc_rows = (Cg // 4) * m
    elif hsplit:
        acc_rows = (Cg // 2) * m
    else:
        acc_rows = Cg * m
    scratch = [pltpu.VMEM((acc_rows, bn), jnp.float32)]
    if qsplit:
        # raw activation straight in; all four quarters are lane-sliced
        # and banded inside the kernel (stride-1 only; width-32 bands =
        # one group per row, a quarter of the pair form's band rows)
        xp = x
        x_spec = pl.BlockSpec((m, k_stored), am(lambda i, j, kk: (0, 0)))
        scratch.append(pltpu.VMEM(
            (k_steps, 4, cpt * (Cg // 4) * m, 8 * Cg), x.dtype))
    elif hsplit:
        # raw activation straight in; both halves are lane-sliced and
        # banded inside the kernel (stride-1 only; width-32 bands =
        # one group per row, half the band rows of the pair form)
        xp = x
        x_spec = pl.BlockSpec((m, k_stored), am(lambda i, j, kk: (0, 0)))
        scratch.append(pltpu.VMEM(
            (k_steps, 2, cpt * (Cg // 2) * m, 16 * Cg), x.dtype))
    elif raw_x:
        # free bitcast: adjacent bf16 lane pairs -> one u32 word; the
        # kernel's sublane-expanding bitcast recovers the even/odd
        # planes with no XLA transpose chain
        xp = jax.lax.bitcast_convert_type(
            x.reshape(m, k_stored // 2, 2), jnp.uint32)
        x_spec = pl.BlockSpec((m, 4 * kw), am(lambda i, j, kk: (0, 0)))
        scratch.append(pltpu.VMEM((k_steps, 2, cpt * Cg * m, 16 * Cg),
                                  x.dtype))
    else:
        xr = x.reshape(m, kw, 4, 2)
        xp = xr.transpose(3, 0, 1, 2).reshape(2, m, kw * 4)
        x_spec = pl.BlockSpec((2, m, 4 * kw),
                              am(lambda i, j, kk: (0, 0, 0)))
        scratch.append(pltpu.VMEM((k_steps, 2, cpt * Cg * m, 16 * Cg),
                                  x.dtype))

    if stacked:
        def wb(bs):
            return pl.BlockSpec((1,) + bs, lambda i, j, kk, l: (l[0],) + (
                (kk, j)))
    else:
        def wb(bs):
            return pl.BlockSpec(bs, lambda i, j, kk: (kk, j))
    if zero is None:
        zero = scale
    if qsplit:
        # per-tile scale QUARTER-blocks: field f's groups live at rows
        # [f*G/4 + kk*Gt/4, +Gt/4) — the field offset in block units is
        # f*k_steps (G/4 = k_steps * Gt/4)
        gq = Gt // 4
        if stacked:
            def sq(off):
                return pl.BlockSpec(
                    (1, gq, bn),
                    lambda i, j, kk, l, _o=off: (l[0], _o + kk, j))
        else:
            def sq(off):
                return pl.BlockSpec(
                    (gq, bn), lambda i, j, kk, _o=off: (_o + kk, j))
        in_specs = [x_spec, wb((bkw, bn))]
        operands = [xp, data]
        for f in range(4):
            in_specs += [sq(f * k_steps), sq(f * k_steps)]
            operands += [scale, zero]
        operands = tuple(operands)
    elif hsplit:
        # per-tile scale HALF-blocks: plane 0's groups live at rows
        # [kk*Gt/2, +Gt/2), plane 1's at [G/2 + kk*Gt/2, +Gt/2) — the
        # hi offset in block units is k_steps (G/2 = k_steps * Gt/2)
        gh = Gt // 2
        if stacked:
            def sb(off):
                return pl.BlockSpec(
                    (1, gh, bn),
                    lambda i, j, kk, l, _o=off: (l[0], _o + kk, j))
        else:
            def sb(off):
                return pl.BlockSpec(
                    (gh, bn), lambda i, j, kk, _o=off: (_o + kk, j))
        in_specs = [x_spec, wb((bkw, bn)),
                    sb(0), sb(0), sb(k_steps), sb(k_steps)]
        operands = (xp, data, scale, zero, scale, zero)
    else:
        in_specs = [x_spec, wb((bkw, bn)), wb((Gt, bn)), wb((Gt, bn))]
        operands = (xp, data, scale, zero)
    out_spec = pl.BlockSpec((m, bn), am(lambda i, j, kk: (0, j)))

    kernel = functools.partial(
        _kernel_gp, spec=spec, Cg=Cg, cpt=cpt, M=m, k_steps=k_steps,
        prebanded=prebanded, band_scratch=band_scratch, raw_x=raw_x,
        stacked=stacked, out_dtype=out_dtype, interpret=interpret,
        hsplit=hsplit, qsplit=qsplit,
    )
    cparams = pltpu.CompilerParams(
        dimension_semantics=(
            "parallel",
            "arbitrary" if band_scratch else "parallel",
            "arbitrary",
        ),
    )
    grid = (1, n_stored // bn, k_steps)
    out_shape = jax.ShapeDtypeStruct((m, n_stored), out_dtype)
    if stacked:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel, grid_spec=gs, out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(layer, *operands)
    else:
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=cparams,
            cost_estimate=pl.CostEstimate(
                flops=2 * m * k_stored * n_stored,
                bytes_accessed=data.size * 4
                + scale.size * scale.dtype.itemsize
                + m * k_stored * 2 + m * n_stored * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(*operands)
    return out[:, :n]


def _kernel_pairs_stacked(l_ref, xlo_ref, xhi_ref, w_ref, s_ref, z_ref, o_ref,
                          acc_ref, *, spec: QuantSpec, k_steps: int, out_dtype,
                          interpret: bool):
    """Stacked-weights variant: blocks of layer l_ref[0] are DMA'd
    straight out of the [L, KW, N] resting buffers via the
    scalar-prefetch index maps — no per-layer weight copy."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = xlo_ref.dtype
    rows_per_group = spec.group_size // 2
    lo8, hi8 = _nibble_planes(w_ref[0], interpret)
    scale_e = _row_repeat(s_ref[0].astype(cdtype), rows_per_group)
    wv_lo = lo8.astype(cdtype) * scale_e
    wv_hi = hi8.astype(cdtype) * scale_e
    if spec.sym:
        off_e = scale_e * (-spec.max_int)
    else:
        off_e = _row_repeat(z_ref[0].astype(cdtype), rows_per_group)

    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[:]
    acc += jax.lax.dot_general(xlo_ref[:], wv_lo, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(xhi_ref[:], wv_hi, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        xlo_ref[:] + xhi_ref[:], off_e, dn, preferred_element_type=jnp.float32
    )
    acc_ref[:] = acc

    @pl.when(k_idx == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def dequant_matmul_stacked_supported(spec: QuantSpec) -> bool:
    # int4/u32 rides the pairs/gp kernels; everything word-packed or i8
    # (int3, u16, fp4, int8) rides the generic stacked plane kernel
    return spec.storage in ("u32", "u16", "i8")


@functools.partial(
    jax.jit, static_argnames=("spec", "shape", "out_dtype", "interpret")
)
def _dequant_matmul_stacked_2d(
    x: Array,
    layer: Array,        # [1] int32
    data: Array,         # [L, KW, N]
    scale: Array,        # [L, G, N]
    zero: Optional[Array],
    *,
    spec: QuantSpec,
    shape,
    out_dtype,
    interpret: bool,
) -> Array:
    k, n = shape
    m = x.shape[0]
    _, kw, n_stored = data.shape
    wpg = -(-spec.group_size // spec.elems_per_word)
    k_stored = kw * spec.elems_per_word
    if x.shape[1] != k_stored:
        x = jnp.pad(x, ((0, 0), (0, k_stored - x.shape[1])))
    hsplit = spec.layout == "hsplit"
    qsplit = spec.layout == "qsplit"
    if qsplit:
        kq = k_stored // 4
        xparts = [x[:, f * kq:(f + 1) * kq] for f in range(4)]
    elif hsplit:
        kh = k_stored // 2
        xparts = [x[:, :kh], x[:, kh:]]
    else:
        xr = x.reshape(m, kw, 4, 2)
        xparts = [xr[..., 0].reshape(m, kw * 4),
                  xr[..., 1].reshape(m, kw * 4)]

    bm, bkw, bn = _pick_blocks(m, kw, n_stored, wpg,
                               epw=spec.elems_per_word,
                               layout=spec.layout)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        xparts = [jnp.pad(xp_, ((0, m_pad - m), (0, 0))) for xp_ in xparts]
    k_steps = kw // bkw
    bkg = bkw // wpg
    if zero is None:
        zero = scale

    if qsplit:
        gq = bkg // 4
        assert bkg % 4 == 0 and (gq % 8 == 0 or k_steps == 1), (
            f"qsplit k-tile must cover a 4-divisible group count with "
            f"8-sublane quarter blocks, got bkg={bkg} (bkw={bkw}): tune "
            f"qsplit bkw to 128-word units")
        kernel = functools.partial(
            _kernel_pairs_qs, spec=spec, k_steps=k_steps,
            out_dtype=out_dtype, stacked=True, interpret=interpret,
        )
        in_specs = [
            pl.BlockSpec((bm, 2 * bkw), lambda i, j, kk, l: (i, kk))
            for _ in range(4)
        ] + [pl.BlockSpec((1, bkw, bn), lambda i, j, kk, l: (l[0], kk, j))]
        for f in range(4):
            in_specs += [
                pl.BlockSpec((1, gq, bn),
                             lambda i, j, kk, l, _f=f:
                             (l[0], _f * k_steps + kk, j)),
            ] * 2
        operands = (layer,) + tuple(xparts) + (data,) + (scale, zero) * 4
    elif hsplit:
        assert bkg % 2 == 0, (
            f"hsplit k-tile must cover an even group count, got "
            f"bkg={bkg} (bkw={bkw}): tune hsplit bkw to 8-word units")
        kernel = functools.partial(
            _kernel_pairs_hs, spec=spec, k_steps=k_steps,
            out_dtype=out_dtype, stacked=True, interpret=interpret,
        )
        in_specs = [
            pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk, l: (i, kk)),
            pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk, l: (i, kk)),
            pl.BlockSpec((1, bkw, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg // 2, bn),
                         lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg // 2, bn),
                         lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg // 2, bn),
                         lambda i, j, kk, l: (l[0], k_steps + kk, j)),
            pl.BlockSpec((1, bkg // 2, bn),
                         lambda i, j, kk, l: (l[0], k_steps + kk, j)),
        ]
        operands = (layer, xparts[0], xparts[1], data, scale, zero, scale, zero)
    else:
        kernel = functools.partial(
            _kernel_pairs_stacked, spec=spec, k_steps=k_steps,
            out_dtype=out_dtype, interpret=interpret,
        )
        in_specs = [
            pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk, l: (i, kk)),
            pl.BlockSpec((bm, 4 * bkw), lambda i, j, kk, l: (i, kk)),
            pl.BlockSpec((1, bkw, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg, bn), lambda i, j, kk, l: (l[0], kk, j)),
            pl.BlockSpec((1, bkg, bn), lambda i, j, kk, l: (l[0], kk, j)),
        ]
        operands = (layer, xparts[0], xparts[1], data, scale, zero)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, n_stored // bn, k_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, l: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_stored), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, :n]


def dequant_matmul_stacked(
    x: Array, w: QuantizedTensor, layer: Array, out_dtype=None
) -> Array:
    """x: [..., k] @ dequant(stacked w at `layer`) -> [..., n].

    w holds layer-STACKED leaves (data [L, KW, N]); layer is a traced
    int32 index. The kernel reads layer blocks in place — the jnp
    alternative (dynamic_index then matmul) copies ~the whole layer's
    packed weights every call."""
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, x.shape[-1])
    interpret = jax.default_backend() == "cpu"
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    if gp3_matmul_supported(w.spec, w.scale.shape[1], m):
        y = _dequant_matmul_gp3_2d(
            x2, lidx, w.data, w.scale,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype,
            interpret=interpret, stacked=True,
        )
    elif gp_matmul_supported(w.spec, w.scale.shape[1], m):
        y = _dequant_matmul_gp_2d(
            x2, lidx, w.data, w.scale, w.zero,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype,
            interpret=interpret, stacked=True,
        )
    elif (w.spec.layout in ("hsplit", "qsplit")
          and not split_groups_blockable(w.spec, w.scale.shape[1])):
        from ...quant.groupwise import dequantize

        qt_l = QuantizedTensor(
            data=w.data[lidx[0]], scale=w.scale[lidx[0]],
            zero=None if w.zero is None else w.zero[lidx[0]],
            spec=w.spec, shape=w.shape)
        y = jnp.matmul(x2, dequantize(qt_l, x2.dtype),
                       preferred_element_type=jnp.float32).astype(out_dtype)
    elif w.spec.mode == "int4" and w.spec.storage == "u32":
        y = _dequant_matmul_stacked_2d(
            x2, lidx, w.data, w.scale, w.zero,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype,
            interpret=interpret,
        )
    else:
        y = _dequant_matmul_stacked_generic_2d(
            x2, lidx, w.data, w.scale, w.zero,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype,
            interpret=interpret,
        )
    return y.reshape(*lead, w.shape[1])


def dequant_matmul(x: Array, w: QuantizedTensor, out_dtype=None) -> Array:
    """x: [..., k] @ dequant(w) -> [..., n]."""
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, x.shape[-1])
    interpret = jax.default_backend() == "cpu"
    if gp3_matmul_supported(w.spec, w.scale.shape[0], m):
        y = _dequant_matmul_gp3_2d(
            x2, None, w.data, w.scale,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype,
            interpret=interpret, stacked=False,
        )
    elif gp_matmul_supported(w.spec, w.scale.shape[0], m):
        y = _dequant_matmul_gp_2d(
            x2, None, w.data, w.scale, w.zero,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype,
            interpret=interpret, stacked=False,
        )
    elif (w.spec.layout in ("hsplit", "qsplit")
          and not split_groups_blockable(w.spec, w.scale.shape[0])):
        # unpadded split group count the kernels can't block: exact
        # jnp fallback (engines pad to 32 groups and never land here)
        from ...quant.groupwise import dequantize

        y = jnp.matmul(x2, dequantize(w, x2.dtype),
                       preferred_element_type=jnp.float32).astype(out_dtype)
    else:
        y = _dequant_matmul_2d(
            x2, w.data, w.scale, w.zero,
            spec=w.spec, shape=w.shape, out_dtype=out_dtype, interpret=interpret,
        )
    return y.reshape(*lead, w.shape[1])
