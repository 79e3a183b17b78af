"""Group-wise encode/decode in pure jnp (jit-able, runs on any backend).

The offline quantizer (replacing the reference's param-transform VM run,
/root/reference/mlc_llm/utils.py:98-110) and the jnp fallback decode path
both live here; the Pallas fused dequant-matmul kernels re-implement the
same decode math in-kernel (mlc_llm_tpu/ops/pallas/).

Logical weight layout is [k, n] (reduction-major); quant groups run along
axis 0 (k). HF Linear weights [out, in] are transposed at load time.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .spec import QuantSpec, resolve_spec

Array = jax.Array

# packed columns are padded so kernel blocks can be wide: large-n
# weights pad to 1024 lanes (the dequant-matmul kernel then uses
# 2048-lane blocks whose HBM rows are 8 KB contiguous — narrow blocks
# at large n measured ~200 GB/s vs ~950 GB/s from stride-limited DMA),
# small-n weights pad to the 128-lane tile minimum.
def pad_cols(n: int) -> int:
    mult = 1024 if n >= 4096 else 128
    return -(-n // mult) * mult


LANE_PAD = 128  # retained for callers that only need the tile minimum


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """A packed group-quantized 2-D weight.

    data:  packed values. "u4"/"i8" storage: [k_pad, n] (uint4 / int8);
           "u32"/"u16" storage: [k_pad // elems_per_word, n].
    scale: [n_groups, n] in the compute dtype.
    zero:  [n_groups, n] group minimum (asym only) in the compute dtype,
           else None.
    spec / shape are static pytree metadata; shape is the LOGICAL (k, n).
    """

    data: Array
    scale: Array
    zero: Optional[Array]
    spec: QuantSpec = dataclasses.field(metadata=dict(static=True))
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def n_groups(self) -> int:
        return self.scale.shape[0]

    def nbytes(self) -> int:
        total = self.data.size * self.data.dtype.itemsize
        if self.data.dtype in (jnp.uint4, jnp.int4):
            total = self.data.size // 2
        total += self.scale.size * self.scale.dtype.itemsize
        if self.zero is not None:
            total += self.zero.size * self.zero.dtype.itemsize
        return total


def _pad_k(w: Array, group_size: int) -> Array:
    k = w.shape[0]
    k_pad = -(-k // group_size) * group_size
    if k_pad != k:
        w = jnp.pad(w, ((0, k_pad - k), (0, 0)))
    return w


def _f32_to_f4(x: Array) -> Array:
    """f32 -> 4-bit (sign | 3-bit exponent) code, round-to-nearest.

    Same bit recipe as the reference's _tir_f32_to_uint_to_f4
    (/root/reference/mlc_llm/transform/quantization.py:51-63).
    """
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    m_h = (u >> 22) & 1  # mantissa MSB: round exponent up
    e_f32 = (u >> 23) & 0xFF
    s = u >> 31
    e_f4 = jnp.where(
        e_f32 > 120,
        jnp.minimum(e_f32 - 120 + m_h, 7),
        jnp.where(e_f32 == 120, jnp.uint32(1), jnp.uint32(0)),
    )
    return (s << 3) | e_f4


def _f4_to_float(code: Array, dtype) -> Array:
    """4-bit (sign|exp3) code -> float: ±2^(e-7), 0 when e == 0."""
    code = code.astype(jnp.int32)
    s = code >> 3
    e = code & 7
    mag = jnp.where(e == 0, 0.0, jnp.exp2((e - 7).astype(jnp.float32)))
    return (jnp.where(s == 1, -mag, mag)).astype(dtype)


def _hs_interleave(codes: Array) -> Array:
    """Element-order codes [K, n] -> nibble-slot order for hsplit packing.

    hsplit ("half-split") puts element q in the LO nibble and element
    K/2+q in the HI nibble of byte q%4 of word q//4, so the kernels'
    sublane-expanded nibble planes are the two contiguous halves of x
    (no stride-2 activation deinterleave). Nibble slot e of word r:
    e=2b -> element 4r+b, e=2b+1 -> element K/2+4r+b."""
    K, n = codes.shape
    assert K % 8 == 0, K
    kh = K // 2
    lo = codes[:kh].reshape(kh // 4, 4, n)
    hi = codes[kh:].reshape(kh // 4, 4, n)
    return jnp.stack([lo, hi], axis=2).reshape(K, n)


def _hs_restore(codes_slots: Array) -> Array:
    """Inverse of _hs_interleave: nibble-slot order -> element order."""
    K, n = codes_slots.shape
    a = codes_slots.reshape(K // 8, 4, 2, n)
    kh = K // 2
    return jnp.concatenate(
        [a[:, :, 0].reshape(kh, n), a[:, :, 1].reshape(kh, n)], axis=0
    )


def _qs_interleave(codes: Array) -> Array:
    """Element-order codes [K, n] -> nibble-slot order for qsplit packing.

    qsplit ("quarter-split") puts element f*(K/4) + 2r + h in the
    nibble at bits (16h + 4f) of word r, so extracting halfword field f
    and bitcasting u32->bf16 yields a plane of CONTIGUOUS elements of
    x's f-th quarter (kernels bit-assemble exact bf16 values with no
    i8->bf16 cast). Nibble slot e = 4h + f of word r (bits 4e) holds
    element f*(K/4) + 2r + h."""
    K, n = codes.shape
    assert K % 8 == 0, K
    q = codes.reshape(4, K // 8, 2, n)  # [f, r, h, n]
    return q.transpose(1, 2, 0, 3).reshape(K, n)  # slot order (r, h, f)


def _qs_restore(codes_slots: Array) -> Array:
    """Inverse of _qs_interleave: nibble-slot order -> element order."""
    K, n = codes_slots.shape
    a = codes_slots.reshape(K // 8, 2, 4, n)  # [r, h, f, n]
    return a.transpose(2, 0, 1, 3).reshape(K, n)  # [f, r, h, n] flat


def _pack_words(codes: Array, spec: QuantSpec) -> Array:
    """[k_pad, n] uint32 codes -> [k_pad//epw, n] packed words (LSB-first)."""
    epw = spec.elems_per_word
    k_pad, n = codes.shape
    assert k_pad % epw == 0, (k_pad, epw)
    if spec.layout == "hsplit":
        codes = _hs_interleave(codes)
    elif spec.layout == "qsplit":
        codes = _qs_interleave(codes)
    wdtype = jnp.uint32 if spec.storage == "u32" else jnp.uint16
    codes = codes.reshape(k_pad // epw, epw, n).astype(jnp.uint32)
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * spec.nbit)[None, :, None]
    # codes occupy disjoint bit ranges, so sum == bitwise-or (no carries)
    words = jnp.sum(codes << shifts, axis=1, dtype=jnp.uint32)
    if wdtype == jnp.uint16:
        words = words.astype(jnp.uint16)
    return words


def _unpack_words(words: Array, spec: QuantSpec) -> Array:
    """[rows, n] packed words -> [rows*epw, n] uint32 codes (element order)."""
    epw = spec.elems_per_word
    rows, n = words.shape
    w32 = words.astype(jnp.uint32)
    shifts = (jnp.arange(epw, dtype=jnp.uint32) * spec.nbit)[None, :, None]
    mask = jnp.uint32((1 << spec.nbit) - 1)
    codes = (w32[:, None, :] >> shifts) & mask
    codes = codes.reshape(rows * epw, n)
    if spec.layout == "hsplit":
        codes = _hs_restore(codes)
    elif spec.layout == "qsplit":
        codes = _qs_restore(codes)
    return codes


@partial(jax.jit, static_argnames=("spec",))
def _quantize_impl(w: Array, spec: QuantSpec):
    dtype = jnp.dtype(spec.dtype)
    g = spec.group_size
    w = _pad_k(w.astype(jnp.float32), g)
    k_pad, n = w.shape
    n_groups = k_pad // g
    wg = w.reshape(n_groups, g, n)

    if spec.sym:
        absmax = jnp.max(jnp.abs(wg), axis=1)  # [n_groups, n]
        absmax = jnp.maximum(absmax, 1e-4)
        if spec.mode == "fp4":
            scale = absmax
        else:
            scale = absmax / spec.max_int
        # Match the reference: scales are stored in the compute dtype
        # and decode multiplies in that dtype.
        scale_st = scale.astype(dtype)
        scaled = wg / scale_st.astype(jnp.float32)[:, None, :]
        if spec.mode == "fp4":
            codes = _f32_to_f4(scaled).reshape(k_pad, n)
        else:
            q = jnp.round(scaled) + spec.max_int
            q = jnp.clip(q, 0, 2 * spec.max_int)
            codes = q.astype(jnp.uint32).reshape(k_pad, n)
        zero_st = None
    else:
        gmin = jnp.min(wg, axis=1)
        gmax = jnp.max(wg, axis=1)
        scale = (gmax - gmin) / ((1 << spec.nbit) - 1)
        scale_st = scale.astype(dtype)
        zero_st = gmin.astype(dtype)
        safe = jnp.maximum(scale_st.astype(jnp.float32), 1e-10)
        q = jnp.round((wg - zero_st.astype(jnp.float32)[:, None, :]) / safe[:, None, :])
        q = jnp.clip(q, 0, (1 << spec.nbit) - 1)
        codes = q.astype(jnp.uint32).reshape(k_pad, n)

    if spec.storage == "u4":
        data = codes.astype(jnp.uint4)
    elif spec.storage == "i8":
        data = (codes.astype(jnp.int32) - spec.max_int).astype(jnp.int8)
    else:
        # pad k to a whole number of words per group
        epw = spec.elems_per_word
        rows_per_group = -(-g // epw)
        k_words = n_groups * rows_per_group * epw
        if k_words != k_pad:
            codes = jnp.pad(codes, ((0, k_words - k_pad), (0, 0)))
        data = _pack_words(codes, spec)
    # pad n (lanes) for TPU tiling + wide kernel blocks; padded columns
    # decode to 0 by construction and are sliced off on the way out
    n_pad = pad_cols(n)
    if n_pad != n:
        data = jnp.pad(data, ((0, 0), (0, n_pad - n)))
        scale_st = jnp.pad(scale_st, ((0, 0), (0, n_pad - n)))
        if zero_st is not None:
            zero_st = jnp.pad(zero_st, ((0, 0), (0, n_pad - n)))
    return data, scale_st, zero_st


def quantize(w: Array, spec) -> QuantizedTensor:
    """Quantize a [k, n] weight (groups along k)."""
    spec = resolve_spec(spec)
    if not spec.is_quantized:
        raise ValueError("cannot quantize with mode='none'")
    if w.ndim != 2:
        raise ValueError(f"quantize expects a 2-D [k, n] weight, got shape {w.shape}")
    k, n = w.shape
    if spec.layout in ("hsplit", "qsplit"):
        # split layouts pair element q with elements K/2+q (hsplit) or
        # spread a word over four quarters (qsplit), so the
        # (group-padded) k must split into 2 (hsplit) / 4 (qsplit)
        # equal group-aligned parts; otherwise the fused kernels'
        # plane->group mapping is undefined (an odd group count
        # previously surfaced as an opaque broadcast TypeError deep
        # inside the Pallas kernel)
        parts = 2 if spec.layout == "hsplit" else 4
        k_pad = -(-k // spec.group_size) * spec.group_size
        if (k_pad // spec.group_size) % parts != 0:
            raise ValueError(
                f"{spec.layout} layout needs a group count divisible by "
                f"{parts}: k={k} gives {k_pad // spec.group_size} groups "
                f"of {spec.group_size}; use spec_for_k for per-shape "
                "layout fallback")
    data, scale, zero = _quantize_impl(jnp.asarray(w), spec)
    return QuantizedTensor(data=data, scale=scale, zero=zero, spec=spec, shape=(k, n))


def pad_quantized_groups(qt: QuantizedTensor, mult: int = 32) -> QuantizedTensor:
    """Zero-pad the k axis so n_groups becomes a multiple of `mult`.

    Purely a kernel-enablement transform (the group-partial Pallas
    kernel wants wide power-of-two chunk widths, ops/pallas/
    dequant_matmul.py): logical shape is unchanged, padded groups have
    zero scale/zero offset AND the activations are zero there, so every
    compute path is exact. Works on flat [KW, N] and layer-stacked
    [L, KW, N] tensors (pads axis -2)."""
    spec = qt.spec
    if not spec.is_quantized or spec.storage not in ("u32", "u16"):
        return qt
    G = qt.scale.shape[-2]
    dg = (-G) % mult
    if dg == 0:
        return qt
    wpg = -(-spec.group_size // spec.elems_per_word)

    def padrows(a, rows):
        if a is None:
            return None
        pw = [(0, 0)] * a.ndim
        pw[-2] = (0, rows)
        return jnp.pad(a, pw)

    if spec.layout in ("hsplit", "qsplit"):
        # the split element->nibble-slot mappings depend on TOTAL k
        # (hsplit pairs q with K/2+q; qsplit spreads words over four
        # quarters), so appending zero words would silently shift every
        # existing element: zero-pad at the CODE level and repack
        # (one-time init cost)
        def repack(d2):
            # u8 codes (values 0-15) keep the transient at 2x the packed
            # size; layers repack SEQUENTIALLY — a vmap over 32 stacked
            # 7B layers materialized ~12 GB of expanded codes and OOM'd
            # the 16 GB HBM next to the resident weights
            codes = _unpack_words(d2, spec).astype(jnp.uint8)
            codes = jnp.pad(codes, ((0, dg * spec.group_size), (0, 0)))
            return _pack_words(codes, spec)

        data = (jnp.stack([repack(qt.data[i])
                           for i in range(qt.data.shape[0])])
                if qt.data.ndim == 3 else repack(qt.data))
    else:
        data = padrows(qt.data, dg * wpg)

    return QuantizedTensor(
        data=data,
        scale=padrows(qt.scale, dg),
        zero=padrows(qt.zero, dg),
        spec=spec,
        shape=qt.shape,
    )


def to_pair_layout(qt: QuantizedTensor) -> QuantizedTensor:
    """Repack a split-packed (hsplit/qsplit) tensor into the pair
    element order (exact: same codes, same scales — only the
    element->bit-slot assignment changes). Used before GSPMD sharding:
    the split mappings are GLOBAL in k (hsplit pairs q with K/2+q;
    qsplit spreads words over quarters), so a row-sharded tensor's
    dequantize would permute rows ACROSS shards and GSPMD would insert
    per-layer weight resharding; the pair order is shard-local under
    contiguous k splits. Works on flat [KW, N] and layer-stacked
    [L, KW, N] tensors (sequential per layer — a vmap materializes L
    full code planes at once)."""
    spec = qt.spec
    if spec.layout not in ("hsplit", "qsplit"):
        return qt
    import dataclasses as _dc

    pair_spec = _dc.replace(spec, layout="pair")

    def repack(d2):
        codes = _unpack_words(d2, spec).astype(jnp.uint8)
        return _pack_words(codes, pair_spec)

    data = (jnp.stack([repack(qt.data[i]) for i in range(qt.data.shape[0])])
            if qt.data.ndim == 3 else repack(qt.data))
    return QuantizedTensor(data=data, scale=qt.scale, zero=qt.zero,
                           spec=pair_spec, shape=qt.shape)


def _codes(qt: QuantizedTensor) -> Array:
    """Unpack storage to per-element integer codes [k_stored, n] (int32)."""
    spec = qt.spec
    if spec.storage == "u4":
        return qt.data.astype(jnp.int32)
    if spec.storage == "i8":
        return qt.data.astype(jnp.int32) + spec.max_int
    return _unpack_words(qt.data, spec).astype(jnp.int32)


def dequantize(qt: QuantizedTensor, dtype=None) -> Array:
    """Decode to a dense [k, n] array in the compute dtype."""
    spec = qt.spec
    out_dtype = jnp.dtype(dtype or spec.dtype)
    k, n = qt.shape
    g = spec.group_size
    codes = _codes(qt)  # [k_stored, n_stored] (columns may be lane-padded)
    k_stored = codes.shape[0]
    n_stored = codes.shape[1]

    if spec.storage in ("u32", "u16"):
        # words are packed per group: rows_per_group*epw slots per group,
        # of which the first g are real.
        epw = spec.elems_per_word
        rows_per_group = -(-g // epw)
        slots = rows_per_group * epw
        n_groups = qt.n_groups
        codes = codes.reshape(n_groups, slots, n_stored)[:, :g, :].reshape(
            n_groups * g, n_stored
        )
        k_stored = n_groups * g

    n_groups = qt.n_groups
    codes = codes.reshape(n_groups, g, n_stored)
    scale = qt.scale.astype(out_dtype)[:, None, :]
    if spec.sym:
        if spec.mode == "fp4":
            w = _f4_to_float(codes, out_dtype) * scale
        else:
            w = (codes - spec.max_int).astype(out_dtype) * scale
    else:
        w = codes.astype(out_dtype) * scale + qt.zero.astype(out_dtype)[:, None, :]
    return w.reshape(n_groups * g, n_stored)[:k, :n]


def take_dequantize(qt: QuantizedTensor, indices: Array, dtype=None) -> Array:
    """Fused gather+dequant for quantized embeddings.

    The embedding table is stored as [vocab, hidden] quantized along
    hidden (axis 1) — i.e. the QuantizedTensor holds the TRANSPOSED
    [hidden, vocab] layout and we gather columns. Mirrors the
    reference's decoding_after_taking_func
    (/root/reference/mlc_llm/transform/quantization.py:235-270).

    indices: int array of any shape; returns [*indices.shape, hidden].
    """
    spec = qt.spec
    out_dtype = jnp.dtype(dtype or spec.dtype)
    flat = indices.reshape(-1)
    # gather columns (axis 1 = vocab), then decode the small slice
    sub = QuantizedTensor(
        data=qt.data[:, flat],
        scale=qt.scale[:, flat],
        zero=None if qt.zero is None else qt.zero[:, flat],
        spec=spec,
        shape=(qt.shape[0], flat.shape[0]),
    )
    dense = dequantize(sub, out_dtype)  # [hidden, num_indices]
    out = dense.T.reshape(*indices.shape, qt.shape[0])
    return out
