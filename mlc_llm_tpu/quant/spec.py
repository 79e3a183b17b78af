"""Quantization spec + named presets (the reference's quantization-mode zoo).

Reference flag surface: ``--quantization-mode int4/int3/fp4 --quantization-sym
--quantization-storage-nbit 32/16/8`` (/root/reference/build.py:19-25), with
group size 40 for 3-bit else 32 (/root/reference/build.py:113-119).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a group-quant format.

    mode: "int4" | "int3" | "fp4" | "int8" | "none"
    group_size: group length along the reduction (k) axis
    sym: symmetric (absmax) vs asymmetric (min/max) scaling
    storage: "u4" (native uint4 plane), "u32"/"u16" (bit-packed words),
             "i8" (int8 plane), "raw" (unquantized)
    dtype: compute dtype name ("bfloat16" | "float16" | "float32")
    """

    mode: str = "int4"
    group_size: int = 32
    sym: bool = False
    storage: str = "u4"
    dtype: str = "bfloat16"
    # Word-packing element order (int4/u32 only):
    #   "pair":   word r packs elements [8r, 8r+8) LSB-first — byte b
    #             holds the EVEN/ODD element pair (8r+2b, 8r+2b+1).
    #   "hsplit": byte b of word r holds elements (4r+b, K/2 + 4r+b) —
    #             the two nibble planes become the contiguous halves of
    #             x, so the fused kernels take raw bf16 activations with
    #             NO XLA deinterleave (the pair layout's per-call
    #             convert/reshape/shift chains measured ~0.4 ms/step at
    #             7B b1 decode, tpu_logs/profile_r3).
    #   "qsplit": nibble at bits (16h + 4f) of word r holds element
    #             f*(K/4) + 2r + h — each halfword FIELD plane is a
    #             contiguous QUARTER of x, so the kernels build exact
    #             bf16 values 16+q by pure bit assembly
    #             ((w>>shift & 0x00780078) | 0x41804180, the gp3 trick
    #             at 4 bits) with ZERO i8->bf16 casts. The cast was the
    #             measured per-element floor of the hsplit kernels
    #             (wo at 69% of its own streaming ceiling on a quiet
    #             chip, tpu_logs/ceiling_merged_r5.log; qsplit kernel
    #             +5..+57% per shape, tpu_logs/qsplit_ab_r5.log).
    # Same codes, same scales, same math — only the element->bit-slot
    # assignment differs.
    layout: str = "pair"

    def __post_init__(self):
        if self.mode == "none":
            return
        if self.layout not in ("pair", "hsplit", "qsplit"):
            raise ValueError(f"unknown packing layout {self.layout!r}")
        if self.layout in ("hsplit", "qsplit") and not (
                self.mode == "int4" and self.storage == "u32"):
            raise ValueError(
                f"{self.layout} layout is defined for int4/u32 only")
        if self.mode == "int3" and not self.sym:
            # int3 requires sym, as in the reference
            # (/root/reference/mlc_llm/transform/quantization.py:284-287).
            raise ValueError("int3 quantization requires sym=True")
        if self.mode == "fp4" and not self.sym:
            raise ValueError("fp4 quantization requires sym=True")
        valid_storage = {
            "int4": ("u32", "u16", "u4"),
            "int3": ("u32", "u16"),
            "fp4": ("u32", "u4"),
            "int8": ("i8",),
        }
        if self.mode not in valid_storage:
            raise ValueError(f"unknown quantization mode {self.mode!r}")
        if self.storage not in valid_storage[self.mode]:
            raise ValueError(
                f"storage {self.storage!r} invalid for mode {self.mode!r}"
            )

    @property
    def nbit(self) -> int:
        return {"int4": 4, "int3": 3, "fp4": 4, "int8": 8, "none": 16}[self.mode]

    @property
    def max_int(self) -> int:
        """Symmetric-mode integer ceiling, 2^(n-1)-1."""
        return (1 << (self.nbit - 1)) - 1

    @property
    def elems_per_word(self) -> int:
        """Packed values per storage word (u32/u16 storage only)."""
        word_bits = {"u32": 32, "u16": 16}[self.storage]
        return word_bits // self.nbit

    @property
    def is_quantized(self) -> bool:
        return self.mode != "none"

    @property
    def bits_per_weight(self) -> float:
        """Effective storage bits per weight incl. padding waste + scales."""
        if not self.is_quantized:
            return 16.0
        if self.storage == "u4":
            data_bits = 4.0
        elif self.storage == "i8":
            data_bits = 8.0
        else:
            word_bits = {"u32": 32, "u16": 16}[self.storage]
            data_bits = word_bits / self.elems_per_word
        scale_bits = 16.0 / self.group_size * (1 if self.sym else 2)
        return data_bits + scale_bits


# Preset names follow the reference's qXfYY naming (q4f16 = int4 asym
# group-32 at fp16 compute). bf16 variants are the TPU-preferred defaults.
QUANT_PRESETS = {
    # u32 word packing: the axon TPU runtime has no native u4 dtype
    # support, and packed words are what the Pallas kernels consume.
    # DEFAULT int4 layout is quarter-split since round 5 (identical
    # math/bits/scales to the pair/hsplit orders — only the
    # element->bit-slot assignment differs): the qsplit kernels
    # bit-assemble exact bf16 code values with NO i8->bf16 cast (the
    # measured per-element floor of the hsplit kernels), measured
    # 154.0 vs 151.5 tok/s decode and 78.5 vs 79.3 ms ctx-512 prefill
    # at 7B b1 with the qs:-tuned prefill tiles (tpu_logs/hs_ab_r5a.log,
    # qs_prefill_ab2_r5.log). Round-4 default was half-split (hsplit:
    # 150.4 vs 138.8 pair, tpu_logs/hs_ab_r4.log). Loaders auto-
    # downgrade qsplit -> hsplit -> pair for shapes whose group count
    # can't split (spec_for_k); *_pair/*_hs presets pin the older
    # orders explicitly, and checkpoints carry their spec so existing
    # artifacts keep working.
    "q4f16": QuantSpec("int4", 32, False, "u32", "float16",
                       layout="qsplit"),
    "q4bf16": QuantSpec("int4", 32, False, "u32", "bfloat16",
                        layout="qsplit"),
    "q4f16_pair": QuantSpec("int4", 32, False, "u32", "float16"),
    "q4bf16_pair": QuantSpec("int4", 32, False, "u32", "bfloat16"),
    # legacy aliases (hsplit was opt-in during round 3)
    "q4f16_hs": QuantSpec("int4", 32, False, "u32", "float16",
                          layout="hsplit"),
    "q4bf16_hs": QuantSpec("int4", 32, False, "u32", "bfloat16",
                           layout="hsplit"),
    # quarter-split: cast-free bit-assembled kernels (round 5)
    "q4f16_qs": QuantSpec("int4", 32, False, "u32", "float16",
                          layout="qsplit"),
    "q4bf16_qs": QuantSpec("int4", 32, False, "u32", "bfloat16",
                           layout="qsplit"),
    "q4f32": QuantSpec("int4", 32, False, "u32", "float32"),
    "q4f16_sym": QuantSpec("int4", 32, True, "u32", "float16"),
    "q4bf16_sym": QuantSpec("int4", 32, True, "u32", "bfloat16"),
    "q4bf16_plane": QuantSpec("int4", 32, False, "u4", "bfloat16"),
    "q3f16": QuantSpec("int3", 40, True, "u32", "float16"),
    "q3bf16": QuantSpec("int3", 40, True, "u32", "bfloat16"),
    # u16 storage (the reference's --quantization-storage-nbit 16 int3
    # builds, e.g. iOS vicuna q3f16: 5 codes per u16, 15 bits, no field
    # straddling a halfword) — the TPU fast-path storage for int3: the
    # gp3 kernel merges u16 sublane pairs to u32 and bit-assembles exact
    # bf16 code values
    "q3f16_s16": QuantSpec("int3", 40, True, "u16", "float16"),
    "q3bf16_s16": QuantSpec("int3", 40, True, "u16", "bfloat16"),
    "fp4f16": QuantSpec("fp4", 32, True, "u32", "float16"),
    "fp4bf16": QuantSpec("fp4", 32, True, "u32", "bfloat16"),
    "q8f16": QuantSpec("int8", 32, True, "i8", "float16"),
    "q8bf16": QuantSpec("int8", 32, True, "i8", "bfloat16"),
    "f16": QuantSpec("none", 0, True, "raw", "float16"),
    "bf16": QuantSpec("none", 0, True, "raw", "bfloat16"),
    "f32": QuantSpec("none", 0, True, "raw", "float32"),
}


def resolve_spec(spec) -> QuantSpec:
    if isinstance(spec, QuantSpec):
        return spec
    if isinstance(spec, str):
        try:
            return QUANT_PRESETS[spec]
        except KeyError:
            raise ValueError(
                f"unknown quantization preset {spec!r}; "
                f"known: {sorted(QUANT_PRESETS)}"
            ) from None
    raise TypeError(f"cannot resolve quantization spec from {type(spec)}")


def spec_for_k(spec: QuantSpec, k: int) -> QuantSpec:
    """Per-tensor layout resolution: downgrade split layouts when the
    (group-padded) k cannot split into equal group-aligned parts —
    hsplit pairs element q with K/2+q inside one byte (needs an even
    group count); qsplit spreads a word over four quarters (needs a
    group count divisible by 4, falling back to hsplit then pair).
    Loaders call this per weight so one odd shape never blocks a whole
    model build; quantize() itself still raises on an explicit invalid
    request."""
    if spec.is_quantized and spec.layout in ("hsplit", "qsplit"):
        k_pad = -(-k // spec.group_size) * spec.group_size
        g = k_pad // spec.group_size
        if spec.layout == "qsplit" and g % 4 != 0:
            return dataclasses.replace(
                spec, layout="hsplit" if g % 2 == 0 else "pair")
        if spec.layout == "hsplit" and g % 2 != 0:
            return dataclasses.replace(spec, layout="pair")
    return spec
