"""Quantization round-trip + format tests.

Mirrors the smallest-testable-unit strategy of SURVEY.md §7.2 step 1;
the error bounds follow from the formats themselves (the reference only
ever asserts kernel-level atol 1e-2 / rtol 1e-3,
/root/reference/tests/debug/compare_lib.py:26-27).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mlc_llm_tpu.quant import (
    QUANT_PRESETS,
    QuantSpec,
    dequantize,
    quantize,
    resolve_spec,
    take_dequantize,
)


def _rand(k, n, seed=0, scale=0.02):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((k, n)) * scale).astype(np.float32)


QUANT_NAMES = [name for name, s in QUANT_PRESETS.items() if s.is_quantized]


@pytest.mark.parametrize("name", QUANT_NAMES)
def test_round_trip_error_bound(name):
    spec = resolve_spec(name)
    w = _rand(256 if spec.group_size != 40 else 240, 64)
    qt = quantize(w, spec)
    back = np.asarray(dequantize(qt, jnp.float32))
    assert back.shape == w.shape
    # quantization step bound: |w - dq| <= scale/2 (+ dtype rounding slop)
    gs = spec.group_size
    ngroups = w.shape[0] // gs
    wg = w.reshape(ngroups, gs, -1)
    if spec.mode == "fp4":
        # e3m0: relative spacing is a factor of 2 -> |err| <= absmax/2 crude
        absmax = np.abs(wg).max(axis=1, keepdims=True)
        bound = np.broadcast_to(absmax, wg.shape).reshape(w.shape) * 0.5 + 1e-6
    else:
        if spec.sym:
            step = np.maximum(np.abs(wg).max(axis=1, keepdims=True), 1e-4) / spec.max_int
        else:
            step = (wg.max(axis=1, keepdims=True) - wg.min(axis=1, keepdims=True)) / (
                2**spec.nbit - 1
            )
        bound = np.broadcast_to(step, wg.shape).reshape(w.shape) * 0.51 + 2e-4
    assert np.all(np.abs(w - back) <= bound), np.abs(w - back).max()


def test_int4_asym_exact_codes():
    # values that land exactly on the grid must round-trip exactly
    spec = QuantSpec("int4", 32, False, "u4", "float32")
    w = np.tile(np.arange(16, dtype=np.float32), 2)[:, None] * np.ones((1, 4), np.float32)
    qt = quantize(w, spec)
    back = np.asarray(dequantize(qt))
    np.testing.assert_allclose(back, w, atol=1e-5)


def test_int3_padding_non_divisible_k():
    # k=100 is not a multiple of group 40 -> padded to 120 internally
    spec = resolve_spec("q3f16")
    w = _rand(100, 32)
    qt = quantize(w, spec)
    back = np.asarray(dequantize(qt, jnp.float32))
    assert back.shape == (100, 32)
    err = np.abs(w - back)
    assert err.max() < 0.02  # 3-bit on 0.02-std data


def test_sym_matches_reference_offset_representation():
    # sym int4: code = round(w/scale) + 7 in [0, 14]
    spec = QuantSpec("int4", 32, True, "u4", "float32")
    w = np.linspace(-1, 1, 32, dtype=np.float32)[:, None] * np.ones((1, 8), np.float32)
    qt = quantize(w, spec)
    codes = np.asarray(qt.data.astype(jnp.int32))
    assert codes.min() >= 0 and codes.max() <= 14


def test_fp4_code_values():
    # fp4 decodes to ±2^(e-7)·scale; scale = absmax so max magnitude
    # round-trips exactly, as do exact powers of two below it
    spec = QuantSpec("fp4", 32, True, "u4", "float32")
    col = np.zeros((32,), np.float32)
    col[:8] = [1.0, 0.5, 0.25, -1.0, -0.5, 0.0, 0.125, -0.25]
    w = np.tile(col[:, None], (1, 4))
    qt = quantize(w, spec)
    back = np.asarray(dequantize(qt))
    np.testing.assert_allclose(back[:8, 0], col[:8], atol=1e-6)


def test_take_dequantize_matches_full_decode():
    # k=64 -> 2 groups: the qsplit default can't split into quarters,
    # so resolve the per-shape layout the way the loaders do
    from mlc_llm_tpu.quant.spec import spec_for_k

    vocab, hidden = 96, 64
    spec = spec_for_k(resolve_spec("q4bf16"), hidden)
    emb = _rand(hidden, vocab, seed=3)  # stored transposed [hidden, vocab]
    qt = quantize(emb, spec)
    ids = jnp.array([[0, 5, 95], [7, 7, 1]], dtype=jnp.int32)
    got = np.asarray(take_dequantize(qt, ids, jnp.float32))
    full = np.asarray(dequantize(qt, jnp.float32))  # [hidden, vocab]
    want = full.T[np.asarray(ids)]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quantized_nbytes_accounting():
    spec = resolve_spec("q4bf16")
    qt = quantize(_rand(128, 256), spec)
    # 128*256 nibbles = 16384 B data + scales/zeros 2*(4*256)*2 B
    assert qt.nbytes() == 128 * 256 // 2 + 2 * 4 * 256 * 2


def test_spec_validation():
    with pytest.raises(ValueError):
        QuantSpec("int3", 40, False, "u32")
    with pytest.raises(ValueError):
        QuantSpec("int4", 32, False, "i8")
    with pytest.raises(ValueError):
        resolve_spec("nope")


def test_hsplit_layout_decodes_identically():
    """q4bf16_hs (half-split word packing) must decode to EXACTLY the
    same dense weights as the pair layout — only the element->nibble
    slot assignment differs. Covers the group-padding repack too (the
    hsplit mapping is global in k, so padding must unpack/repack)."""
    import numpy as np

    from mlc_llm_tpu.quant import dequantize, quantize
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((512, 384)) * 0.05).astype(np.float32)
    qp = quantize(w, "q4bf16")
    qh = quantize(w, "q4bf16_hs")
    assert qh.spec.layout == "hsplit"
    assert np.array_equal(np.asarray(qp.scale), np.asarray(qh.scale))
    assert np.array_equal(
        np.asarray(dequantize(qp, "float32")),
        np.asarray(dequantize(qh, "float32")),
    )
    # padded repack: decode must still match (and match the unpadded)
    qpp, qhp = pad_quantized_groups(qp), pad_quantized_groups(qh)
    assert qhp.data.shape == qpp.data.shape
    assert np.array_equal(
        np.asarray(dequantize(qpp, "float32")),
        np.asarray(dequantize(qhp, "float32")),
    )


def test_hsplit_rejects_odd_group_count():
    """hsplit pairs element q with K/2+q, so an odd group count (e.g.
    K=96 -> 3 groups of 32) has no valid half-split; quantize must
    raise a CLEAR error instead of an opaque broadcast failure deep in
    the Pallas kernel (round-3 advisor finding)."""
    import numpy as np
    import pytest

    from mlc_llm_tpu.quant import quantize

    w = np.zeros((96, 128), np.float32)
    with pytest.raises(ValueError, match="divisible by 2"):
        quantize(w, "q4bf16_hs")
    # even group count is fine
    quantize(np.zeros((128, 128), np.float32), "q4bf16_hs")


def test_hsplit_checkpoint_spec_backcompat(tmp_path):
    """Manifests written before QuantSpec.layout existed must load as
    pair-packed (utils/checkpoint.py defaults the missing field)."""
    import dataclasses
    import json

    import numpy as np

    from mlc_llm_tpu.quant import quantize
    from mlc_llm_tpu.utils.checkpoint import load_params, save_params

    # k=128 -> 4 groups (the qsplit default needs a 4-divisible count)
    w = (np.random.default_rng(0).standard_normal((128, 128)) * 0.05
         ).astype(np.float32)
    qt = quantize(w, "q4bf16")
    save_params({"w": qt}, str(tmp_path), meta={})
    man = json.loads((tmp_path / "manifest.json").read_text())
    # simulate a pre-layout manifest
    for info in man["quantized"].values():
        info["spec"].pop("layout", None)
    (tmp_path / "manifest.json").write_text(json.dumps(man))
    tree, _ = load_params(str(tmp_path))
    assert tree["w"].spec.layout == "pair"
    assert dataclasses.asdict(tree["w"].spec)["layout"] == "pair"


def test_qsplit_layout_decodes_identically():
    """q4bf16_qs (quarter-split word packing, round 5) must decode to
    EXACTLY the same dense weights as the pair and hsplit layouts —
    only the element->nibble slot assignment differs. Covers the
    group-padding repack (the qsplit mapping is global in k) and the
    to-pair sharding repack."""
    import numpy as np

    from mlc_llm_tpu.quant import dequantize, quantize
    from mlc_llm_tpu.quant.groupwise import (
        pad_quantized_groups,
        to_pair_layout,
    )

    rng = np.random.default_rng(0)
    w = (rng.standard_normal((512, 384)) * 0.05).astype(np.float32)
    qp = quantize(w, "q4bf16_pair")
    qq = quantize(w, "q4bf16_qs")
    assert qq.spec.layout == "qsplit"
    assert np.array_equal(np.asarray(qp.scale), np.asarray(qq.scale))
    assert np.array_equal(
        np.asarray(dequantize(qp, "float32")),
        np.asarray(dequantize(qq, "float32")),
    )
    # padded repack: decode must still match
    qpp, qqp = pad_quantized_groups(qp), pad_quantized_groups(qq)
    assert qqp.data.shape == qpp.data.shape
    assert np.array_equal(
        np.asarray(dequantize(qpp, "float32")),
        np.asarray(dequantize(qqp, "float32")),
    )
    # sharding repack to pair order is exact
    pr = to_pair_layout(qq)
    assert pr.spec.layout == "pair"
    assert np.array_equal(np.asarray(pr.data), np.asarray(qp.data))


def test_qsplit_rejects_bad_group_count_and_downgrades():
    """qsplit spreads each word over four quarters, so the group count
    must divide by 4; quantize raises clearly, and spec_for_k
    downgrades per tensor along qsplit -> hsplit -> pair."""
    import numpy as np
    import pytest

    from mlc_llm_tpu.quant import quantize, resolve_spec
    from mlc_llm_tpu.quant.spec import spec_for_k

    qs = resolve_spec("q4bf16_qs")
    with pytest.raises(ValueError, match="divisible by 4"):
        quantize(np.zeros((64, 128), np.float32), qs)  # 2 groups
    quantize(np.zeros((128, 128), np.float32), qs)  # 4 groups: fine
    assert spec_for_k(qs, 128).layout == "qsplit"
    assert spec_for_k(qs, 64).layout == "hsplit"   # 2 groups
    assert spec_for_k(qs, 96).layout == "pair"     # 3 groups
