"""Pallas kernel vs jnp-reference parity (interpret mode on CPU).

Idiom 2 of SURVEY.md §4 (per-kernel differential testing), with the
jnp dequant path as the comparison backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlc_llm_tpu.ops.pallas.dequant_matmul import (
    dequant_matmul,
    dequant_matmul_supported,
)
from mlc_llm_tpu.quant import dequantize, quantize, resolve_spec


def _mk(k, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((k, n)) * 0.05).astype(np.float32)


@pytest.mark.parametrize(
    "preset,m",
    [
        ("q4bf16", 1),        # decode gemv
        ("q4bf16", 24),       # small prefill with m padding
        ("q4bf16", 64),
        ("q4bf16_sym", 8),
        ("q4f32", 4),
        ("q3bf16", 8),        # int3, group 40, u32
        ("q3bf16_s16", 1),    # int3, u16 storage -> gp3 bit-assembly path
        ("q3bf16_s16", 2),
        ("q3bf16_s16", 8),    # m>2 -> generic path
        ("q3f16_s16", 1),
        ("fp4bf16", 8),
        ("q8bf16", 8),
        ("q4f16", 8),
    ],
)
def test_dequant_matmul_matches_jnp(preset, m):
    spec = resolve_spec(preset)
    # u16 int3 needs n_groups % 16 == 0 to engage the gp3 kernel
    k = 256 if spec.group_size != 40 else (640 if spec.storage == "u16" else 240)
    n = 384
    w = _mk(k, n)
    qt = quantize(w, spec)
    assert dequant_matmul_supported(qt)

    dtype = jnp.dtype(spec.dtype)
    x = jnp.asarray(_mk(m, k, seed=7) * 2.0, dtype=dtype)
    got = dequant_matmul(x, qt)

    wd = dequantize(qt, dtype)
    want = jnp.matmul(x, wd, preferred_element_type=jnp.float32).astype(dtype)

    gotf = np.asarray(got, np.float32)
    wantf = np.asarray(want, np.float32)
    # same math, different accumulation order -> tight-ish tolerance
    atol = 5e-2 if dtype != jnp.float32 else 1e-4
    np.testing.assert_allclose(gotf, wantf, atol=atol, rtol=5e-2)


def test_lane_padded_columns():
    # n=300 pads to 384 internally; output must be exactly [m, 300]
    spec = resolve_spec("q4bf16")
    w = _mk(128, 300)
    qt = quantize(w, spec)
    assert qt.data.shape[1] == 384
    x = jnp.asarray(_mk(4, 128, seed=9), jnp.bfloat16)
    got = dequant_matmul(x, qt)
    assert got.shape == (4, 300)
    want = jnp.matmul(x, dequantize(qt, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_k_padding_non_divisible():
    # int3 with k=100 -> stored k 120; x padded inside
    spec = resolve_spec("q3bf16")
    w = _mk(100, 128)
    qt = quantize(w, spec)
    x = jnp.asarray(_mk(2, 100, seed=3), jnp.bfloat16)
    got = dequant_matmul(x, qt)
    want = jnp.matmul(x, dequantize(qt, jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_qmatmul_routes_to_pallas():
    from mlc_llm_tpu.ops import qmatmul, use_kernels

    spec = resolve_spec("q4bf16")
    w = _mk(256, 256)
    qt = quantize(w, spec)
    x = jnp.asarray(_mk(3, 256, seed=1), jnp.bfloat16)
    with use_kernels("pallas"):
        got = qmatmul(x, qt)
    with use_kernels("jnp"):
        want = qmatmul(x, qt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_3d_batch_input():
    spec = resolve_spec("q4bf16")
    qt = quantize(_mk(128, 256), spec)
    x = jnp.asarray(_mk(6, 128, seed=2).reshape(2, 3, 128), jnp.bfloat16)
    got = dequant_matmul(x, qt)
    assert got.shape == (2, 3, 256)


@pytest.mark.parametrize(
    "preset,m",
    [
        ("q4bf16", 2),   # pairs/gp path
        ("q4bf16", 16),  # pairs path (m > gp bound)
        ("q3bf16", 1),   # generic stacked: int3 group 40
        ("q3bf16", 8),
        ("q3bf16_s16", 1),  # gp3 stacked (u16 bit-assembly)
        ("q3bf16_s16", 4),  # generic stacked u16
        ("fp4bf16", 2),  # generic stacked: fp4
        ("q8bf16", 2),   # generic stacked: i8
        ("q4f16", 1),
    ],
)
def test_stacked_kernel_matches_per_layer(preset, m):
    """Stacked-weights kernels (scalar-prefetch layer indexing) must
    match slicing the layer then running the plain kernel — for EVERY
    supported format, not just int4/u32 (round-1 VERDICT gap)."""
    import jax

    from mlc_llm_tpu.ops.matmul import qmatmul, qmatmul_stacked
    from mlc_llm_tpu.ops import use_kernels
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor

    spec = resolve_spec(preset)
    L, n = 3, 384
    k = 256 if spec.group_size != 40 else (640 if spec.storage == "u16" else 240)
    qts = [quantize(_mk(k, n, seed=10 + i), spec) for i in range(L)]
    stacked = QuantizedTensor(
        data=jnp.stack([q.data for q in qts]),
        scale=jnp.stack([q.scale for q in qts]),
        zero=None if qts[0].zero is None else jnp.stack([q.zero for q in qts]),
        spec=spec,
        shape=(k, n),
    )
    x = jnp.asarray(_mk(m, k, seed=42), jnp.dtype(spec.dtype))
    for l in range(L):
        with use_kernels("pallas"):
            got = qmatmul_stacked(x, stacked, jnp.int32(l))
        with use_kernels("jnp"):
            want = qmatmul(x, qts[l])
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_stacked_prefill_multi_mtile_matches():
    """m > 256 routes to the prefill-mode pairs kernel (m-innermost
    grid, weights dequantized once into scratch); must match the jnp
    path across every m-tile, including the padded tail."""
    from mlc_llm_tpu.ops.matmul import qmatmul_stacked
    from mlc_llm_tpu.ops import use_kernels
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor

    spec = resolve_spec("q4bf16")
    L, k, n, m = 2, 256, 384, 520  # m_pad 768 -> 3 tiles of 256, padded tail
    qts = [quantize(_mk(k, n, seed=20 + i), spec) for i in range(L)]
    stacked = QuantizedTensor(
        data=jnp.stack([q.data for q in qts]),
        scale=jnp.stack([q.scale for q in qts]),
        zero=jnp.stack([q.zero for q in qts]),
        spec=spec, shape=(k, n),
    )
    x = jnp.asarray(_mk(m, k, seed=5), jnp.bfloat16)
    for l in range(L):
        with use_kernels("pallas"):
            got = qmatmul_stacked(x, stacked, jnp.int32(l))
        wd = dequantize(qts[l], jnp.bfloat16)
        want = jnp.matmul(x, wd, preferred_element_type=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_stacked_prefill_m2048_matches():
    """ctx-2048-class prefill m: the auto-route gate now reaches
    m=2048 (round-2 verdict #3, the TTFT cliff above m=1024); the
    kernel's m-tiling must stay exact over 8 full m-tiles."""
    from mlc_llm_tpu.ops import use_kernels
    from mlc_llm_tpu.ops.matmul import qmatmul_stacked
    from mlc_llm_tpu.quant.groupwise import QuantizedTensor

    spec = resolve_spec("q4bf16")
    L, k, n, m = 1, 256, 256, 2048
    qts = [quantize(_mk(k, n, seed=31), spec)]
    stacked = QuantizedTensor(
        data=jnp.stack([q.data for q in qts]),
        scale=jnp.stack([q.scale for q in qts]),
        zero=jnp.stack([q.zero for q in qts]),
        spec=spec, shape=(k, n),
    )
    x = jnp.asarray(_mk(m, k, seed=6), jnp.bfloat16)
    with use_kernels("pallas"):
        got = qmatmul_stacked(x, stacked, jnp.int32(0))
    wd = dequantize(qts[0], jnp.bfloat16)
    want = jnp.matmul(x, wd, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_prefill_kernel_max_m_gate(monkeypatch):
    """Auto mode must route m=2048 to the fused kernels (and fall back
    above the bound) — the routing predicate, tested without a TPU."""
    import jax as _jax

    from mlc_llm_tpu.ops import matmul as mm

    assert mm.prefill_kernel_max_m() == 2048
    monkeypatch.setenv("MLC_PREFILL_KERNEL_MAX_M", "1024")
    assert mm.prefill_kernel_max_m() == 1024
    monkeypatch.delenv("MLC_PREFILL_KERNEL_MAX_M")

    # spy: with a TPU-looking backend and auto mode, m=2048 uses the
    # kernel path and m=4096 does not
    calls = []
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        mm, "_supported_by_pallas", lambda w: True
    )
    import mlc_llm_tpu.ops.pallas as pallas_pkg

    def fake_kernel(x, w, out_dtype=None):
        calls.append(x.shape)
        return jnp.zeros(x.shape[:-1] + (w.shape[1],), jnp.bfloat16)

    monkeypatch.setattr(pallas_pkg, "dequant_matmul", fake_kernel)
    qt = quantize(_mk(256, 256), resolve_spec("q4bf16"))
    mm.qmatmul(jnp.zeros((2048, 256), jnp.bfloat16), qt)
    assert calls and calls[-1] == (2048, 256)
    n_before = len(calls)
    mm.qmatmul(jnp.zeros((4096, 256), jnp.bfloat16), qt)
    assert len(calls) == n_before  # above the bound: XLA path


@pytest.mark.parametrize("m", [1, 4])
def test_gp_kernel_k_steps_matches(m, tmp_path, monkeypatch):
    """The gp kernel with k_steps > 1 (bkw = kw/2) must stay exact —
    round 3 sweeps k-stepping for the short-n shapes (verdict #2a), so
    correctness at k_steps>1 has to be pinned before a sweep can ever
    pick it."""
    import importlib
    import json

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")

    spec = resolve_spec("q4bf16")
    k, n = 1024, 256   # kw=128, G=32; bkw=64 -> k_steps=2, Gt=16
    qt = quantize(_mk(k, n, seed=40), spec)
    kw, n_stored = qt.data.shape
    table = tmp_path / "tuned_blocks.json"
    table.write_text(json.dumps({
        f"gp:{m}:{kw}:{n_stored}": {"blocks": [kw // 2, 128],
                                    "gbps": 0.0, "validated": True,
                                    "runner_up": None},
    }))
    monkeypatch.setenv("MLC_TUNED_BLOCKS", str(table))
    orig = dm._TUNED
    dm._TUNED = None
    try:
        assert dm._gp_blocks(m, kw, n_stored) == (kw // 2, 128)
        x = jnp.asarray(_mk(m, k, seed=7), jnp.bfloat16)
        got = dm.dequant_matmul(x, qt)
        want = jnp.matmul(x, dequantize(qt, jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2, rtol=5e-2,
        )
    finally:
        dm._TUNED = orig


def test_hsplit_kernels_match_jnp_all_paths():
    """Half-split packing (q4bf16_hs) through every int4/u32 kernel
    path — gp flat/stacked (m<=8) and pairs flat/stacked (prefill m) —
    must match the jnp dequantize-then-matmul reference. The hs pairs
    kernel uses the affine w=q*s+z form (2 MXU dots), so at prefill m
    it is bit-exact vs the reference."""
    import numpy as np

    from mlc_llm_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul,
        dequant_matmul_stacked,
    )
    from mlc_llm_tpu.quant import dequantize, quantize
    from mlc_llm_tpu.quant.groupwise import (
        QuantizedTensor,
        pad_quantized_groups,
    )

    rng = np.random.default_rng(1)
    k, n = 512, 384
    qts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0),
        *[pad_quantized_groups(quantize(
            (rng.standard_normal((k, n)) * 0.05).astype(np.float32),
            "q4bf16_hs")) for _ in range(3)],
    )
    qt = QuantizedTensor(data=qts.data[1], scale=qts.scale[1],
                         zero=qts.zero[1], spec=qts.spec, shape=qts.shape)
    ref_w = dequantize(qt, "bfloat16")
    for m in (1, 2, 16):
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        yr = jnp.matmul(x, ref_w, preferred_element_type=jnp.float32)
        for y in (dequant_matmul(x, qt),
                  dequant_matmul_stacked(x, qts, jnp.int32(1))):
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(yr, np.float32),
                atol=1e-2, rtol=1e-2)


def test_hsplit_gp_k_steps_matches(tmp_path, monkeypatch):
    """hsplit gp with k_steps > 1 (round 4: per-tile scale half-blocks
    + sectioned band scratch) must stay exact — this is the path that
    lifts w_out under the hsplit layout."""
    import importlib
    import json

    import numpy as np

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
    from mlc_llm_tpu.quant import dequantize, quantize
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups

    k, n = 2048, 256  # kw=256, G=64; bkw=128 -> k_steps=2, Gt=32 (even)
    rng = np.random.default_rng(11)
    qt = pad_quantized_groups(quantize(
        (rng.standard_normal((k, n)) * 0.05).astype(np.float32),
        "q4bf16_hs"))
    kw, n_stored = qt.data.shape
    table = tmp_path / "tuned_blocks.json"
    table.write_text(json.dumps({
        f"gph:1:{kw}:{n_stored}": [kw // 2, 128],
        f"gph:2:{kw}:{n_stored}": [kw // 2, 128],
    }))
    monkeypatch.setenv("MLC_TUNED_BLOCKS", str(table))
    orig = dm._TUNED
    dm._TUNED = None
    try:
        assert dm._gp_blocks(1, kw, n_stored, layout="hsplit") == (kw // 2, 128)
        ref_w = dequantize(qt, "bfloat16")
        for m in (1, 2):
            x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
            yr = jnp.matmul(x, ref_w, preferred_element_type=jnp.float32)
            y = dm.dequant_matmul(x, qt)
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(yr, np.float32),
                atol=1e-2, rtol=1e-2)
    finally:
        dm._TUNED = orig


def test_hsplit_unpadded_group_count_falls_back():
    """hsplit with a group count whose half is not 8-divisible (e.g.
    K=11008 -> 344 groups, the raw 7B w_out) cannot satisfy Mosaic's
    scale-block rule; the dispatch must route to the exact jnp fallback
    instead of crashing in lowering (round-4 on-chip regression)."""
    import numpy as np

    from mlc_llm_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul,
        dequant_matmul_stacked,
        hs_groups_blockable,
    )
    from mlc_llm_tpu.quant import dequantize, quantize

    assert not hs_groups_blockable(344)
    assert hs_groups_blockable(352)
    rng = np.random.default_rng(9)
    k, n = 344 * 32 // 8, 256  # 43 groups (odd) -> quantize rejects;
    # use 44 groups: half = 22, not 8-divisible -> kernel unblockable
    k = 44 * 32
    qt = quantize((rng.standard_normal((k, n)) * 0.05).astype(np.float32),
                  "q4bf16_hs")  # NO pad_quantized_groups on purpose
    ref = dequantize(qt, "bfloat16")
    qts = jax.tree_util.tree_map(lambda a: jnp.stack([a, a], 0),
                                 qt, is_leaf=lambda a: hasattr(a, "dtype"))
    for m in (1, 16):
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        yr = jnp.matmul(x, ref, preferred_element_type=jnp.float32)
        for y in (dequant_matmul(x, qt),
                  dequant_matmul_stacked(x, qts, jnp.int32(1))):
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(yr, np.float32),
                atol=1e-2, rtol=1e-2)


def test_hsplit_f16_compute_matches_jnp():
    """q4f16_hs (float16 compute, half-split layout — the round-4
    default, now the pinned alias): the gp raw-activation path must
    stay exact without the bf16-only raw_x bitcast (hsplit takes the
    raw [M, K] activation in ANY compute dtype). The q4f16 default is
    quarter-split since round 5 (covered by the qsplit f16 test)."""
    import numpy as np

    from mlc_llm_tpu.ops.pallas.dequant_matmul import dequant_matmul
    from mlc_llm_tpu.quant import dequantize, quantize, resolve_spec
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups

    assert resolve_spec("q4f16").layout == "qsplit"
    assert resolve_spec("q4f16_hs").layout == "hsplit"
    rng = np.random.default_rng(2)
    qt = pad_quantized_groups(quantize(
        (rng.standard_normal((512, 384)) * 0.05).astype(np.float32),
        "q4f16_hs"))
    ref = dequantize(qt, "float16")
    for m in (1, 2, 16):
        x = jnp.asarray(rng.standard_normal((m, 512)) * 0.1, jnp.float16)
        yr = jnp.matmul(x, ref, preferred_element_type=jnp.float32)
        y = dequant_matmul(x, qt)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(yr, np.float32),
            atol=1e-2, rtol=1e-2)


def test_qsplit_kernels_match_jnp_all_paths():
    """Quarter-split packing (q4bf16_qs, round 5: cast-free bit-
    assembled bf16 planes) through every int4/u32 kernel path — gp
    flat/stacked (m<=8) and pairs flat/stacked (prefill m) — must
    match the jnp dequantize-then-matmul reference."""
    import numpy as np

    from mlc_llm_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul,
        dequant_matmul_stacked,
    )
    from mlc_llm_tpu.quant import dequantize, quantize
    from mlc_llm_tpu.quant.groupwise import (
        QuantizedTensor,
        pad_quantized_groups,
    )

    rng = np.random.default_rng(1)
    k, n = 1024, 384
    qts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0),
        *[pad_quantized_groups(quantize(
            (rng.standard_normal((k, n)) * 0.05).astype(np.float32),
            "q4bf16_qs")) for _ in range(3)],
    )
    qt = QuantizedTensor(data=qts.data[1], scale=qts.scale[1],
                         zero=qts.zero[1], spec=qts.spec, shape=qts.shape)
    ref_w = dequantize(qt, "bfloat16")
    for m in (1, 2, 8, 16):
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        yr = jnp.matmul(x, ref_w, preferred_element_type=jnp.float32)
        for y in (dequant_matmul(x, qt),
                  dequant_matmul_stacked(x, qts, jnp.int32(1))):
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(yr, np.float32),
                atol=1e-2, rtol=1e-2)


def test_qsplit_gp_k_steps_matches(tmp_path, monkeypatch):
    """qsplit gp with k_steps > 1 (per-tile scale QUARTER-blocks +
    sectioned band scratch) must stay exact; also pins the gpq: tuned
    namespace and the full-k fallback when the per-field quarter
    blocks cannot satisfy Mosaic's 8-sublane rule."""
    import importlib
    import json

    import numpy as np

    dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
    from mlc_llm_tpu.quant import dequantize, quantize
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups

    k, n = 8192, 256  # kw=1024, G=256; bkw=512 -> k_steps=2, Gt/4=32
    rng = np.random.default_rng(11)
    qt = pad_quantized_groups(quantize(
        (rng.standard_normal((k, n)) * 0.05).astype(np.float32),
        "q4bf16_qs"))
    kw, n_stored = qt.data.shape
    table = tmp_path / "tuned_blocks.json"
    table.write_text(json.dumps({
        f"gpq:1:{kw}:{n_stored}": [kw // 2, 128],
        f"gpq:2:{kw}:{n_stored}": [kw // 2, 128],
    }))
    monkeypatch.setenv("MLC_TUNED_BLOCKS", str(table))
    orig = dm._TUNED
    dm._TUNED = None
    try:
        assert dm._gp_blocks(1, kw, n_stored, layout="qsplit") == (
            kw // 2, 128)
        ref_w = dequantize(qt, "bfloat16")
        for m in (1, 2):
            x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
            yr = jnp.matmul(x, ref_w, preferred_element_type=jnp.float32)
            y = dm.dequant_matmul(x, qt)
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(yr, np.float32),
                atol=1e-2, rtol=1e-2)
    finally:
        dm._TUNED = orig


def test_qsplit_unpadded_group_count_falls_back():
    """qsplit with a group count whose quarter is not 8-divisible
    (e.g. 44 groups) cannot satisfy Mosaic's scale-block rule; the
    dispatch must route to the exact jnp fallback instead of crashing
    in lowering."""
    import numpy as np

    from mlc_llm_tpu.ops.pallas.dequant_matmul import (
        dequant_matmul,
        dequant_matmul_stacked,
        qs_groups_blockable,
    )
    from mlc_llm_tpu.quant import dequantize, quantize

    assert not qs_groups_blockable(344)  # 86 quarters, not 8-divisible
    assert not qs_groups_blockable(44)
    assert qs_groups_blockable(352)
    rng = np.random.default_rng(9)
    k, n = 44 * 32, 256
    qt = quantize((rng.standard_normal((k, n)) * 0.05).astype(np.float32),
                  "q4bf16_qs")  # NO pad_quantized_groups on purpose
    ref = dequantize(qt, "bfloat16")
    qts = jax.tree_util.tree_map(lambda a: jnp.stack([a, a], 0),
                                 qt, is_leaf=lambda a: hasattr(a, "dtype"))
    for m in (1, 16):
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        yr = jnp.matmul(x, ref, preferred_element_type=jnp.float32)
        for y in (dequant_matmul(x, qt),
                  dequant_matmul_stacked(x, qts, jnp.int32(1))):
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(yr, np.float32),
                atol=1e-2, rtol=1e-2)


def test_qsplit_f16_compute_matches_jnp():
    """q4f16_qs (float16 compute): the bit-assembled bf16 planes cast
    to the compute dtype exactly (values 16..31 are exact in f16), so
    the qsplit paths must stay within the usual kernel tolerance in
    f16 as well."""
    import numpy as np

    from mlc_llm_tpu.ops.pallas.dequant_matmul import dequant_matmul
    from mlc_llm_tpu.quant import dequantize, quantize, resolve_spec
    from mlc_llm_tpu.quant.groupwise import pad_quantized_groups

    assert resolve_spec("q4f16_qs").layout == "qsplit"
    rng = np.random.default_rng(2)
    qt = pad_quantized_groups(quantize(
        (rng.standard_normal((512, 384)) * 0.05).astype(np.float32),
        "q4f16_qs"))
    ref = dequantize(qt, "float16")
    for m in (1, 2, 16):
        x = jnp.asarray(rng.standard_normal((m, 512)) * 0.1, jnp.float16)
        yr = jnp.matmul(x, ref, preferred_element_type=jnp.float32)
        y = dequant_matmul(x, qt)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(yr, np.float32),
            atol=2e-2, rtol=2e-2)
