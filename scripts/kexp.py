"""Kernel-variant experiments for the fused dequant-gemv (round 2).

NOTE: this file is a deliberate FAILED-EXPERIMENT ARCHIVE, kept so the
losing designs (w4a8, bits16, supertile, per-tile re-banding) are not
blindly retried; docs/PERF.md records the lessons. Nothing here is on
any production path. For current measurement tools use
mlc_llm_tpu.tune (block sweeps), scripts/ceiling.py (per-shape
streaming ceilings), and scripts/profile_decode.py (step profiles).

Round-1 kernel (i8 nibble-pair, ops/pallas/dequant_matmul.py) measures
~476 GB/s on the 45 MB w_in shape vs ~770 GB/s chip capability. Its
per-element VPU work is ~2.4 ops (nibble isolate 0.375 + i8->bf16 cast
+ bf16 scale-mul). This script measures, in ONE process (the chip
time-shares; see docs/PERF.md):

  dma      pure-DMA ceiling probe at several block shapes
  dmasup   same with a contiguous "supertile" weight layout
  pairs    the production kernel (baseline re-measure)
  pairsup  production math on the supertile layout
  gp16     group-partial kernel: planes cast to bf16 UNSCALED, dotted
           against block-diagonal activation chunks on the MXU; group
           scales applied to [Cg, BN] partials (kills the per-element
           scale-mul; exact weight-only math)
  w4a8     group-partial with int8 activations on the int8 MXU (kills
           cast AND mul; activation quantization error ~1e-2 rel)
  bits16   nibbles -> bf16 by integer bit assembly (value 256+q, the
           256 folded into the offset term; kills the cast, keeps exact
           math; ~1.5 u32 ops/elem)

Timing: on-device fori_loop, long-minus-short (BLOCKING readback only;
block_until_ready does not wait over the tunnel).

Usage:  python scripts/kexp.py --exp dma,pairs,gp16 --shape 4096x22016
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mlc_llm_tpu  # noqa: F401,E402  (enables persistent compile cache)
from mlc_llm_tpu.quant import quantize, resolve_spec
from mlc_llm_tpu.quant.groupwise import dequantize


# ---------------------------------------------------------------- timing

def timed(loop_fn, x0, steps=(16, 112)):
    float(jnp.asarray(loop_fn(x0, 2)).reshape(-1)[0])  # warmup/compile
    ts = {}
    for s in steps:
        t0 = time.perf_counter()
        float(jnp.asarray(loop_fn(x0, s)).reshape(-1)[0])
        ts[s] = time.perf_counter() - t0
    return (ts[steps[1]] - ts[steps[0]]) / (steps[1] - steps[0])


def make_loop(step_fn, k):
    """step_fn: x[m,k] -> y[m,n]; wraps into an on-device loop."""

    @jax.jit
    def loop(x, n):
        def body(_, x):
            y = step_fn(x)
            y = y[:, :k] if y.shape[1] >= k else jnp.pad(
                y, ((0, 0), (0, k - y.shape[1])))
            return (y * 1e-3).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, x, unroll=False)

    return loop


def report(name, t, qt, extra=""):
    gbs = qt_bytes(qt) / t / 1e9
    print(f"  {name:28s} {t*1e6:9.1f} us  {gbs:6.0f} GB/s  {extra}",
          flush=True)


def qt_bytes(qt):
    tot = qt.data.size * qt.data.dtype.itemsize
    tot += qt.scale.size * qt.scale.dtype.itemsize
    if qt.zero is not None:
        tot += qt.zero.size * qt.zero.dtype.itemsize
    return tot


# ---------------------------------------------------------------- dma probe

def _dma_kernel(w_ref, x_ref, o_ref, acc_ref, *, k_steps):
    # x (loop-carried, tiny) keeps the call un-hoistable from the timing
    # loop; the weight array itself stays loop-invariant and uncopied.
    kk = pl.program_id(1)

    @pl.when((kk == 0) & (pl.program_id(0) == 0))
    def _():
        acc_ref[:] = x_ref[:]

    half = w_ref.shape[0] // 2
    acc_ref[:] += (w_ref[0:8, 0:128].astype(jnp.int32)
                   + w_ref[half:half + 8, 0:128].astype(jnp.int32))

    @pl.when(kk == k_steps - 1)
    def _():
        o_ref[:] = acc_ref[:]


def dma_probe(qt, bkw, bn, supertile=False):
    data = qt.data
    kw, n = data.shape
    k_steps, n_steps = kw // bkw, n // bn
    if supertile:
        data = (data.reshape(k_steps, bkw, n_steps, bn)
                .transpose(2, 0, 1, 3).reshape(n_steps * k_steps * bkw, bn))
        idx = lambda j, kk: (j * k_steps + kk, 0)
    else:
        idx = lambda j, kk: (kk, j)

    kern = functools.partial(_dma_kernel, k_steps=k_steps)
    run = pl.pallas_call(
        kern,
        grid=(n_steps, k_steps),
        in_specs=[
            pl.BlockSpec((bkw, bn), idx),
            pl.BlockSpec((8, 128), lambda j, kk: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda j, kk: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )

    @jax.jit
    def loop(x, niter):
        def body(i, x):
            o = run(data, x)
            return o & 1

        return jax.lax.fori_loop(0, niter, body, x, unroll=False)

    x0 = jnp.zeros((8, 128), jnp.int32)
    t = timed(loop, x0)
    gbs = data.size * 4 / t / 1e9
    print(f"  dma{'sup' if supertile else '   '} bkw={bkw:5d} bn={bn:5d}"
          f"  {t*1e6:9.1f} us  {gbs:6.0f} GB/s", flush=True)


# ------------------------------------------------------- group-partial kernels

def _row_repeat(a, r):
    g, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, r, n)).reshape(g * r, n)


def _gp_kernel(xdl_ref, xdh_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
               variant, sym, max_int, Cg, cpt, k_steps, M, out_dtype):
    """Group-partial dequant-gemv.

    xdl/xdh_ref: [cpt*Cg*M, 16*Cg] block-diagonal activation chunks
                 (bf16 for gp16/bits16, int8 for w4a8)
    w_ref:       [bkw, BN] packed u32
    s_ref/z_ref: [Gt, BN] scales / minima (z aliased to s when sym)
    acc_ref:     [Cg*M, BN] f32 — partial contributions, summed at end
    """
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    acc = acc_ref[:]
    wpc = 4 * Cg  # u32 words per chunk (32*Cg k-elems)
    rpc = Cg * M  # lhs rows per chunk
    for c in range(cpt):
        wc = w_ref[c * wpc:(c + 1) * wpc, :]
        sc = s_ref[c * Cg:(c + 1) * Cg, :].astype(jnp.float32)
        if M > 1:
            sc = _row_repeat(sc, M)
        xl = xdl_ref[c * rpc:(c + 1) * rpc, :]
        xh = xdh_ref[c * rpc:(c + 1) * rpc, :]
        if variant == "bits16":
            # two bf16 values per u32: bits = 0x4300 | q -> value is
            # exactly 128 + q (ulp at 2^7 is 1, so all 16 codes are
            # exact); the 128 folds into the offset term below.
            # Planes: i -> k = 8r + 4j + i.
            planes = []
            for i in range(4):
                t = (wc >> (4 * i)) & jnp.uint32(0x000F000F) if i else (
                    wc & jnp.uint32(0x000F000F))
                bits = t | jnp.uint32(0x43004300)
                planes.append(pltpu.bitcast(bits, jnp.bfloat16))
            # plane i row layout: 2r+j -> k = 8r+4j+i; x side must match
            # (xdl holds planes 0,1 stacked... see prep). Here xl/xh each
            # carry two planes side by side: [Cg, 2*8*Cg] is NOT the
            # layout; instead planes pair (0,1)->xl, (2,3)->xh with
            # column halves. Simpler: xl covers plane0+plane1 rows
            # interleaved == halfword-major k order. See prep_bits16.
            p01 = jnp.concatenate([planes[0], planes[1]], axis=0)
            p23 = jnp.concatenate([planes[2], planes[3]], axis=0)
            plo = jax.lax.dot_general(xl, p01, dn,
                                      preferred_element_type=jnp.float32)
            phi = jax.lax.dot_general(xh, p23, dn,
                                      preferred_element_type=jnp.float32)
            psum = plo + phi
            sx = (jnp.sum(xl, axis=1, keepdims=True)
                  + jnp.sum(xh, axis=1, keepdims=True)).astype(jnp.float32)
            if sym:
                acc += sc * (psum - (max_int + 128.0) * sx)
            else:
                zc = z_ref[c * Cg:(c + 1) * Cg, :].astype(jnp.float32)
                acc += sc * (psum - 128.0 * sx) + zc * sx
        else:
            lo32 = wc & jnp.uint32(0x0F0F0F0F)
            hi32 = (wc >> 4) & jnp.uint32(0x0F0F0F0F)
            lo8 = pltpu.bitcast(lo32, jnp.int8)
            hi8 = pltpu.bitcast(hi32, jnp.int8)
            if variant == "w4a8":
                plo = jax.lax.dot_general(xl, lo8, dn,
                                          preferred_element_type=jnp.int32)
                phi = jax.lax.dot_general(xh, hi8, dn,
                                          preferred_element_type=jnp.int32)
                psum = (plo + phi).astype(jnp.float32)
                sx = (jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
                      + jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)
                      ).astype(jnp.float32)
            else:  # gp16: cast only, no per-element scale
                plo = jax.lax.dot_general(xl, lo8.astype(jnp.bfloat16), dn,
                                          preferred_element_type=jnp.float32)
                phi = jax.lax.dot_general(xh, hi8.astype(jnp.bfloat16), dn,
                                          preferred_element_type=jnp.float32)
                psum = plo + phi
                sx = (jnp.sum(xl, axis=1, keepdims=True)
                      + jnp.sum(xh, axis=1, keepdims=True)
                      ).astype(jnp.float32)
            if sym:
                acc += sc * (psum - float(max_int) * sx)
            else:
                zc = z_ref[c * Cg:(c + 1) * Cg, :].astype(jnp.float32)
                if M > 1:
                    zc = _row_repeat(zc, M)
                acc += sc * psum + zc * sx
    acc_ref[:] = acc

    @pl.when(kk == k_steps - 1)
    def _():
        a = acc_ref[:]
        out = jnp.sum(a.reshape(Cg, M, a.shape[-1]), axis=0)
        o_ref[:] = out.astype(out_dtype)


def prep_pairs_diag(x, kw, Cg, dtype):
    """x [M, K] -> block-diagonal (xdl, xdh), each [NC*Cg*M, 16*Cg].

    Plane row p = 4r+j <-> k = 8r+2j (lo) / +1 (hi); group g = rows
    [16g, 16g+16); chunk c = Cg consecutive groups. Rows within a chunk
    are (group-slot u, batch m) so [Cg*M, bn] partials reshape to
    [Cg, M, bn]."""
    M = x.shape[0]
    xr = x.reshape(M, kw, 4, 2)
    xlo = xr[..., 0].reshape(M, kw * 4)
    xhi = xr[..., 1].reshape(M, kw * 4)
    nc = (kw * 4) // (16 * Cg)
    eye = jnp.eye(Cg, dtype=jnp.float32)

    def diag(v):
        v5 = v.astype(jnp.float32).reshape(M, nc, Cg, 16)
        v5 = v5.transpose(1, 2, 0, 3)  # [NC, Cg_v, M, 16]
        d = v5[:, None] * eye[None, :, :, None, None]  # [NC, Cg_u, Cg_v, M, 16]
        d = d.transpose(0, 1, 3, 2, 4)  # [NC, Cg_u, M, Cg_v, 16]
        return d.reshape(nc * Cg * M, 16 * Cg).astype(dtype)

    return diag(xlo), diag(xhi)


def prep_bits16_diag(x, kw, Cg):
    """x [1, K] -> (xd01, xd23) matching the bits16 plane concat layout.

    Plane i row 2r+j <-> k = 8r+4j+i. p01 = concat(plane0, plane1) along
    rows: chunk c rhs rows = [plane0 rows 8Cg .. , plane1 rows 8Cg ..]
    concatenated -> lhs cols = [x(plane0 ks), x(plane1 ks)], 16Cg wide.
    """
    xr = x.reshape(kw, 2, 4)  # [r, j, i]
    xp = xr.transpose(2, 0, 1).reshape(4, kw * 2)  # plane i: x[8r+4j+i]
    nc = (kw * 2) // (8 * Cg)
    eye = jnp.eye(Cg, dtype=jnp.float32)

    def diag2(a, b):  # planes a,b -> [NC*Cg, 16Cg]
        va = xp[a].astype(jnp.float32).reshape(nc, Cg, 8)
        vb = xp[b].astype(jnp.float32).reshape(nc, Cg, 8)
        da = va[:, None, :, :] * eye[None, :, :, None]  # [nc,u,v,8]
        db = vb[:, None, :, :] * eye[None, :, :, None]
        da = da.reshape(nc, Cg, Cg * 8)
        db = db.reshape(nc, Cg, Cg * 8)
        return jnp.concatenate([da, db], axis=-1).reshape(nc * Cg, 16 * Cg)

    return (diag2(0, 1).astype(jnp.bfloat16),
            diag2(2, 3).astype(jnp.bfloat16))


def gp_matmul(x, qt, *, variant="gp16", Cg=16, bn=512, bkw=None,
              out_dtype=jnp.bfloat16):
    """Group-partial dequant matmul, x [M, K]. Returns [M, n]."""
    spec = qt.spec
    kw, n = qt.data.shape
    M = x.shape[0]
    G = qt.scale.shape[0]
    assert G % Cg == 0 and spec.group_size == 32
    assert variant != "bits16" or M == 1
    if bkw is None:
        bkw = kw
    k_steps, n_steps = kw // bkw, n // bn
    cpt = (4 * bkw) // (16 * Cg)
    assert cpt * 16 * Cg == 4 * bkw
    K = kw * 8
    if x.shape[1] != K:
        x = jnp.pad(x, ((0, 0), (0, K - x.shape[1])))

    if variant == "w4a8":
        xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1) / 127.0
        xq = x.astype(jnp.float32) / xs[:, None]
        xdl, xdh = prep_pairs_diag(xq, kw, Cg, jnp.float32)
        xdl = jnp.round(jnp.clip(xdl, -127, 127)).astype(jnp.int8)
        xdh = jnp.round(jnp.clip(xdh, -127, 127)).astype(jnp.int8)
    elif variant == "bits16":
        xdl, xdh = prep_bits16_diag(x, kw, Cg)
    else:
        xdl, xdh = prep_pairs_diag(x, kw, Cg, jnp.bfloat16)

    Gt = bkw * 8 // 32  # groups per k tile
    zero = qt.zero if qt.zero is not None else qt.scale
    kern = functools.partial(
        _gp_kernel, variant=variant, sym=spec.sym, max_int=spec.max_int,
        Cg=Cg, cpt=cpt, k_steps=k_steps, M=M, out_dtype=out_dtype)
    y = pl.pallas_call(
        kern,
        grid=(n_steps, k_steps),
        in_specs=[
            pl.BlockSpec((cpt * Cg * M, 16 * Cg), lambda j, kk: (kk, 0)),
            pl.BlockSpec((cpt * Cg * M, 16 * Cg), lambda j, kk: (kk, 0)),
            pl.BlockSpec((bkw, bn), lambda j, kk: (kk, j)),
            pl.BlockSpec((Gt, bn), lambda j, kk: (kk, j)),
            pl.BlockSpec((Gt, bn), lambda j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((Cg * M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xdl, xdh, qt.data, qt.scale, zero)
    if variant == "w4a8":
        y = (y.astype(jnp.float32) * xs[:, None]).astype(out_dtype)
    return y[:, : qt.shape[1]]


# ---------------------------------------------------------------- experiments

def check(step_fn, x, qt, name):
    ref = jnp.matmul(x, dequantize(qt, dtype=jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    got = jnp.asarray(step_fn(x)).astype(jnp.float32)
    ref = jnp.asarray(ref)
    err = float(jnp.max(jnp.abs(got - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"  {name}: max rel err vs dequant-ref = {err:.2e}", flush=True)
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="dma,pairs,gp16,w4a8,bits16")
    ap.add_argument("--shape", default="4096x22016")
    ap.add_argument("--quant", default="q4bf16")
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--cg", default="8,16,32")
    ap.add_argument("--bn", default="512,256,1024")
    args = ap.parse_args()
    want_cg = [int(v) for v in args.cg.split(",")]
    want_bn = [int(v) for v in args.bn.split(",")]

    k, n = (int(v) for v in args.shape.split("x"))
    spec = resolve_spec(args.quant)
    rng = np.random.default_rng(0)
    print(f"quantizing {k}x{n} {args.quant} "
          f"(backend={jax.default_backend()})", flush=True)
    qt = quantize((rng.standard_normal((k, n)) * 0.05).astype(np.float32),
                  spec)
    qt = jax.tree.map(jax.device_put, qt)
    x0 = (jnp.asarray(rng.standard_normal((args.m, k)), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)
    exps = args.exp.split(",")
    kw = qt.data.shape[0]

    if "dma" in exps:
        print("== DMA ceiling probe (current [KW, N] layout)", flush=True)
        for bkw, bn in ((512, 512), (512, 1024), (256, 1024), (256, 2048),
                        (128, 2048), (kw, 512), (kw, 256)):
            if bkw > kw or kw % bkw or n % bn or bkw * bn * 8 > 14e6:
                continue
            try:
                dma_probe(qt, bkw, bn, supertile=False)
            except Exception as e:
                print(f"  dma ({bkw},{bn}) failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if "dmasup" in exps:
        print("== DMA ceiling probe (contiguous supertile layout)",
              flush=True)
        for bkw, bn in ((512, 512), (256, 512), (512, 256), (256, 1024)):
            if bkw > kw or kw % bkw or n % bn:
                continue
            try:
                dma_probe(qt, bkw, bn, supertile=True)
            except Exception as e:
                print(f"  dmasup ({bkw},{bn}) failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    if "pairs" in exps:
        print("== production pairs kernel", flush=True)
        import importlib
        dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
        for bkw, bn in ((512, 512), (512, 256), (256, 512)):
            if bkw > kw or kw % bkw or n % bn:
                continue
            orig = dm._pick_blocks
            dm._pick_blocks = lambda m_, kw_, n_, w_, _bkw=bkw, _bn=bn: (
                orig(m_, kw_, n_, w_)[0], _bkw, _bn)
            # the production entry is @jax.jit: identical static args would
            # silently reuse the first config's executable across the sweep
            dm._dequant_matmul_2d.clear_cache()
            try:
                step = lambda x: dm.dequant_matmul(x, qt)
                check(step, x0, qt, f"pairs({bkw},{bn})")
                t = timed(make_loop(step, k), x0)
                report(f"pairs bkw={bkw} bn={bn}", t, qt)
            except Exception as e:
                print(f"  pairs ({bkw},{bn}) failed: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
            finally:
                dm._pick_blocks = orig

    if "prod" in exps:
        print("== production gp kernel (in-kernel banding)", flush=True)
        import importlib

        dm = importlib.import_module("mlc_llm_tpu.ops.pallas.dequant_matmul")
        from mlc_llm_tpu.quant.groupwise import pad_quantized_groups

        qtp = pad_quantized_groups(qt)
        for bn in want_bn:
            if qtp.data.shape[1] % bn:
                continue
            orig_gp = dm._gp_blocks
            dm._gp_blocks = lambda m_, kw_, n_, *a, _bn=bn, **kk: (kw_, _bn)
            dm._dequant_matmul_gp_2d.clear_cache()
            try:
                step = lambda x: dm.dequant_matmul(x, qtp)
                check(step, x0, qt, f"prod(bn={bn})")
                t = timed(make_loop(step, k), x0)
                report(f"prod bn={bn}", t, qt)
            except Exception as e:
                print(f"  prod bn={bn} failed: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
            finally:
                dm._gp_blocks = orig_gp

    for variant in ("gp16", "w4a8", "bits16"):
        if variant not in exps:
            continue
        print(f"== {variant} group-partial kernel", flush=True)
        cgs = [c for c in want_cg if (qt.scale.shape[0] % c) == 0]
        if variant == "bits16":
            cgs = [c for c in cgs if c >= 16]
        for Cg in cgs:
            for bn in want_bn:
                if n % bn or (kw * bn * 4 + 2 * kw * 4 * bn) * 1.5 > 100e6:
                    continue
                try:
                    step = functools.partial(gp_matmul, qt=qt,
                                             variant=variant, Cg=Cg, bn=bn)
                    check(step, x0, qt, f"{variant}(Cg={Cg},bn={bn})")
                    t = timed(make_loop(step, k), x0)
                    report(f"{variant} Cg={Cg} bn={bn}", t, qt)
                except Exception as e:
                    print(f"  {variant} Cg={Cg} bn={bn} failed: "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
