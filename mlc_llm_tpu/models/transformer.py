"""Generic pre-norm decoder with static-shape KV cache, scan over layers.

One parameterized forward covers Llama, GPT-NeoX, and MOSS (the
reference builds three separate Relax graphs: llama.py:548-611,
gpt_neox.py:511-595, moss.py:478-565 — the math here is the same,
re-expressed TPU-first):

- layer params are STACKED along a leading L axis and the layer loop is
  a lax.scan — one layer gets traced/compiled, not num_layers
- the KV cache is a preallocated [L, B, H, Smax, D] buffer pair updated
  with per-sequence dynamic_update_slice (replacing the reference's
  growable vm.builtin.attention_kv_cache_* runtime objects)
- prefill and decode are the same function at different static S
  (the engine buckets prefill lengths; decode is S=1)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attend_cache, flash_prefill, flash_prefill_supported
from ..ops.matmul import qmatmul, qmatmul_stacked
from ..quant.groupwise import QuantizedTensor, quantize, take_dequantize
from ..quant.spec import QuantSpec, resolve_spec
from .config import ModelConfig
from .layers import activate, apply_rotary, layer_norm, make_rotary_tables, rms_norm

Array = jax.Array
Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """k: [L, B, Hkv, Smax, D]; v: [L, B, Hkv, D, Smax] (TRANSPOSED);
    lengths: [B] valid token count per slot.

    V is stored D-major so BOTH attention contractions hit minor dims
    (scores contract D on q/k; output contracts S on probs/v) — with
    row-major V, XLA relayouts the whole cache inside the decode
    program (a cache-sized copy per step; observed as a 4 GB HLO temp
    at 7B batch 8).

    int8 mode (the north star's int8 KV): k/v hold per-element int8
    codes and k_scale/v_scale hold per-(layer, slot, head, position)
    absmax/127 scales [L, B, Hkv, Smax]; fp mode leaves the scales None.
    """

    k: Array
    v: Array
    lengths: Array
    k_scale: Optional[Array] = None
    v_scale: Optional[Array] = None

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]


def init_kv_cache(
    cfg: ModelConfig, batch: int, max_len: Optional[int] = None, dtype=jnp.bfloat16
) -> KVCache:
    max_len = max_len or cfg.max_seq_len
    kshape = (cfg.num_layers, batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    vshape = (cfg.num_layers, batch, cfg.num_kv_heads, cfg.head_dim, max_len)
    dtype = jnp.dtype(dtype)
    scales = None
    if dtype == jnp.int8:
        scales = jnp.zeros(kshape[:-1], jnp.float32)
    return KVCache(
        k=jnp.zeros(kshape, dtype),
        v=jnp.zeros(vshape, dtype),
        lengths=jnp.zeros((batch,), jnp.int32),
        k_scale=scales,
        v_scale=None if scales is None else jnp.zeros(kshape[:-1], jnp.float32),
    )


def _norm(x, w, b, cfg: ModelConfig):
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, w, cfg.norm_eps)
    return layer_norm(x, w, b, cfg.norm_eps)


def _write_tokens_v(cache: Array, new: Array, l: Array, start: Array) -> Array:
    """cache: [L, B, H, D, Smax]; new: [B, H, D, S]; start: [B]."""
    B = new.shape[0]
    for b in range(B):
        cache = jax.lax.dynamic_update_slice(
            cache, new[b][None, None], (l, b, 0, 0, start[b])
        )
    return cache


def _write_tokens(cache: Array, new: Array, l: Array, start: Array) -> Array:
    """cache: [L, B, H, Smax, D]; new: [B, H, S, D]; start: [B].

    Writes ONLY the new token block of layer l per batch slot. The
    cache rides the layer scan as a carry, so XLA aliases the buffer
    and these are true in-place writes — the stacked-ys formulation
    copied the whole cache every step (~1 GB/step at 7B)."""
    B = new.shape[0]
    for b in range(B):
        cache = jax.lax.dynamic_update_slice(
            cache, new[b][None, None], (l, b, 0, start[b], 0)
        )
    return cache


def _write_token_scales(cache: Array, new: Array, l: Array, start: Array) -> Array:
    """cache: [L, B, H, Smax]; new: [B, H, S]; start: [B]."""
    B = new.shape[0]
    for b in range(B):
        cache = jax.lax.dynamic_update_slice(
            cache, new[b][None, None], (l, b, 0, start[b])
        )
    return cache


def _quantize_kv(x: Array):
    """[B, H, S, D] -> int8 codes + per-(B,H,S) absmax/127 scale."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_kv_t(x: Array):
    """[B, H, D, S] -> int8 codes + per-(B,H,S) absmax/127 scale
    (reduction over D = axis 2)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=2) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[:, :, None, :]), -127, 127).astype(jnp.int8)
    return q, scale


WEIGHT_KEYS = ("wqkv", "wo", "w_in", "w_out")


def _layer_tail(h, attn_out, h_mlp_in, lp, weights, l, cfg: ModelConfig):
    """Residual + MLP tail shared by the slot-contiguous and paged
    attention paths. h_mlp_in is the pre-computed parallel-residual MLP
    input (None for sequential residual)."""
    if h_mlp_in is None:
        h = h + attn_out
        h_mlp_in = _norm(h, lp["ln2_w"], lp.get("ln2_b"), cfg)

    if cfg.act == "silu_gated":
        gate_up = qmatmul_stacked(h_mlp_in, weights["w_in"], l, lp.get("b_in"))
        gate, up = jnp.split(gate_up, 2, axis=-1)
        mid = jax.nn.silu(gate) * up
    else:
        mid = activate(
            qmatmul_stacked(h_mlp_in, weights["w_in"], l, lp.get("b_in")), cfg.act
        )
    mlp_out = qmatmul_stacked(mid, weights["w_out"], l, lp.get("b_out"))

    if cfg.parallel_residual or cfg.single_norm:
        h = h + attn_out + mlp_out
    else:
        h = h + mlp_out
    if h.dtype == jnp.float16:
        # fp16 activation clamp to +-55504, the reference's fp16-safety
        # margin under float16's 65504 max (defined for all gpt_neox
        # graphs, /root/reference/mlc_llm/relax_model/gpt_neox.py:120-131;
        # applied here at every layer boundary so f16 presets don't
        # overflow where the reference's wouldn't)
        h = jnp.clip(h, jnp.float16(-55504.0), jnp.float16(55504.0))
    return h


def _layer(
    h: Array,
    lp: Params,
    weights: Params,
    ck: Array,
    cv: Array,
    cks: Optional[Array],
    cvs: Optional[Array],
    l: Array,
    cfg: ModelConfig,
    rot_cos: Array,
    rot_sin: Array,
    positions: Array,
    start: Array,
    attn_window: Optional[int] = None,
    page_table: Optional[Array] = None,
    prefill_flash: bool = False,
):
    B, S, H = h.shape
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h_mlp_in = None  # parallel-residual MLP input (None => sequential)
    if cfg.single_norm:
        hin = _norm(h, lp["ln1_w"], lp.get("ln1_b"), cfg)
        h_attn_in = h_mlp_in = hin
    else:
        h_attn_in = _norm(h, lp["ln1_w"], lp.get("ln1_b"), cfg)
        if cfg.parallel_residual:
            h_mlp_in = _norm(h, lp["ln2_w"], lp.get("ln2_b"), cfg)

    qkv = qmatmul_stacked(h_attn_in, weights["wqkv"], l, lp.get("bqkv"))
    q, k, v = jnp.split(qkv, [nh * d, nh * d + nkv * d], axis=-1)
    q = q.reshape(B, S, nh, d)
    k = k.reshape(B, S, nkv, d)
    v = v.reshape(B, S, nkv, d)

    q = apply_rotary(q, rot_cos, rot_sin, positions, cfg.rotary_style)
    k = apply_rotary(k, rot_cos, rot_sin, positions, cfg.rotary_style)

    # k -> [B, H, S, D]; v -> [B, H, D, S] (the cache's transposed
    # layout); write only the new tokens in place, then read layer l
    # back for attention (the slice fuses into the attention dot)
    k_bhsd = k.transpose(0, 2, 1, 3)
    v_bhds = v.transpose(0, 2, 3, 1)

    if page_table is not None:
        # paged path: write the new tokens into this slot's pages
        # (in-place DUS), then attend — decode reads pages in place via
        # the head-packed flash kernel; prefill/CPU gather the windowed
        # pages
        from .paged_cache import (
            gather_pages_k,
            gather_pages_scale_k,
            gather_pages_scale_v,
            gather_pages_v,
            paged_flash_decode,
            paged_flash_decode_tp,
            paged_flash_enabled,
            paged_flash_tp_enabled,
            write_scales_paged_k,
            write_scales_paged_v,
            write_tokens_paged_k,
            write_tokens_paged_v,
        )

        ps = ck.shape[3]
        maxp = page_table.shape[1]
        if attn_window is not None:
            maxp = min(maxp, -(-attn_window // ps))

        if ck.dtype == jnp.int8:
            kq, ks = _quantize_kv(k_bhsd)
            vq, vs = _quantize_kv_t(v_bhds)
            ck = write_tokens_paged_k(ck, kq, l, page_table, start)
            cv = write_tokens_paged_v(cv, vq, l, page_table, start)
            cks = write_scales_paged_k(cks, ks, l, page_table, start)
            cvs = write_scales_paged_v(cvs, vs, l, page_table, start)
        else:
            ck = write_tokens_paged_k(ck, k_bhsd, l, page_table, start)
            cv = write_tokens_paged_v(cv, v_bhds, l, page_table, start)

        from ..ops import current_mesh, kernel_mode, sharded_params

        on_cpu = jax.default_backend() == "cpu"
        mesh = current_mesh() if sharded_params() else None
        if (S == 1 and mesh is not None
                and paged_flash_tp_enabled(ck.shape[0], nh, mesh)):
            # GSPMD-sharded params: re-enter the kernel via an explicit
            # shard_map (head groups on 'tp'); without this, sharded
            # paged decode fell back to the gather path, which
            # materializes the whole window per layer (103 ms/step per
            # pool at 7B b8 — docs/PERF.md r2)
            attn = paged_flash_decode_tp(
                q.transpose(0, 2, 1, 3), ck, cv, cks, cvs,
                page_table, start, l,
                num_pages_window=maxp, head_dim=d, mesh=mesh,
                interpret=on_cpu,
            )
        elif S == 1 and not sharded_params() and (
                paged_flash_enabled(ck.dtype)
                or (on_cpu and kernel_mode() == "pallas")):
            attn = paged_flash_decode(
                q.transpose(0, 2, 1, 3), ck, cv, cks, cvs,
                page_table, start, l,
                num_pages_window=maxp, head_dim=d, interpret=on_cpu,
            )
        else:
            kc = gather_pages_k(ck, l, page_table, maxp, d)
            vc = gather_pages_v(cv, l, page_table, maxp, d)
            if ck.dtype == jnp.int8:
                ksc = gather_pages_scale_k(cks, l, page_table, maxp)
                vsc = gather_pages_scale_v(cvs, l, page_table, maxp)
            else:
                ksc = vsc = None
            attn = attend_cache(
                q.transpose(0, 2, 1, 3), kc, vc, ksc, vsc, start
            )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * d)
        attn_out = qmatmul_stacked(attn, weights["wo"], l, lp.get("bo"))
        h = _layer_tail(h, attn_out, h_mlp_in, lp, weights, l, cfg)
        return h, ck, cv, cks, cvs

    B_, H_, D_ = k_bhsd.shape[0], k_bhsd.shape[1], k_bhsd.shape[3]
    W = attn_window or ck.shape[3]

    def read_k(c):
        # window folded into the dynamic_slice: a separate
        # dynamic_index-then-[:W] made XLA materialize the FULL layer
        # (16.8 MB/layer/step at 7B) before slicing
        return jax.lax.dynamic_slice(
            c, (l, 0, 0, 0, 0), (1, B_, H_, W, D_)
        )[0]

    def read_v(c):
        return jax.lax.dynamic_slice(
            c, (l, 0, 0, 0, 0), (1, B_, H_, D_, W)
        )[0]

    def read_sc(c):
        return jax.lax.dynamic_slice(c, (l, 0, 0, 0), (1, B_, H_, W))[0]

    if ck.dtype == jnp.int8:
        kq, ks = _quantize_kv(k_bhsd)
        vq, vs = _quantize_kv_t(v_bhds)
        ck = _write_tokens(ck, kq, l, start)
        cv = _write_tokens_v(cv, vq, l, start)
        cks = _write_token_scales(cks, ks, l, start)
        cvs = _write_token_scales(cvs, vs, l, start)
        kc, vc = read_k(ck), read_v(cv)
        ksc, vsc = read_sc(cks), read_sc(cvs)
    else:
        ck = _write_tokens(ck, k_bhsd.astype(ck.dtype), l, start)
        cv = _write_tokens_v(cv, v_bhds.astype(cv.dtype), l, start)
        if prefill_flash and flash_prefill_supported(S, d):
            # reset prefill (caller guarantees start == 0): the block IS
            # the whole context — causal flash over the block's own
            # K/V, no cache read, fp32 online softmax
            attn = flash_prefill(
                q.transpose(0, 2, 1, 3), k_bhsd, v.transpose(0, 2, 1, 3)
            )
            attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * d)
            attn_out = qmatmul_stacked(attn, weights["wo"], l, lp.get("bo"))
            h = _layer_tail(h, attn_out, h_mlp_in, lp, weights, l, cfg)
            return h, ck, cv, cks, cvs
        kc, vc = read_k(ck), read_v(cv)
        ksc = vsc = None

    attn = attend_cache(q.transpose(0, 2, 1, 3), kc, vc, ksc, vsc, start)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, nh * d)
    attn_out = qmatmul_stacked(attn, weights["wo"], l, lp.get("bo"))

    h = _layer_tail(h, attn_out, h_mlp_in, lp, weights, l, cfg)
    return h, ck, cv, cks, cvs


def forward(
    params: Params,
    cfg: ModelConfig,
    tokens: Array,
    cache: KVCache,
    *,
    seq_lens: Optional[Array] = None,
    last_only: bool = True,
    attn_window: Optional[int] = None,
    prefill_flash: bool = False,
) -> Tuple[Array, KVCache]:
    """Run the decoder over a token block appended at each slot's length.

    tokens: [B, S] int32 (S static: a prefill bucket or 1 for decode).
    seq_lens: [B] actual new-token count per slot (<= S); tokens beyond
    are right-padding. Padded positions write junk K/V past the slot's
    length, but every future step writes its own position before
    attending to it, so the junk is never visible.
    attn_window: static bound on valid cache length (caller guarantees
    lengths + S <= attn_window); attention then reads only the first
    attn_window cache positions instead of the full Smax buffer — the
    engine compiles one decode program per window bucket.
    prefill_flash: caller asserts every slot starts at position 0
    (reset prefill) — prefill attention then runs the causal flash
    kernel over the block itself with no cache read at all.
    Returns (logits fp32 [B, V] if last_only — taken at each slot's
    LAST REAL token — else [B, S, V]; new cache with lengths advanced
    by seq_lens).
    """
    from .paged_cache import PagedKVCache

    paged = isinstance(cache, PagedKVCache)
    B, S = tokens.shape
    if seq_lens is None:
        seq_lens = jnp.full((B,), S, jnp.int32)
    start = cache.lengths
    positions = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    positions = jnp.minimum(positions, cache.max_len - 1)

    emb = params["embed"]["w"]
    if isinstance(emb, QuantizedTensor):
        # stored [H, V]; gather+dequant columns -> [B, S, H] in spec dtype
        h = take_dequantize(emb, tokens)
    else:
        h = emb[tokens]

    rot_cos, rot_sin = params["rotary"]["cos"], params["rotary"]["sin"]

    page_table = cache.page_table if paged else None

    def body(carry, xs):
        hh, ck, cv, cks, cvs = carry
        lp, l = xs
        hh, ck, cv, cks, cvs = _layer(
            hh, lp, weights, ck, cv, cks, cvs, l, cfg, rot_cos, rot_sin,
            positions, start, attn_window, page_table, prefill_flash,
        )
        return (hh, ck, cv, cks, cvs), None

    # the big weights stay OUT of the scan xs (slicing stacked xs leaves
    # materializes a full per-layer copy); small leaves (norms, biases)
    # ride xs, weights are indexed in place by the stacked kernels
    weights = {k: v for k, v in params["layers"].items() if k in WEIGHT_KEYS}
    small = {k: v for k, v in params["layers"].items() if k not in WEIGHT_KEYS}
    kv0 = (
        (cache.k_pages, cache.v_pages) if paged else (cache.k, cache.v)
    )
    (h, k_new, v_new, ks_new, vs_new), _ = jax.lax.scan(
        body,
        (h, kv0[0], kv0[1], cache.k_scale, cache.v_scale),
        (small, jnp.arange(cfg.num_layers, dtype=jnp.int32)),
    )

    h = _norm(h, params["final_ln"]["w"], params["final_ln"].get("b"), cfg)
    if last_only:
        # lm head on each slot's last REAL position only (llama.py:532-541)
        idx = jnp.clip(seq_lens - 1, 0, S - 1)
        h = jnp.take_along_axis(h, idx[:, None, None], axis=1)

    lm = params["lm_head"]
    if cfg.fp32_lm_head:
        h = h.astype(jnp.float32)
    logits = qmatmul(h, lm["w"], lm.get("b"), out_dtype=jnp.float32)
    logits = logits.astype(jnp.float32)
    if last_only:
        logits = logits[:, 0, :]

    if paged:
        new_cache = PagedKVCache(
            k_pages=k_new, v_pages=v_new, page_table=cache.page_table,
            lengths=cache.lengths + seq_lens,
            k_scale=ks_new, v_scale=vs_new,
        )
    else:
        new_cache = KVCache(
            k=k_new, v=v_new, lengths=cache.lengths + seq_lens,
            k_scale=ks_new, v_scale=vs_new,
        )
    return logits, new_cache


# ---------------------------------------------------------------------------
# Parameter construction


def _maybe_quant(w: Array, spec: QuantSpec, key_scale=None):
    if spec.is_quantized:
        from ..quant.spec import spec_for_k

        return quantize(w, spec_for_k(spec, w.shape[0]))
    return w.astype(jnp.dtype(spec.dtype))


def _stack_layers(layer_list):
    """Stack a list of per-layer param dicts along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layer_list)


def init_random_params(
    cfg: ModelConfig,
    quant,
    seed: int = 0,
    scale: float = 0.02,
    fabricate: bool = False,
) -> Params:
    """Random-weight params (tests / benchmarks; no network access).

    Weight layout is [k, n] everywhere (reduction-major), matching the
    quant core; the embedding is stored transposed [H, V] when
    quantized so gather+dequant reads columns.

    fabricate=True skips fp32 materialization + real quantization and
    directly fabricates random packed codes + scales (exact storage
    layout, garbage values) — for benchmarking multi-GB models fast.
    """
    spec = resolve_spec(quant)
    dtype = jnp.dtype(spec.dtype)
    H, F, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    nh, nkv, d = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    key = jax.random.PRNGKey(seed)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def randw(k, n):
        return jax.random.normal(nxt(), (k, n), jnp.float32) * scale

    if fabricate and spec.is_quantized:

        def fab(k, n, fspec=None):
            from ..quant.groupwise import pad_cols

            fspec = fspec or spec
            g = fspec.group_size
            ngroups = -(-k // g)
            n_logical, n = n, pad_cols(n)
            if fspec.storage == "u4":
                data = jax.random.randint(
                    nxt(), (ngroups * g, n), 0, 15, jnp.uint8
                ).astype(jnp.uint4)
            elif fspec.storage == "i8":
                data = jax.random.randint(nxt(), (ngroups * g, n), -127, 128, jnp.int8)
            else:
                epw = fspec.elems_per_word
                rows = ngroups * (-(-g // epw))
                wdtype = jnp.uint32 if fspec.storage == "u32" else jnp.uint16
                data = jax.random.bits(nxt(), (rows, n), jnp.uint32).astype(wdtype)
            qscale = (
                jnp.abs(jax.random.normal(nxt(), (ngroups, n), jnp.float32)) * scale
                / max(fspec.max_int, 1)
            ).astype(jnp.dtype(fspec.dtype))
            zero = None
            if not fspec.sym:
                zero = (-qscale * (1 << (fspec.nbit - 1))).astype(jnp.dtype(fspec.dtype))
            return QuantizedTensor(
                data=data, scale=qscale, zero=zero, spec=fspec, shape=(k, n_logical)
            )

        globals_fab = fab
    else:
        globals_fab = None

    def _mk(k, n, sp=None):
        from ..quant.spec import spec_for_k

        sp = spec_for_k(sp or spec, k)
        if globals_fab is not None and sp.is_quantized:
            return globals_fab(k, n, sp)
        w = randw(k, n)
        if sp.is_quantized:
            return quantize(w, sp)
        return w.astype(jnp.dtype(sp.dtype))

    gated = cfg.act == "silu_gated"
    layers = []
    for _ in range(cfg.num_layers):
        lp: Params = {
            "ln1_w": jnp.ones((H,), dtype),
            "wqkv": _mk(H, (nh + 2 * nkv) * d),
            "wo": _mk(nh * d, H),
            "w_in": _mk(H, 2 * F if gated else F),
            "w_out": _mk(F, H),
        }
        if cfg.norm_type == "layernorm":
            lp["ln1_b"] = jnp.zeros((H,), dtype)
        if not cfg.single_norm:
            lp["ln2_w"] = jnp.ones((H,), dtype)
            if cfg.norm_type == "layernorm":
                lp["ln2_b"] = jnp.zeros((H,), dtype)
        if cfg.qkv_bias:
            lp["bqkv"] = jnp.zeros(((nh + 2 * nkv) * d,), dtype)
        if cfg.out_bias:
            lp["bo"] = jnp.zeros((H,), dtype)
        if cfg.mlp_bias:
            lp["b_in"] = jnp.zeros((2 * F if gated else F,), dtype)
            lp["b_out"] = jnp.zeros((H,), dtype)
        layers.append(lp)

    cos, sin = make_rotary_tables(
        d, cfg.rotary_pct, cfg.rotary_base, cfg.max_seq_len, cfg.rotary_style
    )

    head_spec = spec
    if cfg.fp32_lm_head:
        head_spec = (
            dataclasses.replace(spec, dtype="float32")
            if spec.is_quantized
            else resolve_spec("f32")
        )
    params: Params = {
        "embed": {
            "w": _mk(H, V) if spec.is_quantized else randw(V, H).astype(dtype)
        },
        "layers": _stack_layers(layers),
        "final_ln": {"w": jnp.ones((H,), dtype)},
        "lm_head": {"w": _mk(H, V, head_spec)},
        "rotary": {"cos": cos, "sin": sin},
    }
    if cfg.norm_type == "layernorm":
        params["final_ln"]["b"] = jnp.zeros((H,), dtype)
    if cfg.lm_head_bias:
        params["lm_head"]["b"] = jnp.zeros(
            (V,), jnp.float32 if cfg.fp32_lm_head else dtype
        )
    return params
