"""Functional layers shared by all families.

Numeric conventions carried from the reference (load-bearing for
parity, SURVEY.md §7.3): norms accumulate in fp32
(llama.py:95-142, modules.py:66-90), softmax in fp32
(llama.py:316-318), logits in fp32 (llama.py:542-543).
Rotary is applied in fp32 from precomputed cos/sin tables that are
part of the param pytree, exactly as the reference precomputes them in
NumPy and passes them as weights (llama.py:503-516,681-691).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def rms_norm(x: Array, w: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: Array, w: Array, b: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def make_rotary_tables(
    head_dim: int,
    rotary_pct: float,
    base: float,
    max_seq_len: int,
    style: str,
):
    """cos/sin tables [max_seq_len, rotary_dim] (fp32).

    neox: emb = concat(freq, freq); gptj: emb = repeat(freq, 2) —
    /root/reference/mlc_llm/relax_model/modules.py:104-121.
    """
    rotary_dim = int(head_dim * rotary_pct)
    inv_freq = 1.0 / (
        base ** (np.arange(0, rotary_dim, 2, dtype=np.float32) / rotary_dim)
    )
    t = np.arange(max_seq_len, dtype=np.float32)
    freq = np.einsum("i,j->ij", t, inv_freq)
    if style == "neox":
        emb = np.concatenate([freq, freq], axis=-1)
    elif style == "gptj":
        emb = np.repeat(freq, 2, axis=-1)
    else:
        raise ValueError(f"unknown rotary style {style!r}")
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def apply_rotary(
    x: Array, cos: Array, sin: Array, positions: Array, style: str
) -> Array:
    """Rotary embedding on the leading `rotary_dim` of each head.

    x: [B, S, H, D]; positions: [B, S] absolute positions.
    Swizzles match modules.py:125-148 (neox rotate-half, gptj
    rotate-pairs); dims beyond rotary_dim pass through.
    """
    rotary_dim = cos.shape[-1]
    xr = x[..., :rotary_dim].astype(jnp.float32)
    c = cos[positions][:, :, None, :]  # [B, S, 1, rot]
    s = sin[positions][:, :, None, :]
    if style == "neox":
        half = rotary_dim // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        swz = jnp.concatenate([-x2, x1], axis=-1)
    else:  # gptj: pairs (even, odd) -> (-odd, even)
        pairs = xr.reshape(*xr.shape[:-1], rotary_dim // 2, 2)
        swz = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1)
        swz = swz.reshape(xr.shape)
    rotated = (xr * c + swz * s).astype(x.dtype)
    if rotary_dim == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x[..., rotary_dim:]], axis=-1)


def activate(x: Array, act: str) -> Array:
    if act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if act == "gelu_new":
        # tanh-approx gelu (moss.py:72-92)
        return jax.nn.gelu(x, approximate=True)
    if act == "silu":
        return jax.nn.silu(x)
    if act == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unknown activation {act!r}")
