"""Exact order statistics without sorting (radix select).

XLA's TPU sort is the single most expensive primitive in this pipeline's
scalar/tuning paths (a [16000] f32 sort costs more than the rest of the
scalar graph combined), yet every use only needs one or two order
statistics. Radix select gets them exactly: map f32 to order-preserving
uint32 (sign-flip trick), then 4 byte-passes of 256-bin compare-reduce
counts narrow the rank to a single key. All passes are fixed-shape
vectorized reductions — no data-dependent control flow, vmap-friendly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def f32_to_ordered_u32(x: jax.Array) -> jax.Array:
    """Monotone bijection f32 -> uint32: non-negative floats map to
    [2^31, 2^32), negatives to [0, 2^31) reversed."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    sign_bit = jnp.int32(-2147483648)  # 0x80000000
    flipped = jnp.where(b < 0, ~b, b ^ sign_bit)
    return jax.lax.bitcast_convert_type(flipped, jnp.uint32)


def u32_to_f32(u: jax.Array) -> jax.Array:
    """Inverse of f32_to_ordered_u32."""
    i = jax.lax.bitcast_convert_type(u, jnp.int32)
    sign_bit = jnp.int32(-2147483648)
    b = jnp.where(i < 0, i ^ sign_bit, ~i)  # i<0 <=> u >= 2^31
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def rank_select_u32(keys: jax.Array, rank: jax.Array) -> jax.Array:
    """Exact rank-th smallest (0-indexed) of 1-D uint32 keys by 4-pass radix
    select; rank may be traced."""
    prefix = jnp.zeros((), jnp.uint32)
    bins = jnp.arange(256, dtype=jnp.uint32)
    rank = rank.astype(jnp.int32)
    for shift in (24, 16, 8, 0):
        byte = (keys >> shift) & jnp.uint32(0xFF)
        in_group = (keys >> (shift + 8)) == (prefix >> (shift + 8)) \
            if shift < 24 else jnp.ones_like(keys, dtype=bool)
        counts = jnp.sum((byte[None, :] == bins[:, None]) & in_group[None, :],
                         axis=1, dtype=jnp.int32)
        cum = jnp.cumsum(counts)
        sel = jnp.searchsorted(cum, rank + 1, side="left").astype(jnp.int32)
        sel = jnp.minimum(sel, 255)
        prefix = prefix | (sel.astype(jnp.uint32) << shift)
        rank = rank - jnp.where(sel > 0, cum[jnp.maximum(sel - 1, 0)], 0)
    return prefix


def rank_value(x: jax.Array, rank) -> jax.Array:
    """Exact rank-th smallest value of 1-D f32 x (rank static or traced)."""
    keys = f32_to_ordered_u32(x.astype(jnp.float32))
    return u32_to_f32(rank_select_u32(keys, jnp.asarray(rank)))


def percentile(x: jax.Array, q: float) -> jax.Array:
    """np.percentile(x, q) (linear interpolation) of 1-D x, sort-free."""
    n = x.shape[-1]
    pos = q / 100.0 * (n - 1)
    lo = int(np.floor(pos))
    frac = np.float32(pos - lo)
    v_lo = rank_value(x, lo)
    v_hi = rank_value(x, min(lo + 1, n - 1)) if frac else v_lo
    return v_lo * (1 - frac) + v_hi * frac


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """np.median over values[mask] (0.0 if the mask is empty): masked
    entries map to +inf keys, two rank selects pick the middles."""
    flat_v = jnp.where(mask, values, jnp.inf).ravel().astype(jnp.float32)
    keys = f32_to_ordered_u32(flat_v)
    k = jnp.sum(mask)
    lo = jnp.maximum((k - 1) // 2, 0)
    hi = jnp.maximum(k // 2, 0)
    v_lo = u32_to_f32(rank_select_u32(keys, lo))
    v_hi = u32_to_f32(rank_select_u32(keys, hi))
    med = 0.5 * (v_lo + v_hi)
    return jnp.where(k > 0, med, 0.0)
