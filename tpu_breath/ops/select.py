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
    """Exact rank-th smallest (0-indexed) of 1-D uint32 keys by 32-step
    binary descent: per bit (high to low), one masked count decides whether
    the answer has that bit set — 32 compare+sum passes over the data total
    (a 256-bin-per-byte histogram variant costs 32x this and loses to the
    sort it replaces; measured on-chip). rank may be traced."""
    rank = rank.astype(jnp.int32)
    prefix = jnp.zeros((), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = prefix | (jnp.uint32(1) << bit)
        below = jnp.sum(keys < cand, dtype=jnp.int32)
        # if fewer than rank+1 keys are < cand, the answer is >= cand
        prefix = jnp.where(below <= rank, cand, prefix)
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
