"""Pallas kernel: the tuning-estimate tail as ONE VMEM-resident kernel.

After piptrack, librosa's estimate_tuning does: masked median of the
magnitudes -> threshold-select candidates -> residual = mod(bpo *
log2(pitch/27.5), 1) -> 100-bin histogram -> argmax. In XLA this lowers to
~170 small dependent reductions over the same [F*T] arrays (64 bit-descent
counts for the two median order statistics, 100 histogram counts, plus the
correctly-rounded log2 chain), each a separate HBM-fed kernel with launch
overhead and no cross-op reuse. Here the whole tail runs as one
pallas_call: each grid step loads 8 clips' pitches/magnitudes into VMEM
once and every pass reads VMEM, with the 8 clips vectorized across the
sublane dimension.

Numerics are identical to ops/chroma.py's XLA path (same dd.div_cr /
dd.log2_cr double-float ops — plain jnp inside the kernel — and the same
bit-descent rank selection), asserted by tests/test_pallas_tuning.py.

Layout contract: callers flatten [F, T] to [R, 128] rows (lane-aligned),
padding with pitch=0 / mag=0 entries, which the pitch>0 mask excludes
exactly like librosa's own zero-fill for non-candidates.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_breath.ops import dd

_A440_OVER16 = 27.5
_N_BINS = 100
_CLIPS_PER_BLOCK = 8


def _ordered_u32(x):
    b = lax.bitcast_convert_type(x, jnp.int32)
    sign_bit = jnp.int32(-2147483648)
    flipped = jnp.where(b < 0, ~b, b ^ sign_bit)
    return lax.bitcast_convert_type(flipped, jnp.uint32)


def _u32_f32(u):
    i = lax.bitcast_convert_type(u, jnp.int32)
    sign_bit = jnp.int32(-2147483648)
    b = jnp.where(i < 0, i ^ sign_bit, ~i)
    return lax.bitcast_convert_type(b, jnp.float32)


def _tuning_tail_kernel(bpo_smem, pitch_ref, mag_ref, out_ref):
    pitches = pitch_ref[0]          # [R, 128]
    mags = mag_ref[0]
    bpo = bpo_smem[0, 0].astype(jnp.float32)
    pitch_mask = pitches > 0.0
    k = jnp.sum(pitch_mask.astype(jnp.int32))

    # masked median of mags via two 32-step binary descents (VMEM-resident)
    keys = _ordered_u32(jnp.where(pitch_mask, mags, jnp.inf))
    rank_lo = jnp.maximum((k - 1) // 2, 0)
    rank_hi = jnp.maximum(k // 2, 0)

    def bit_body(i, prefixes):
        # prefixes are uniform (1, 128) vectors: tpu.bitcast (and friends)
        # require vector operands, so scalars ride as broadcast rows
        p_lo, p_hi = prefixes
        bit = jnp.uint32(31) - i.astype(jnp.uint32)
        c_lo = p_lo | (jnp.uint32(1) << bit)
        c_hi = p_hi | (jnp.uint32(1) << bit)
        below_lo = jnp.sum((keys < c_lo[0, 0]).astype(jnp.int32))
        below_hi = jnp.sum((keys < c_hi[0, 0]).astype(jnp.int32))
        p_lo = jnp.where(below_lo <= rank_lo, c_lo, p_lo)
        p_hi = jnp.where(below_hi <= rank_hi, c_hi, p_hi)
        return p_lo, p_hi

    z = jnp.zeros((1, 128), jnp.uint32)
    p_lo, p_hi = lax.fori_loop(0, 32, bit_body, (z, z))
    thresh = 0.5 * (_u32_f32(p_lo) + _u32_f32(p_hi))  # (1, 128) uniform
    thresh = jnp.where(k > 0, thresh, 0.0)

    sel = (mags >= thresh) & pitch_mask
    safe_p = jnp.where(sel, pitches, 1.0)
    octs = dd.log2_cr(dd.div_cr(safe_p, jnp.full_like(safe_p, _A440_OVER16)))
    residual = jnp.mod(bpo * octs, 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)
    bin_idx = jnp.clip(jnp.floor((residual + 0.5) * _N_BINS),
                       0, _N_BINS - 1).astype(jnp.int32)

    def hist_body(b, carry):
        best_count, best_bin = carry   # scalars
        c = jnp.sum(((bin_idx == b) & sel).astype(jnp.int32))
        better = c > best_count  # strict: first max wins, like argmax
        return (jnp.where(better, c, best_count),
                jnp.where(better, b, best_bin))

    best_count, best_bin = lax.fori_loop(0, _N_BINS, hist_body,
                                         (jnp.int32(-1), jnp.int32(0)))
    n_sel = jnp.sum(sel.astype(jnp.int32))
    result = jnp.where(n_sel > 0, best_bin, jnp.int32(_N_BINS // 2))
    out_ref[0, :, :] = jnp.full((8, 128), result, jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def estimate_tuning_index_pallas(pitches: jax.Array, mags: jax.Array,
                                 bins_per_octave: int,
                                 interpret: bool | None = None) -> jax.Array:
    """Batched: pitches/mags [B, F, T] (piptrack outputs) -> int32 [B]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, t = pitches.shape
    n = f * t
    rows = -(-n // 128)
    pad = rows * 128 - n

    def flat(x):
        x = x.reshape(b, n)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        return x.reshape(b, rows, 128)

    bpo = jnp.full((1, 1), bins_per_octave, jnp.int32)
    out = pl.pallas_call(
        _tuning_tail_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        interpret=interpret,
    )(bpo, flat(pitches), flat(mags))
    return out[:, 0, 0]
