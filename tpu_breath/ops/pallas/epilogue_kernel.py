"""Pallas kernel: the SURVEY §7.1 fused epilogue — filterbank·|STFT| + log1p
+ z-norm as ONE VMEM-resident kernel (the "gammatone" channel's epilogue,
reference src/precompute/methods.py:136-140).

The XLA path (features.py) runs this as a chunked compensated GEMM
(ops/dd.matmul_dd: a 33-step lax.scan whose double-float carries round-trip
through HBM), then dd.log1p_cr, then the z-score's four reduction kernels.
Here each grid step loads one clip's magnitudes into VMEM once and the
whole chain — dd GEMM accumulation, correctly-rounded log1p, mean/std,
normalize — reads and writes VMEM only. Numerics are IDENTICAL to the XLA
path (same two_sum/two_prod double-float ops, same slice order), asserted by
tests/test_pallas_epilogue.py, so an A/B is purely about fusion overhead
(tools/pallas_epilogue_ab.py records the verdict either way).

Mosaic constraints shaped this kernel (both learned on-chip, not CPU
interpret mode): (1) dynamic_slice of a VMEM value inside fori_loop/scan has
no TC lowering, so the contraction loop is Python-unrolled over static
slices; (2) rank-3 transpose/reshape of VMEM values aborts the Mosaic layout
pass, so the grid is ONE CLIP per step and every in-kernel value is rank-2.

A `plain=True` variant (native f32 dot + jnp.log1p) exists to answer §7.1's
original (pre-double-float) question like-for-like against the plain XLA
subgraph.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_breath.ops import dd

_SLICE = 8  # dd-GEMM slice width; the XLA path defaults to 64 (cr_width_ab)
# — both sit on the same MXU per-product error floor, so the paths agree to
# the slice-accumulation bound (~1e-7) rather than bitwise.


def _dd_gemm_unrolled(a, b, n_slices: int):
    """Compensated (double-float) GEMM, contraction in _SLICE-wide steps in
    the same order / with the same two_sum accumulation as dd.matmul_dd."""
    h = jnp.zeros((a.shape[0], b.shape[1]), jnp.float32)
    l = h
    for i in range(n_slices):
        p = jax.lax.dot(
            a[:, i * _SLICE:(i + 1) * _SLICE],
            b[i * _SLICE:(i + 1) * _SLICE, :],
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        h, e = dd._two_sum(h, p)
        l = l + e
    return h + l


def _znorm(gt):
    """z-score over the whole clip (all elements), shape-preserving."""
    mean = jnp.mean(gt)
    var = jnp.mean((gt - mean) ** 2)
    return (gt - mean) / (jnp.sqrt(var) + 1e-8)


def _epilogue_kernel(fb_ref, mag_ref, out_ref, *, n_slices: int,
                     plain: bool):
    mag = mag_ref[0]   # [Fp, T] (one clip)
    fb = fb_ref[...]   # [G, Fp]
    if plain:
        prod = jax.lax.dot(fb, mag, precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        gt = jnp.log1p(prod)
    else:
        gt = dd.log1p_cr(_dd_gemm_unrolled(fb, mag, n_slices))
    out_ref[0] = _znorm(gt)


def _gammatone_kernel(basis_ref, fb_ref, frames_ref, out_ref, *,
                      n_k_slices: int, n_f_slices: int, f_valid: int):
    """The WHOLE gammatone channel for one clip, VMEM-resident:
    frames -> dd real-DFT -> |S| -> dd filterbank GEMM -> log1p_cr -> z-norm.

    Numerics match the XLA path (stft_mag_dd + matmul_dd + log1p_cr + znorm
    in features.py) to the slice-accumulation floor: same two_sum
    accumulation and HIGHEST-precision dots, 8-wide slices here vs the XLA
    default 64 (identical measured error floor, tools/cr_width_ab.py). The
    XLA path's lax.scan round-trips its double-float carries through HBM
    every slice; here both GEMM chains keep carries in VMEM."""
    frames = frames_ref[0]    # [T, K]
    basis = basis_ref[...]    # [K, 2F]
    fbt = fb_ref[...]         # [Fp, G] (filterbank transpose, rows padded)

    t = frames.shape[0]
    ri = _dd_gemm_unrolled(frames, basis, n_k_slices)  # [T, 2F]
    re, im = ri[:, :f_valid], ri[:, f_valid:]
    mag = jnp.sqrt(re * re + im * im)                  # [T, F]
    fp = fbt.shape[0]
    if fp != f_valid:  # zero-pad the second contraction like matmul_dd
        mag = jnp.concatenate(
            [mag, jnp.zeros((t, fp - f_valid), jnp.float32)], axis=1)
    gt = dd.log1p_cr(_dd_gemm_unrolled(mag, fbt, n_f_slices))  # [T, G]
    out_ref[0] = _znorm(gt).T                                  # [G, T]


@functools.partial(jax.jit, static_argnums=(3,))
def fused_gammatone(frames: jax.Array, basis: jax.Array, fb: jax.Array,
                    interpret: bool | None = None) -> jax.Array:
    """frames[B, T, K] (window folded into basis), basis[K, 2F], fb[G, F]
    -> z-normed gammatone [B, G, T], one clip per grid step."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, k = frames.shape
    f2 = basis.shape[1]
    f_valid = f2 // 2
    g = fb.shape[0]
    if k % _SLICE:
        raise ValueError(f"n_fft {k} must be a multiple of {_SLICE}")
    n_f_slices = -(-f_valid // _SLICE)
    fp = n_f_slices * _SLICE
    fbt = fb.T.astype(jnp.float32)
    if fp != f_valid:
        fbt = jnp.pad(fbt, ((0, fp - f_valid), (0, 0)))

    kernel = functools.partial(_gammatone_kernel, n_k_slices=k // _SLICE,
                               n_f_slices=n_f_slices, f_valid=f_valid)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((k, f2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, t), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, t), jnp.float32),
        interpret=interpret,
    )(basis.astype(jnp.float32), fbt, frames.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnums=(2, 3))
def fused_epilogue(mag: jax.Array, fb: jax.Array, plain: bool = False,
                   interpret: bool | None = None) -> jax.Array:
    """mag[B, F, T] magnitudes, fb[G, F] filterbank ->
    z-normed log1p(fb @ mag) [B, G, T], one clip per grid step."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, f, t = mag.shape
    g = fb.shape[0]
    n_slices = -(-f // _SLICE)
    fp = n_slices * _SLICE
    if fp != f:  # zero-pad the contraction (zeros contribute nothing)
        mag = jnp.pad(mag, ((0, 0), (0, fp - f), (0, 0)))
        fb = jnp.pad(fb, ((0, 0), (0, fp - f)))

    kernel = functools.partial(_epilogue_kernel, n_slices=n_slices,
                               plain=plain)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((g, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fp, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, t), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, g, t), jnp.float32),
        interpret=interpret,
    )(fb, mag)
    return out
