"""Pallas TPU kernel: direct CQT without materializing the frame tensor.

The XLA path (ops/cqt.py) gathers hop-strided frames into a [B, T, L] tensor
(L ~ 25.6k -> ~6.3 MB of HBM traffic per clip) before its kernel-bank matmul.
Here each clip's padded signal row (~162 KB) is pinned in VMEM and the frame
tile for each L-slice is built in-register with an interleave trick, so HBM
only ever sees the signal once and the kernel-bank tiles stream through:

  frames[t, j] = y[hop*t + TL*lt + j]  with TL == hop == 256, so the frame
  tile for L-slice lt is literally s.reshape(63, 256) of the contiguous span
  s = y[256*lt : 256*lt + 256*63] — a pure reshape, no strided gather.

Grid is (B, n_ltiles); complex accumulation lives in VMEM scratch across the
sequential lt steps (zeroed at lt==0, |.| written at the last step). Matmuls
run at HIGHEST precision, so the kernel is parity-grade (~1e-5 vs the oracle),
not a bf16 approximation.

Replaces the hot inner product of librosa.cqt as used by chroma_cens
(reference src/precompute/process.py:53).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_breath.baseline import dsp_np as _oracle

HOP = 256
TILE_L = 256  # == HOP: makes each frame tile a contiguous reshape
SEG = 256 * 63  # the signal span one L-tile's 63 frames touch


@functools.lru_cache(maxsize=None)
def _kernel_bank(sr: int, fmin: float, n_bins: int, bins_per_octave: int,
                 n_frames: int):
    """(k_re, k_im [K_pad, L_pad], half, l_pad, k_pad) with 1/sqrt(len)
    prescaled into the bank (|c*z| = c|z| for c > 0)."""
    kernels, lengths = _oracle.cqt_kernel_bank(sr, fmin, n_bins,
                                               bins_per_octave)
    max_len = kernels.shape[1]
    l_pad = -(-max_len // TILE_L) * TILE_L
    k_pad = -(-n_bins // 128) * 128
    bank = np.zeros((k_pad, l_pad), dtype=np.complex128)
    bank[:n_bins, :max_len] = np.conj(kernels) / np.sqrt(lengths)[:, None]
    return (bank.real.astype(np.float32), bank.imag.astype(np.float32),
            max_len // 2, l_pad, k_pad)


def _cqt_kernel(y_ref, kre_ref, kim_ref, out_ref, acc_re, acc_im):
    lt = pl.program_id(1)
    n_lt = pl.num_programs(1)

    @pl.when(lt == 0)
    def _():
        acc_re[:] = jnp.zeros_like(acc_re)
        acc_im[:] = jnp.zeros_like(acc_im)

    s = y_ref[0, 0, pl.ds(lt * TILE_L, SEG)]
    frames = s.reshape(SEG // HOP, HOP)  # [63, 256]
    dims = (((1,), (1,)), ((), ()))
    acc_re[:] += lax.dot_general(frames, kre_ref[:], dims,
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
    acc_im[:] += lax.dot_general(frames, kim_ref[:], dims,
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)

    @pl.when(lt == n_lt - 1)
    def _():
        out_ref[0] = jnp.sqrt(acc_re[:] * acc_re[:] + acc_im[:] * acc_im[:])


def cqt_mag_pallas(y: jax.Array, sr: int, hop_length: int, fmin: float,
                   n_bins: int, bins_per_octave: int,
                   interpret: bool | None = None) -> jax.Array:
    """|CQT| of y[B, n] -> [B, n_bins, 1 + n//hop]; semantics identical to
    ops/cqt.cqt_mag (librosa scale=True convention, tuning 0)."""
    assert hop_length == HOP, "kernel is specialized to hop 256"
    b, n = y.shape
    n_frames = 1 + n // hop_length
    k_re, k_im, half, l_pad, k_pad = _kernel_bank(
        sr, fmin, n_bins, bins_per_octave, n_frames)
    n_lt = l_pad // TILE_L
    sig_len = HOP * (n_frames - 1) + TILE_L * n_lt
    # [B, 1, sig_len]: a singleton sublane dim keeps the block shape legal
    # (last two dims must divide (8, 128) or equal the array dims)
    ypad = jnp.pad(y, ((0, 0), (half, sig_len - n - half)))[:, None, :]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (b, n_lt)
    out = pl.pallas_call(
        _cqt_kernel,
        grid=grid,
        in_specs=[
            # the whole padded signal row, re-presented for every lt step
            pl.BlockSpec((1, 1, sig_len), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, TILE_L), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, TILE_L), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_frames, k_pad), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_frames, k_pad), jnp.float32),
            pltpu.VMEM((n_frames, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(ypad, jnp.asarray(k_re), jnp.asarray(k_im))
    return out[:, :, :n_bins].swapaxes(-1, -2)
