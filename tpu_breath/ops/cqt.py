"""Direct constant-Q transform + CENS chroma as one batched MXU matmul.

librosa computes the CQT with a recursive multirate algorithm (per-octave
resampling); on TPU that shape-shifting recursion is hostile to XLA, and the
transform it approximates — correlation of the signal with a bank of
hann-windowed complex exponentials — is itself a single dense matmul over
frames. So the kernel bank (built once at trace time, shared with the NumPy
oracle in baseline/dsp_np.py) is applied to hop-strided frames of the padded
signal in one [n_bins, L] x [L, T] product per clip.

Replaces librosa.feature.chroma_cens as used by the reference
(src/precompute/process.py:53). Tuning is fixed at 0 (see
baseline/dsp_np.cqt docstring for the documented deviation).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_breath.baseline import dsp_np as _oracle

MM_PRECISION = lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _kernel_consts(sr: int, fmin: float, n_bins: int, bins_per_octave: int):
    """(k_re, k_im [n_bins, L_pad], inv_sqrt_len [n_bins], L_pad, half)."""
    kernels, lengths = _oracle.cqt_kernel_bank(sr, fmin, n_bins, bins_per_octave)
    max_len = kernels.shape[1]
    l_pad = -(-max_len // 128) * 128  # pad to lane multiple
    k = np.zeros((n_bins, l_pad), dtype=np.complex128)
    k[:, :max_len] = np.conj(kernels)
    inv_sqrt = (1.0 / np.sqrt(lengths)).astype(np.float32)
    return (k.real.astype(np.float32), k.imag.astype(np.float32),
            inv_sqrt, l_pad, max_len // 2)


def cqt_mag(y: jax.Array, sr: int, hop_length: int, fmin: float,
            n_bins: int, bins_per_octave: int) -> jax.Array:
    """|CQT| of y[..., n] -> [..., n_bins, 1 + n//hop], scale=True semantics."""
    k_re, k_im, inv_sqrt, l_pad, half = _kernel_consts(
        sr, fmin, n_bins, bins_per_octave)
    n = y.shape[-1]
    n_frames = 1 + n // hop_length
    pad = [(0, 0)] * (y.ndim - 1) + [(half, l_pad)]
    ypad = jnp.pad(y, pad)
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(l_pad)[None, :])
    frames = ypad[..., idx]  # [..., T, L]
    re = jnp.einsum("...tl,kl->...kt", frames, jnp.asarray(k_re),
                    precision=MM_PRECISION)
    im = jnp.einsum("...tl,kl->...kt", frames, jnp.asarray(k_im),
                    precision=MM_PRECISION)
    mag = jnp.sqrt(re * re + im * im)
    return mag * jnp.asarray(inv_sqrt)[:, None]


@functools.lru_cache(maxsize=None)
def _cq_to_chroma(n_bins: int, bins_per_octave: int, n_chroma: int,
                  fmin: float) -> np.ndarray:
    return _oracle.cq_to_chroma(n_bins, bins_per_octave, n_chroma, fmin
                                ).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _cens_window(win_len_smooth: int) -> np.ndarray:
    win = _oracle.hann(win_len_smooth + 2, periodic=False)
    return (win / win.sum()).astype(np.float32)


def _norm_cols(x: jax.Array, norm: int) -> jax.Array:
    if norm == 1:
        length = jnp.sum(jnp.abs(x), axis=-2, keepdims=True)
    else:
        length = jnp.sqrt(jnp.sum(x * x, axis=-2, keepdims=True))
    length = jnp.where(length < np.finfo(np.float32).tiny, 1.0, length)
    return x / length


def chroma_cens(y: jax.Array, sr: int, hop_length: int, fmin: float,
                n_chroma: int = 12, bins_per_octave: int = 36,
                n_octaves: int = 7, win_len_smooth: int = 41) -> jax.Array:
    """y[..., n] -> CENS chroma [..., n_chroma, T]: CQT chroma, l1 norm,
    4-level quantization, Hann smoothing, l2 norm."""
    n_bins = n_octaves * bins_per_octave
    C = cqt_mag(y, sr, hop_length, fmin, n_bins, bins_per_octave)
    ctc = jnp.asarray(_cq_to_chroma(n_bins, bins_per_octave, n_chroma, fmin))
    chroma = jnp.einsum("ck,...kt->...ct", ctc, C, precision=MM_PRECISION)
    chroma = _norm_cols(chroma, 1)
    quant = jnp.zeros_like(chroma)
    for step in (0.4, 0.2, 0.1, 0.05):
        quant = quant + 0.25 * (chroma > step).astype(chroma.dtype)
    # 'same' convolution along time with the (win_len_smooth+2)-point window
    win = _cens_window(win_len_smooth)
    w = len(win)
    t = chroma.shape[-1]
    qpad = jnp.pad(quant, [(0, 0)] * (quant.ndim - 1) + [(w // 2, w - 1 - w // 2)])
    idx = np.arange(t)[:, None] + np.arange(w)[None, :]
    smoothed = jnp.einsum("...ctw,w->...ct", qpad[..., idx], jnp.asarray(win),
                          precision=MM_PRECISION)
    return _norm_cols(smoothed, 2)
