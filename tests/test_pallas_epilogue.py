"""Pallas fused-epilogue kernel (SURVEY §7.1) parity vs the XLA path
(interpret mode on CPU; the on-chip A/B lives in tools/pallas_epilogue_ab.py
and its verdict in RESULTS.md)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, dd
from tpu_breath.ops.pallas import epilogue_kernel


def _mags(real_clips):
    x = jnp.asarray(real_clips)
    return jax.jit(lambda y: spectral.stft_mag_dd(y, SPEC.n_fft,
                                                  SPEC.hop_length))(x)


def test_epilogue_kernel_matches_xla_dd_path(real_clips):
    mag = _mags(real_clips)
    fb = jnp.asarray(spectral.mel_matrix(SPEC.sr, SPEC.n_fft,
                                         SPEC.n_gammatone))

    @jax.jit
    def xla_path(m):
        gt = dd.log1p_cr(dd.matmul_dd(m.swapaxes(-1, -2), fb.T
                                      ).swapaxes(-1, -2))
        return spectral.znorm(gt, axes=(-2, -1))

    ref = np.asarray(xla_path(mag))
    got = np.asarray(epilogue_kernel.fused_epilogue(mag, fb))
    # same double-float math; only MXU accumulation layout differs per slice
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_epilogue_kernel_plain_variant(real_clips):
    mag = _mags(real_clips)
    fb = jnp.asarray(spectral.mel_matrix(SPEC.sr, SPEC.n_fft,
                                         SPEC.n_gammatone))

    @jax.jit
    def xla_plain(m):
        gt = jnp.log1p(jnp.einsum("gf,bft->bgt", fb, m,
                                  precision=spectral.MM_PRECISION))
        return spectral.znorm(gt, axes=(-2, -1))

    ref = np.asarray(xla_plain(mag))
    got = np.asarray(epilogue_kernel.fused_epilogue(mag, fb, plain=True))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=0)


def test_epilogue_kernel_ragged_batch(real_clips):
    """Batch not a multiple of the clip block: padding clips must not leak
    into real outputs."""
    mag = _mags(real_clips)[:3]
    fb = jnp.asarray(spectral.mel_matrix(SPEC.sr, SPEC.n_fft,
                                         SPEC.n_gammatone))
    full = np.asarray(epilogue_kernel.fused_epilogue(_mags(real_clips), fb))
    part = np.asarray(epilogue_kernel.fused_epilogue(mag, fb))
    np.testing.assert_allclose(part, full[:3], atol=0, rtol=0)
