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


def test_fused_gammatone_matches_xla_dd_path(real_clips):
    """The full-channel kernel (frames -> dd DFT -> |S| -> dd filterbank ->
    log1p_cr -> z-norm) against the XLA double-float path at the KERNEL'S
    8-wide slice layout — same slice order and two_sum chain -> tight
    tolerance. (Production defaults to 64-wide slices, identical error floor
    per tools/cr_width_ab.py; the production-vs-kernel gap is covered at the
    z-norm-amplified 2e-4 bound by test_fused_gammatone_in_feature_graph.)"""
    y = jnp.asarray(real_clips)
    fb = jnp.asarray(spectral.mel_matrix(SPEC.sr, SPEC.n_fft,
                                         SPEC.n_gammatone))

    @jax.jit
    def xla_path(x):
        mag = spectral.stft_mag_dd(x, SPEC.n_fft, SPEC.hop_length, chunk=8)
        gt = dd.log1p_cr(dd.matmul_dd(mag.swapaxes(-1, -2), fb.T, chunk=8
                                      ).swapaxes(-1, -2))
        return spectral.znorm(gt, axes=(-2, -1))

    n_frames = 1 + y.shape[-1] // SPEC.hop_length
    yp = jnp.pad(y, ((0, 0), (SPEC.n_fft // 2, SPEC.n_fft // 2)))
    frames = spectral.frame_signal(yp, SPEC.n_fft, SPEC.hop_length, n_frames)
    basis = jnp.asarray(spectral._framedft_consts(SPEC.n_fft, "hann"))

    ref = np.asarray(xla_path(y))
    got = np.asarray(epilogue_kernel.fused_gammatone(frames, basis, fb))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_fused_gammatone_in_feature_graph(real_clips, monkeypatch):
    """extract_features with TPU_BREATH_PALLAS_GT=1 (kernel, interpret mode)
    against the default XLA path. The default path now feeds the channel the
    round-once stft_mag_cr magnitude (shared with the chroma tuning,
    PARITY.md) while the kernel keeps the stft_mag_dd chain — the ~1e-7 |S|
    difference is amplified ~200x by the channel's z-score, so the bound is
    2e-4 (vs the 1e-3 parity budget), not bit-exact. Scalars don't go
    through the kernel and must be untouched."""
    import tpu_breath.features as features

    y = jnp.asarray(real_clips)
    monkeypatch.setenv("TPU_BREATH_PALLAS_GT", "0")
    f_xla, s_xla = jax.jit(lambda x: features.extract_features(x, SPEC))(y)
    monkeypatch.setenv("TPU_BREATH_PALLAS_GT", "1")
    f_pl, s_pl = jax.jit(lambda x: features.extract_features(x, SPEC))(y)
    gt_idx = SPEC.channel_order.index("gammatone")
    np.testing.assert_allclose(np.asarray(f_pl[:, gt_idx]),
                               np.asarray(f_xla[:, gt_idx]), atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_xla),
                               atol=0, rtol=0)
