"""Pallas tuning-tail kernel parity vs the XLA path (interpret mode on CPU;
the same kernel is A/B-benchmarked on the chip — RESULTS.md)."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_breath.config import FeatureSpec
from tpu_breath.ops import spectral, chroma as ch_ops
from tpu_breath.ops.pallas.tuning_kernel import estimate_tuning_index_pallas

SPEC = FeatureSpec()


def _xla_path(S_batch, sr, n_fft, bpo):
    f = jax.vmap(lambda s: ch_ops.estimate_tuning_index(s, sr, n_fft, bpo))
    return f(S_batch)


def test_pallas_tuning_matches_xla_real_clips(real_clips):
    S = spectral.stft_mag(jnp.asarray(real_clips), 2048, SPEC.hop_length)
    S = S[..., ::2]
    got_x = np.asarray(jax.jit(
        lambda s: _xla_path(s, SPEC.sr, 2048, 36))(S))
    p, m = jax.jit(jax.vmap(
        lambda s: ch_ops.piptrack(s, SPEC.sr, 2048)))(S)
    got_p = np.asarray(estimate_tuning_index_pallas(p, m, 36))
    assert np.array_equal(got_x, got_p), (got_x, got_p)


def test_pallas_tuning_synthetic_edge_cases(rng):
    # empty candidate set (silence) must fall back to index 50 (tuning 0.0)
    S = jnp.zeros((2, 1025, 32), jnp.float32)
    p, m = jax.jit(jax.vmap(
        lambda s: ch_ops.piptrack(s, SPEC.sr, 2048)))(S)
    out = np.asarray(estimate_tuning_index_pallas(p, m, 36))
    assert np.all(out == 50)
    # noisy spectra, both bpo settings
    S = jnp.asarray(np.abs(rng.standard_normal((3, 1025, 32))).astype(np.float32))
    p, m = jax.jit(jax.vmap(
        lambda s: ch_ops.piptrack(s, SPEC.sr, 2048)))(S)
    for bpo in (12, 36):
        got_x = np.asarray(jax.jit(
            lambda s: _xla_path(s, SPEC.sr, 2048, bpo))(S))
        got_p = np.asarray(estimate_tuning_index_pallas(p, m, bpo))
        assert np.array_equal(got_x, got_p), (bpo, got_x, got_p)
