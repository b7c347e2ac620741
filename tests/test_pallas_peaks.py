"""Pallas peak-suppression kernel parity vs the XLA path (interpret mode on
CPU; A/B wall-time on the chip is recorded in RESULTS.md)."""
import numpy as np
import scipy.signal
import jax
import jax.numpy as jnp

from tpu_breath.ops import peaks

SR = 16000


def test_pallas_peaks_matches_xla_and_scipy(rng):
    envs = []
    for i in range(6):
        env = np.abs(scipy.signal.hilbert(
            rng.standard_normal(16000))).astype(np.float32)
        if i % 2:
            env = np.round(env * 64) / 64  # quantized -> plateaus/ties
        envs.append(env)
    x = jnp.asarray(np.stack(envs))
    h = jnp.mean(x, axis=-1)
    ref = peaks.find_peaks_stats_batched(x, h, SR // 10, use_pallas=False)
    got = peaks.find_peaks_stats_batched(x, h, SR // 10, use_pallas=True)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # and against scipy itself
    for i, env in enumerate(envs):
        pk, props = scipy.signal.find_peaks(env, height=float(env.mean()),
                                            distance=SR // 10)
        assert int(np.asarray(got[0])[i]) == len(pk)


def test_pallas_peaks_empty_and_single():
    x = jnp.asarray(np.zeros((2, 16000), np.float32))
    n, m, s = peaks.find_peaks_stats_batched(x, jnp.asarray([0.5, 0.5]),
                                             SR // 10, use_pallas=True)
    assert np.all(np.asarray(n) == 0) and np.all(np.asarray(m) == 0)
    one = np.zeros(16000, np.float32)
    one[8000] = 1.0
    x = jnp.asarray(one[None])
    n, m, s = peaks.find_peaks_stats_batched(x, jnp.asarray([0.0]),
                                             SR // 10, use_pallas=True)
    assert int(np.asarray(n)[0]) == 1
    assert abs(float(np.asarray(m)[0]) - 1.0) < 1e-6
    assert float(np.asarray(s)[0]) == 0.0
