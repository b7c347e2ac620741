"""Per-subgraph throughput profiler for the feature stack (one TPU chip).

Times each named stage of the batched feature graph (chunked exactly like
extract_features_batched) so regressions localize to an op. Consolidates the
round-2 feat_profile{,2,3,4}.py iterations into one tool.

Usage: PYTHONPATH=. python tools/feat_profile.py [stage ...]
       (no args = all stages; see STAGES below)
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import (spectral, cepstral, chroma as ch_ops,
                            cqt as cqt_ops, dft, lpc as lpc_ops, rhythm,
                            scalars as scalar_ops, peaks)
from tpu_breath.features import extract_features
from tpu_breath.data import wav as wav_io

B, CH = 2048, 128
SR, HOP, NFFT = SPEC.sr, SPEC.hop_length, SPEC.n_fft


def _mels(y):
    db = spectral.power_to_db(
        spectral.melspectrogram(y, SR, n_fft=NFFT, hop_length=HOP,
                                n_mels=128, fmax=SPEC.fmax), ref_max=True)
    return db + cepstral.delta(db, 1) + cepstral.delta(db, 2)


def _mfccs(y):
    mf = cepstral.mfcc(y, SR, SPEC.n_mfcc, HOP, NFFT)
    return mf + cepstral.delta(mf, 1) + cepstral.delta(mf, 2)


def _tuning(y):
    s = spectral.stft_mag(y, 2048, HOP)[..., ::2]
    return jax.vmap(lambda s1: ch_ops.estimate_tuning_index(s1, SR, 2048, 36)
                    )(s).astype(jnp.float32)


STAGES = {
    "full": lambda y: sum(map(jnp.sum, extract_features(y, SPEC))),
    "stft512": lambda y: spectral.stft_mag(y, NFFT, HOP),
    "stft512_dd": lambda y: spectral.stft_mag_dd(y, NFFT, HOP),
    "stft2048": lambda y: spectral.stft_mag(y, 2048, HOP),
    "mel+deltas": _mels,
    "mfcc+deltas": _mfccs,
    "chroma_stft": lambda y: ch_ops.chroma_stft(
        spectral.stft_mag(y, NFFT, HOP), SR),
    "tuning36": _tuning,
    "cens": lambda y: cqt_ops.chroma_cens(y, SR, HOP, SPEC.cqt_fmin),
    "cqt": lambda y: cqt_ops.cqt_mag_multirate(
        y, jnp.full(y.shape[:-1], 50, jnp.int32), SR, HOP, SPEC.cqt_fmin,
        36, 7),
    "lpc": lambda y: lpc_ops.lpc_features(y, SPEC.n_lpc, SR),
    "tempogram": lambda y: rhythm.tempogram(
        rhythm.onset_strength(y, SR, HOP), SPEC.tempogram_win_length),
    "scalars": lambda y: scalar_ops.extract_scalars(y, SR, HOP, NFFT, 128),
    "hilbert": dft.hilbert_envelope,
    "autocorr": dft.autocorr_full,
    "find_peaks": lambda y: jax.vmap(
        lambda e: jnp.stack(peaks.find_peaks_stats(e, jnp.mean(e), SR // 10))
    )(jnp.abs(y)),
}


def main() -> None:
    names = sys.argv[1:] or list(STAGES)
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:B]
    x = jnp.asarray(wav_io.load_wav_batch(paths))

    for name in names:
        f = STAGES[name]

        def g(w, f=f):
            c = w.reshape(B // CH, CH, -1)
            return jnp.sum(lax.map(lambda y: jnp.sum(f(y)), c))

        j = jax.jit(g)
        float(j(x))  # compile + warm
        t0 = time.perf_counter()
        float(j(x))
        dt = time.perf_counter() - t0
        print(f"{name:14s} {B / dt:9.1f} clips/s ({dt * 1000:.0f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
