"""Backend-portable profiling for the feature graph and training loop.

The axon relay backend emits no device trace (jax.profiler produces nothing),
so the CLI's --profile falls back to the next-best thing this backend CAN
measure: per-stage wall-clock attribution of the batched feature graph
(each named subgraph compiled and checksum-timed exactly like production
chunks) and per-epoch training timings. This replaces the reference's
device-side observability (cudnn autotune + memory prints, reference
main.py:14-21) with throughput attribution that localizes regressions to an
op.

Timing note: block_until_ready() is a no-op through the relay, so completion
is forced by materializing a checksum scalar on host; all chunks of a stage
run inside ONE jitted lax.map so per-dispatch overhead (~2 ms) doesn't skew
attribution.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def feature_stages() -> dict:
    """Named subgraphs of the production feature stack (lazy imports so the
    module is cheap to load)."""
    import jax
    import jax.numpy as jnp

    from tpu_breath.config import DEFAULT_FEATURES as SPEC
    from tpu_breath.ops import (spectral, cepstral, chroma as ch_ops,
                                cqt as cqt_ops, dft, lpc as lpc_ops, rhythm,
                                scalars as scalar_ops, peaks)
    from tpu_breath.features import extract_features

    sr, hop, n_fft = SPEC.sr, SPEC.hop_length, SPEC.n_fft

    def _mels(y):
        db = spectral.power_to_db(
            spectral.melspectrogram(y, sr, n_fft=n_fft, hop_length=hop,
                                    n_mels=128, fmax=SPEC.fmax), ref_max=True)
        return db + cepstral.delta(db, 1) + cepstral.delta(db, 2)

    def _mfccs(y):
        mf = cepstral.mfcc(y, sr, SPEC.n_mfcc, hop, n_fft)
        return mf + cepstral.delta(mf, 1) + cepstral.delta(mf, 2)

    def _tuning(y):
        s = spectral.stft_mag(y, 2048, hop)[..., ::2]
        return jax.vmap(
            lambda s1: ch_ops.estimate_tuning_index(s1, sr, 2048, 36)
        )(s).astype(jnp.float32)

    return {
        "full": lambda y: sum(map(jnp.sum, extract_features(y, SPEC))),
        "stft512": lambda y: spectral.stft_mag(y, n_fft, hop),
        "stft512_dd": lambda y: spectral.stft_mag_dd(y, n_fft, hop),
        "stft2048": lambda y: spectral.stft_mag(y, 2048, hop),
        "mel+deltas": _mels,
        "mfcc+deltas": _mfccs,
        "chroma_stft": lambda y: ch_ops.chroma_stft(
            spectral.stft_mag(y, n_fft, hop), sr),
        "tuning36": _tuning,
        "cens": lambda y: cqt_ops.chroma_cens(y, sr, hop, SPEC.cqt_fmin),
        "cqt": lambda y: cqt_ops.cqt_mag_multirate(
            y, jnp.full(y.shape[:-1], 50, jnp.int32), sr, hop, SPEC.cqt_fmin,
            36, 7),
        "lpc": lambda y: lpc_ops.lpc_features(y, SPEC.n_lpc, sr),
        "tempogram": lambda y: rhythm.tempogram(
            rhythm.onset_strength(y, sr, hop), SPEC.tempogram_win_length),
        "scalars": lambda y: scalar_ops.extract_scalars(y, sr, hop, n_fft,
                                                        128),
        "hilbert": dft.hilbert_envelope,
        "autocorr": dft.autocorr_full,
        # the production path (scalars.py uses the batched variant; the
        # per-clip vmap of find_peaks_stats measures ~3x slower and is NOT
        # what ships)
        "find_peaks": lambda y: jnp.stack(
            peaks.find_peaks_stats_batched(
                jnp.abs(y), jnp.mean(jnp.abs(y), axis=-1), sr // 10)),
    }


def profile_feature_stages(wavs: np.ndarray, names=None, chunk: int = 128,
                           log_fn=print) -> list[dict]:
    """Time each named stage over wavs[B, 16000] in production-sized chunks.
    Returns [{stage, clips_per_s, ms}], slowest first."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    stages = feature_stages()
    names = list(names or stages)
    if wavs.shape[0] == 0:
        raise ValueError("no clips to profile")
    chunk = min(chunk, wavs.shape[0])  # small datasets: one whole-batch chunk
    b = (wavs.shape[0] // chunk) * chunk
    x = jnp.asarray(wavs[:b])
    rows = []
    for name in names:
        f = stages[name]

        def g(w, f=f):
            c = w.reshape(b // chunk, chunk, -1)
            return jnp.sum(lax.map(lambda y: jnp.sum(f(y)), c))

        j = jax.jit(g)
        float(j(x))  # compile + warm
        t0 = time.perf_counter()
        float(j(x))
        dt = time.perf_counter() - t0
        rows.append({"stage": name, "clips_per_s": round(b / dt, 1),
                     "ms": round(dt * 1000.0, 1)})
        if log_fn:
            log_fn(f"{name:14s} {b / dt:9.1f} clips/s ({dt * 1000:.0f} ms)")
    return sorted(rows, key=lambda r: -r["ms"])


def write_feature_profile(profile_dir: str, wavs: np.ndarray,
                          chunk: int = 128, log_fn=print) -> str:
    os.makedirs(profile_dir, exist_ok=True)
    rows = profile_feature_stages(wavs, chunk=chunk, log_fn=log_fn)
    chunk = min(chunk, wavs.shape[0])  # mirror profile_feature_stages
    path = os.path.join(profile_dir, "feature_stages.json")
    with open(path, "w") as f:
        json.dump({"n_clips": int((wavs.shape[0] // chunk) * chunk),
                   "chunk": chunk, "stages": rows}, f, indent=1)
    return path


def write_train_profile(profile_dir: str, histories: dict) -> str:
    """Per-epoch wall-time attribution from fit() histories:
    {arch: [history rows]} -> train_profile.json with compile-epoch vs
    warm-epoch split and warm throughput."""
    os.makedirs(profile_dir, exist_ok=True)
    out = {}
    for arch, rows in histories.items():
        secs = [r["sec"] for r in rows]
        warm = sorted(secs)[: max(1, len(secs) - 1)]  # drop the compile epoch
        out[arch] = {
            "epochs": len(secs),
            "total_s": round(sum(secs), 2),
            "compile_epoch_s": round(max(secs), 2),
            "warm_epoch_median_s": round(float(np.median(warm)), 3),
        }
    path = os.path.join(profile_dir, "train_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return path
