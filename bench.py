#!/usr/bin/env python
"""Benchmark: wav segments/sec through the batched device feature graph,
against the CPU (NumPy/SciPy, librosa-equivalent) per-clip pipeline — the
north-star metric of BASELINE.json (the reference publishes no wall-clock
numbers; its librosa stack runs ~1 clip/s/core, measured fresh here).

Measurement notes for this backend (axon relay to one v5e chip):
- block_until_ready() is a no-op through the relay, so completion is forced
  by materializing a checksum scalar on host.
- One device roundtrip costs ~35 ms, so all chunks run inside a single jitted
  lax.map and the whole 2048-clip sweep pays that latency once.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import glob
import json
import sys
import time

import numpy as np

N_CLIPS = 2048
CHUNK = 128
BASELINE_CLIPS = 8


def _load_clips(n: int) -> np.ndarray:
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))
    if paths:
        from tpu_breath.data import wav as wav_io
        reps = -(-n // len(paths))
        return wav_io.load_wav_batch((paths * reps)[:n])
    rng = np.random.default_rng(0)
    return (rng.standard_normal((n, 16000)) * 0.05).astype(np.float32)


def main() -> None:
    wavs = _load_clips(N_CLIPS)

    # --- CPU baseline: the per-clip NumPy/SciPy pipeline (same math stack
    # librosa dispatches to), single core, like the reference's precompute.
    from tpu_breath.baseline import feature_np
    from tpu_breath.config import DEFAULT_FEATURES
    t0 = time.perf_counter()
    for i in range(BASELINE_CLIPS):
        feature_np.process_clip(wavs[i], DEFAULT_FEATURES)
    cpu_rate = BASELINE_CLIPS / (time.perf_counter() - t0)

    # --- device path: all chunks inside one jitted graph; a checksum scalar
    # forces completion of every output.
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.features import extract_features

    @jax.jit
    def sweep(w):
        chunks = w.reshape(N_CLIPS // CHUNK, CHUNK, -1)

        def one(c):
            f, s = extract_features(c, DEFAULT_FEATURES)
            return jnp.sum(f) + jnp.sum(s)

        return jnp.sum(lax.map(one, chunks))

    x = jnp.asarray(wavs)
    float(sweep(x))  # compile + warmup
    t0 = time.perf_counter()
    checksum = float(sweep(x))
    tpu_rate = N_CLIPS / (time.perf_counter() - t0)
    assert np.isfinite(checksum)

    print(json.dumps({
        "metric": "feature extraction throughput (9-ch spectrogram stack + 36 scalars per 1s wav clip)",
        "value": round(tpu_rate, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
