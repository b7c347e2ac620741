#!/usr/bin/env python
"""Benchmark: wav segments/sec through the batched device feature graph,
against the CPU (NumPy/SciPy, librosa-equivalent) per-clip pipeline — the
north-star metric of BASELINE.json (the reference publishes no wall-clock
numbers; its librosa stack runs ~1 clip/s/core, measured fresh here).

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
BASELINE_CLIPS = 4


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

    # --- device path: one jitted graph, chunked batches.
    import jax.numpy as jnp
    from tpu_breath.features import _extract_jit

    def run_all() -> None:
        out = None
        for lo in range(0, N_CLIPS, CHUNK):
            out = _extract_jit(jnp.asarray(wavs[lo:lo + CHUNK]),
                               DEFAULT_FEATURES)
        out[0].block_until_ready()

    run_all()  # compile + warmup
    t0 = time.perf_counter()
    run_all()
    tpu_rate = N_CLIPS / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "feature extraction throughput (9-ch spectrogram stack + 36 scalars per 1s wav clip)",
        "value": round(tpu_rate, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
