#!/usr/bin/env python
"""Benchmark: wav segments/sec through (a) the batched device feature graph
and (b) the FUSED wav->feature->train step (BASELINE.json's headline metric:
"wav segments/sec (feature+train step)"), against the CPU (NumPy/SciPy,
librosa-equivalent) per-clip pipeline. Also reports single-chip MFU for both
graphs from XLA's compiled cost analysis.

Measurement notes for this backend (axon relay to one v5e chip):
- block_until_ready() is a no-op through the relay, so completion is forced
  by materializing a checksum scalar on host.
- One device roundtrip costs ~35 ms, so work is batched inside jitted graphs
  and dispatched asynchronously with one final sync.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import glob
import json
import sys
import time

import numpy as np

N_CLIPS = 2048
CHUNK = 128
TRAIN_BATCH = 512
TRAIN_STEPS = 8
# >=20 clips so the CPU-oracle denominator isn't hostage to per-clip variance
# (tuning-estimation cost varies with peak count)
BASELINE_CLIPS = 24
V5E_PEAK_FLOPS = 197e12  # bf16 peak, one v5e chip


def _load_clips(n: int) -> np.ndarray:
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))
    if paths:
        from tpu_breath.data import wav as wav_io
        reps = -(-n // len(paths))
        return wav_io.load_wav_batch((paths * reps)[:n])
    rng = np.random.default_rng(0)
    return (rng.standard_normal((n, 16000)) * 0.05).astype(np.float32)


def _flops(jitted, *args) -> float | None:
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def main() -> None:
    wavs = _load_clips(N_CLIPS)

    # --- CPU baseline: the per-clip NumPy/SciPy pipeline (same math stack
    # librosa dispatches to), single core, like the reference's precompute.
    from tpu_breath.baseline import feature_np
    from tpu_breath.config import DEFAULT_FEATURES, CNN8_TRAIN
    t0 = time.perf_counter()
    for i in range(BASELINE_CLIPS):
        feature_np.process_clip(wavs[i], DEFAULT_FEATURES)
    cpu_rate = BASELINE_CLIPS / (time.perf_counter() - t0)

    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.features import extract_features

    # --- (a) feature-only: all chunks inside one jitted graph; a checksum
    # scalar forces completion of every output.
    @jax.jit
    def sweep(w):
        chunks = w.reshape(N_CLIPS // CHUNK, CHUNK, -1)

        def one(c):
            f, s = extract_features(c, DEFAULT_FEATURES)
            return jnp.sum(f) + jnp.sum(s)

        return jnp.sum(lax.map(one, chunks))

    x = jnp.asarray(wavs)
    feat_flops = _flops(sweep, x)
    float(sweep(x))  # compile + warmup
    t0 = time.perf_counter()
    checksum = float(sweep(x))
    feat_dt = time.perf_counter() - t0
    feat_rate = N_CLIPS / feat_dt
    assert np.isfinite(checksum)
    feat_mfu = (feat_flops / feat_dt / V5E_PEAK_FLOPS
                if feat_flops else None)

    # --- (b) fused wav->feature->train step (the headline): one donated jit
    # graph per step; dispatch TRAIN_STEPS steps asynchronously, sync once.
    from tpu_breath.augment import Batch
    from tpu_breath.models.cnn8 import CNN8
    from tpu_breath.train import loop as train_loop

    cfg = type(CNN8_TRAIN)(**{**CNN8_TRAIN.__dict__,
                              "batch_size": TRAIN_BATCH})
    model = CNN8(num_scalar_features=DEFAULT_FEATURES.n_scalars)
    labels = jnp.asarray(np.tile([0.0, 1.0], N_CLIPS // 2))
    sf, ss = jax.jit(lambda w: extract_features(w, DEFAULT_FEATURES))(x[:2])
    sample = Batch(sf, ss, labels[:2])
    state, tx, _ = train_loop.create_state(
        model, jax.random.PRNGKey(0), cfg,
        steps_per_epoch=N_CLIPS // TRAIN_BATCH, sample_batch=sample)
    step = train_loop.make_train_step(model, tx, cfg,
                                      fused_spec=DEFAULT_FEATURES,
                                      fused_chunk=CHUNK)
    scals_dummy = jnp.zeros((N_CLIPS, 0), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), TRAIN_STEPS)
    use_aug = jnp.asarray(True)

    def run_steps(state):
        stats = None
        for s in range(TRAIN_STEPS):
            idx = jnp.asarray(np.arange(TRAIN_BATCH) + (s * TRAIN_BATCH)
                              % (N_CLIPS - TRAIN_BATCH))
            state, stats = step(state, x, scals_dummy, labels, idx,
                                keys[s], use_aug)
        return state, float(stats["loss"])  # one host sync

    state, _ = run_steps(state)  # compile + warmup
    t0 = time.perf_counter()
    state, loss = run_steps(state)
    fused_dt = time.perf_counter() - t0
    fused_rate = TRAIN_STEPS * TRAIN_BATCH / fused_dt
    assert np.isfinite(loss)

    step_flops = _flops(step, state, x, scals_dummy, labels,
                        jnp.arange(TRAIN_BATCH), keys[0], use_aug)
    fused_mfu = (step_flops * TRAIN_STEPS / fused_dt / V5E_PEAK_FLOPS
                 if step_flops else None)

    # --- (c) the same fused step on the VGG flagship (VERDICT r3 #2:
    # report VGG fused MFU, not just CNN8's).
    from tpu_breath.config import VGG_TRAIN
    from tpu_breath.models.vgg import VGG
    vcfg = type(VGG_TRAIN)(**{**VGG_TRAIN.__dict__,
                              "batch_size": TRAIN_BATCH})
    vmodel = VGG(num_scalar_features=DEFAULT_FEATURES.n_scalars)
    vstate, vtx, _ = train_loop.create_state(
        vmodel, jax.random.PRNGKey(0), vcfg,
        steps_per_epoch=N_CLIPS // TRAIN_BATCH, sample_batch=sample)
    vstep = train_loop.make_train_step(vmodel, vtx, vcfg,
                                       fused_spec=DEFAULT_FEATURES,
                                       fused_chunk=CHUNK)

    def run_vsteps(vstate):
        stats = None
        for s in range(TRAIN_STEPS):
            idx = jnp.asarray(np.arange(TRAIN_BATCH) + (s * TRAIN_BATCH)
                              % (N_CLIPS - TRAIN_BATCH))
            vstate, stats = vstep(vstate, x, scals_dummy, labels, idx,
                                  keys[s], use_aug)
        return vstate, float(stats["loss"])

    vstate, _ = run_vsteps(vstate)  # compile + warmup
    t0 = time.perf_counter()
    vstate, vloss = run_vsteps(vstate)
    vgg_dt = time.perf_counter() - t0
    vgg_rate = TRAIN_STEPS * TRAIN_BATCH / vgg_dt
    assert np.isfinite(vloss)
    vstep_flops = _flops(vstep, vstate, x, scals_dummy, labels,
                         jnp.arange(TRAIN_BATCH), keys[0], use_aug)
    vgg_mfu = (vstep_flops * TRAIN_STEPS / vgg_dt / V5E_PEAK_FLOPS
               if vstep_flops else None)

    # vs_baseline pairs with "value": fused clips/s over the CPU oracle's
    # feature-only clips/s — conservative, since the fused step does strictly
    # more work per clip (features + fwd/bwd/AdamW) than the oracle. The
    # feature-only-vs-CPU ratio (the BASELINE.json >=50x north star) is
    # reported separately as feature_vs_cpu_baseline.
    print(json.dumps({
        "metric": "fused wav->feature->train-step throughput (9-ch spectrogram stack + 36 scalars + CNN8 fwd/bwd/AdamW per 1s wav clip)",
        "value": round(fused_rate, 2),
        "unit": "clips/s",
        "vs_baseline": round(fused_rate / cpu_rate, 2),
        "feature_only_clips_per_s": round(feat_rate, 2),
        "feature_vs_cpu_baseline": round(feat_rate / cpu_rate, 2),
        "cpu_oracle_clips_per_s": round(cpu_rate, 3),
        "cpu_baseline_clips": BASELINE_CLIPS,
        "feature_mfu": round(feat_mfu, 4) if feat_mfu else None,
        "fused_train_mfu": round(fused_mfu, 4) if fused_mfu else None,
        "vgg_fused_clips_per_s": round(vgg_rate, 2),
        "vgg_fused_train_mfu": round(vgg_mfu, 4) if vgg_mfu else None,
    }))


if __name__ == "__main__":
    sys.exit(main())
