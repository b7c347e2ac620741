"""Full-dataset parity sweep: the device feature graph vs the NumPy oracle
(VERDICT r1 #4).

Runs the batched device graph over ALL 5,000 clips (train + test), then
re-derives a random sample of clips with the per-clip oracle
(baseline/feature_np.process_clip) and reports per-channel error
distributions + the tuning-estimate flip rate. Appends a summary JSON to
PARITY_SWEEP.json (PARITY.md narrates the result).

Usage: PYTHONPATH=. python tools/parity_sweep.py [--n-oracle 200] [--seed 0]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-oracle", type=int, default=200,
                    help="clips to re-derive with the (slow) NumPy oracle")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--root", default="input")
    ap.add_argument("--out", default="PARITY_SWEEP.json")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore the feature cache (it may predate graph "
                         "numerics changes); run the device graph now")
    args = ap.parse_args()

    from tpu_breath.config import DEFAULT_FEATURES, Paths
    from tpu_breath.data import dataset as ds
    from tpu_breath.data import wav as wav_io
    from tpu_breath.baseline import feature_np, dsp_np

    spec = DEFAULT_FEATURES
    paths = Paths(root=args.root)
    train_df, test_df = ds.load_frames(paths)
    ids, wav_paths = [], []
    for _, row in train_df.iterrows():
        ids.append(row["ID"])
        wav_paths.append(os.path.join(paths.train_audio_dir,
                                      ds.train_wav_name(row["ID"])))
    for _, row in test_df.iterrows():
        ids.append(row["ID"])
        wav_paths.append(os.path.join(paths.test_audio_dir,
                                      ds.test_wav_name(row["ID"])))
    wavs = wav_io.load_wav_batch(wav_paths, spec.expected_len)
    print(f"{len(ids)} clips decoded")

    # ---- device side: full dataset through the jitted graph
    if not args.fresh and ds.FeatureStore.cache_exists(paths.feature_cache):
        store = ds.FeatureStore.load_cache(paths.feature_cache, mmap=False)
        assert store.ids == ids, "cache/index mismatch; rerun precompute"
        feats, scals = store.features, store.scalars
        print("device features from cache")
    else:
        from tpu_breath.features import extract_features_batched
        t0 = time.time()
        feats, scals = extract_features_batched(wavs, spec)
        print(f"device graph: {len(ids) / (time.time() - t0):.1f} clips/s")

    # ---- oracle side: random sample
    rng = np.random.default_rng(args.seed)
    sample = rng.choice(len(ids), size=min(args.n_oracle, len(ids)),
                        replace=False)
    per_channel = {name: [] for name in spec.channel_order}
    scalar_rel = []
    tuning12_flips, tuning36_flips = 0, 0
    flip_ties = []

    import jax
    import jax.numpy as jnp
    from tpu_breath.ops import spectral as sp_ops, chroma as ch_ops

    @jax.jit
    def device_tunings(y):
        # same S construction as the production graph (features.py): the
        # bpo12 estimate reads the round-once dd magnitude
        s512 = sp_ops.stft_mag_cr(y, spec.n_fft, spec.hop_length)
        t12 = ch_ops.estimate_tuning(s512, spec.sr, spec.n_fft, 12)
        s2048 = sp_ops.stft_mag(y, 2048, spec.hop_length)[..., ::2]
        t36 = ch_ops.estimate_tuning(s2048, spec.sr, 2048, 36)
        return t12, t36

    def tie_width(S_o, bpo, n_fft=None):
        """Oracle histogram's top1-top2 count gap for a flip post-mortem: a
        gap of 0 means the argmax was a pure tie-break, <=1 means one moved
        residual decides it (the only flips the ~1e-6 |S| noise can cause)."""
        pitches, mags = dsp_np.piptrack(S_o, spec.sr, n_fft or spec.n_fft)
        mask = pitches > 0
        thr = np.median(mags[mask]) if mask.any() else 0.0
        f = pitches[(mags >= thr) & mask]
        f = f[f > 0].astype(np.float32)
        q = np.float32(f.astype(np.float64) / 27.5)
        octs = np.float32(np.log2(q.astype(np.float64)))
        r = np.mod(np.float32(bpo) * octs, np.float32(1.0))
        r[r >= 0.5] -= np.float32(1.0)
        counts, _ = np.histogram(r, np.linspace(-0.5, 0.5, 101))
        top = np.sort(counts)[-2:]
        return int(top[1] - top[0])

    t0 = time.time()
    for j, i in enumerate(sample):
        y = wavs[i].astype(np.float64)
        out = feature_np.process_clip(wavs[i], spec)
        for c, name in enumerate(spec.channel_order):
            per_channel[name].append(float(np.max(np.abs(feats[i, c] - out[name]))))
        rel = np.abs(scals[i] - out["scalars"]) / np.maximum(
            np.abs(out["scalars"]), 1e-2)
        scalar_rel.append(float(rel.max()))
        # tuning flip accounting (device vs oracle estimate)
        stft_m = np.abs(dsp_np.stft(y, spec.n_fft, spec.hop_length))
        t12_o = dsp_np.estimate_tuning_from_S(stft_m, spec.sr, spec.n_fft, 12)
        t36_o = dsp_np.estimate_tuning_from_y(y, spec.sr, 36)
        t12_d, t36_d = map(float, device_tunings(jnp.asarray(wavs[i])))
        if abs(t12_d - t12_o) > 1e-6:
            tuning12_flips += 1
            flip_ties.append({"id": ids[i], "bpo": 12,
                              "t_oracle": float(t12_o),
                              "t_device": float(t12_d),
                              "tie_width": tie_width(stft_m, 12)})
        if abs(t36_d - t36_o) > 1e-6:
            tuning36_flips += 1
            # postmortem on the bpo36 (CQT/CENS) estimator too: its S is
            # |stft(y, 2048, 512)| (piptrack defaults; dsp_np
            # estimate_tuning_from_y), the device computes the same frames
            # as stft_mag(y, 2048, 256)[..., ::2]
            s2048_o = np.abs(dsp_np.stft(y, 2048, 512))
            flip_ties.append({"id": ids[i], "bpo": 36,
                              "t_oracle": float(t36_o),
                              "t_device": float(t36_d),
                              "tie_width": tie_width(s2048_o, 36,
                                                     n_fft=2048)})
        if (j + 1) % 50 == 0:
            rate = (j + 1) / (time.time() - t0)
            print(f"  oracle {j + 1}/{len(sample)} ({rate:.2f} clips/s)")

    def stats(v):
        v = np.asarray(v)
        return {"max": float(v.max()), "p99": float(np.percentile(v, 99)),
                "p50": float(np.percentile(v, 50)), "mean": float(v.mean())}

    report = {
        "n_total": len(ids),
        "n_oracle_sampled": int(len(sample)),
        "channel_max_abs_err": {k: stats(v) for k, v in per_channel.items()},
        "scalar_max_rel_err": stats(scalar_rel),
        "tuning_flip_rate_bpo12": tuning12_flips / len(sample),
        "tuning_flip_rate_bpo36": tuning36_flips / len(sample),
        "tuning_flips": flip_ties,
    }
    # Dataset-level bounds of the two documented deviations (PARITY.md §5/§5b),
    # measured by tools/deviation_sweep.py — folded in when available so this
    # file is the single parity artifact.
    dev_path = os.path.join(os.path.dirname(args.out) or ".",
                            "results", "deviation_sweep.json")
    if os.path.exists(dev_path):
        with open(dev_path) as f:
            report["documented_deviations"] = json.load(f)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
