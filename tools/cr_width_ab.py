"""A/B the round-once |STFT| (stft_mag_cr) dd slice width.

matmul_dd_pair scans `chunk`-wide MXU slices, round-tripping the double-float
carries through HBM each iteration; wider slices cut that traffic linearly
but grow the within-slice f32 accumulation term (dd_chunk_ab measured the
gammatone CHANNEL error flat across widths — this measures the quantities
the width actually gates: the |S| error itself and the tuning-flip count,
since the flip fix (PARITY.md round-3) rests on ~1e-7-absolute |S|).

Per width: wall time of stft_mag_cr over 2048 clips (warm, production
128-clip chunking, checksum-forced), |S| max abs err vs the float64 oracle
(64 clips), and bpo12 tuning flips on the parity sweep's 500-clip sample
(oracle tunings computed once, reused across widths).

Usage: python tools/cr_width_ab.py [widths...]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, CHUNK, N_S_ERR, N_FLIP = 2048, 128, 64, 500


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.config import DEFAULT_FEATURES as spec, Paths
    from tpu_breath.data import dataset as ds
    from tpu_breath.data import wav as wav_io
    from tpu_breath.baseline import dsp_np
    from tpu_breath.ops import spectral as sp_ops, chroma as ch_ops

    widths = [int(w) for w in sys.argv[1:]] or [8, 32, 64]

    # same corpus + sample as tools/parity_sweep.py (seed 0)
    paths = Paths(root="input")
    train_df, test_df = ds.load_frames(paths)
    wav_paths = [os.path.join(paths.train_audio_dir,
                              ds.train_wav_name(r["ID"]))
                 for _, r in train_df.iterrows()]
    wav_paths += [os.path.join(paths.test_audio_dir,
                               ds.test_wav_name(r["ID"]))
                  for _, r in test_df.iterrows()]
    wavs = wav_io.load_wav_batch(wav_paths, spec.expected_len)
    rng = np.random.default_rng(0)
    sample = rng.choice(len(wav_paths), size=N_FLIP, replace=False)

    # oracle side, width-independent: f32-rounded f64 |STFT| + tuning
    print("computing oracle tunings (one-time)...", flush=True)
    t0 = time.perf_counter()
    oracle_t12 = np.empty(N_FLIP)
    oracle_S = []
    for j, i in enumerate(sample):
        S64 = np.abs(dsp_np.stft(wavs[i].astype(np.float64), spec.n_fft,
                                 spec.hop_length))
        if j < N_S_ERR:
            oracle_S.append(S64.astype(np.float32))
        oracle_t12[j] = dsp_np.estimate_tuning_from_S(
            S64.astype(np.float32), spec.sr, spec.n_fft, 12)
    oracle_S = np.stack(oracle_S)
    print(f"  oracle done in {time.perf_counter() - t0:.0f}s", flush=True)

    xt = jnp.asarray(wavs[:B] if len(wavs) >= B else
                     np.tile(wavs, (-(-B // len(wavs)), 1))[:B])

    for w in widths:
        # -- wall time, production chunking
        f = jax.jit(lambda yy, w=w: jnp.sum(
            lax.map(lambda c: jnp.sum(
                sp_ops.stft_mag_cr(c, spec.n_fft, spec.hop_length, chunk=w)),
                yy.reshape(B // CHUNK, CHUNK, -1))))
        t0 = time.perf_counter(); float(f(xt))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f(xt))
        dt = time.perf_counter() - t0

        # -- |S| error vs oracle
        mag = jax.jit(lambda y, w=w: sp_ops.stft_mag_cr(
            y, spec.n_fft, spec.hop_length, chunk=w))
        S_d = np.asarray(mag(jnp.asarray(wavs[sample[:N_S_ERR]])))
        s_err = float(np.abs(S_d - oracle_S).max())
        n_ulp = int((S_d != oracle_S).sum())

        # -- tuning flips on the 500-clip sample
        t12 = jax.jit(lambda y, w=w: ch_ops.estimate_tuning(
            sp_ops.stft_mag_cr(y, spec.n_fft, spec.hop_length, chunk=w),
            spec.sr, spec.n_fft, 12))
        flips = sum(
            int(abs(float(t12(jnp.asarray(wavs[i]))) - oracle_t12[j]) > 1e-6)
            for j, i in enumerate(sample))

        print(f"width {w:3d}: {dt * 1e3:7.1f} ms/2048  |S| max err {s_err:.2e}"
              f"  ({n_ulp}/{oracle_S.size} entries differ)  "
              f"flips {flips}/{N_FLIP}  (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
