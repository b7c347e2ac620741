"""On-chip A/B of feature-graph restructurings (round 4, VERDICT #1/#2):

A. stft2048: the generic complex Cooley-Tukey (zero imaginary input, two
   transpose relayouts) vs ONE dense window-folded GEMM on the MXU.
B. tempogram's 1024-pt rdft: same question at n=1024.
C. multirate CQT: per-octave full 512-pt STFT + [36,257] basis projection
   vs tuning-gathered TIME-DOMAIN kernels (basis @ DFT folded into one
   f64-built constant), one batched GEMM per octave.
D. tuning-estimate sub-stage attribution (piptrack / masked median /
   histogram) for both the bpo-36 (CENS) and bpo-12 (chroma_stft) flavors.

Each timed over 2048 clips in production 128-clip chunks inside one jit,
checksum-forced (block_until_ready is a no-op through the relay).
Errors vs the float64 NumPy oracle on a 16-clip sample.
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, CHUNK, NERR = 2048, 128, 16


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.config import DEFAULT_FEATURES as spec
    from tpu_breath.data import wav as wav_io
    from tpu_breath.baseline import dsp_np
    from tpu_breath.ops import spectral, chroma as ch_ops, cqt as cqt_ops
    from tpu_breath.ops import rhythm, dft

    sr, hop, n_fft = spec.sr, spec.hop_length, spec.n_fft
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:B]
    wavs = wav_io.load_wav_batch(paths, spec.expected_len)
    x = jnp.asarray(wavs)

    def timed(name, f):
        j = jax.jit(lambda w: jnp.sum(
            lax.map(lambda c: jnp.sum(f(c)), w.reshape(B // CHUNK, CHUNK, -1))))
        t0 = time.perf_counter(); float(j(x)); c_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(j(x)); dt = time.perf_counter() - t0
        print(f"{name:34s} {dt*1e3:7.1f} ms/2048  ({B/dt:8.0f} clips/s)"
              f"  [compile {c_s:.0f}s]", flush=True)
        return dt

    # ---------------- A. stft2048 ----------------
    import functools

    @functools.lru_cache(maxsize=None)
    def _direct_consts(n):
        return spectral._framedft_consts(n, "hann")

    def stft2048_direct(y):
        n = y.shape[-1]
        n_frames = 1 + n // hop
        pad = [(0, 0)] * (y.ndim - 1) + [(1024, 1024)]
        frames = spectral.frame_signal(jnp.pad(y, pad), 2048, hop, n_frames)
        basis = jnp.asarray(_direct_consts(2048))
        d = jnp.matmul(frames, basis, precision=lax.Precision.HIGHEST)
        re, im = d[..., :1025], d[..., 1025:]
        return jnp.sqrt(re * re + im * im).swapaxes(-1, -2)

    timed("stft2048 CT (current)", lambda y: spectral.stft_mag(y, 2048, hop))
    timed("stft2048 direct GEMM", stft2048_direct)

    # error vs f64 oracle
    s_ct = np.asarray(jax.jit(lambda y: spectral.stft_mag(y, 2048, hop))(x[:NERR]))
    s_dg = np.asarray(jax.jit(stft2048_direct)(x[:NERR]))
    s64 = np.stack([np.abs(dsp_np.stft(w.astype(np.float64), 2048, hop))
                    for w in wavs[:NERR]])
    print(f"  |S2048| max err vs f64: CT {np.abs(s_ct - s64).max():.3e}  "
          f"direct {np.abs(s_dg - s64).max():.3e}", flush=True)

    # ---------------- B. tempogram rdft(1024) ----------------
    timed("tempogram (current)", lambda y: rhythm.tempogram(
        rhythm.onset_strength(y, sr, hop), spec.tempogram_win_length))

    def tempogram_direct(y):
        onset_env = rhythm.onset_strength(y, sr, hop)
        win_length = spec.tempogram_win_length
        t = onset_env.shape[-1]
        pad_amt = win_length // 2
        pad = [(0, 0)] * (onset_env.ndim - 1) + [(pad_amt, pad_amt)]
        oe = jnp.pad(onset_env, pad, mode="linear_ramp", end_values=0.0)
        idx = np.arange(t)[:, None] + np.arange(win_length)[None, :]
        frames = oe[..., idx]
        win = jnp.asarray(dsp_np.hann(win_length, True).astype(np.float32))
        frames = frames * win
        C, S = dft._rdft_consts(1024)
        fp = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, 1024 - win_length)])
        re = jnp.matmul(fp, jnp.asarray(C), precision=lax.Precision.HIGHEST)
        im = jnp.matmul(fp, -jnp.asarray(S), precision=lax.Precision.HIGHEST)
        P = re * re + im * im
        M = jnp.asarray(rhythm._iac_matrix(1024, win_length))
        ac = jnp.matmul(P, M, precision=lax.Precision.HIGHEST).swapaxes(-1, -2)
        length = jnp.max(jnp.abs(ac), axis=-2, keepdims=True)
        length = jnp.where(length < np.finfo(np.float32).tiny, 1.0, length)
        return ac / length

    timed("tempogram direct-1024 GEMM", tempogram_direct)

    # ---------------- C. CQT fused time kernels ----------------
    n_oct, bpo = spec.cqt_n_octaves, spec.cqt_bins_per_octave

    @functools.lru_cache(maxsize=None)
    def _time_kernels():
        """[n_t, 2*bpo, 512]: per tuning, time-domain response kernels
        K[k, l] = sum_f basis[k, f] exp(-2pi i f l / n_fft), f64-built."""
        n_t = 100
        outs = []
        n_fft_b = None
        for ti in range(n_t):
            tau = -0.5 + ti * 0.01
            fmin_t = spec.cqt_fmin * 2.0 ** (tau / bpo)
            k = np.arange((n_oct - 1) * bpo, n_oct * bpo)
            freqs_top = fmin_t * 2.0 ** (k / bpo)
            fft_basis, nf = dsp_np._vqt_filter_fft(sr, freqs_top, bpo)
            lengths, _ = dsp_np.wavelet_lengths(freqs_top, sr,
                                                bins_per_octave=bpo)
            b = fft_basis / np.sqrt(lengths)[:, None]
            n_fft_b = nf
            E = np.exp(-2j * np.pi * np.outer(np.arange(nf // 2 + 1),
                                              np.arange(nf)) / nf)
            Kt = b @ E  # [bpo, nf] complex128
            outs.append(np.concatenate([Kt.real, Kt.imag], axis=0)
                        .astype(np.float32))
        return np.stack(outs), n_fft_b

    def cqt_fused(y, tuning_idx):
        K_all, nf = _time_kernels()
        K = jnp.asarray(K_all)[tuning_idx]  # [..., 2*bpo, nf]
        octaves = []
        my_y, my_hop = y, hop
        taps = cqt_ops._vqt_consts(sr, spec.cqt_fmin, bpo, n_oct)[3]
        for o in range(n_oct):
            n = my_y.shape[-1]
            n_frames = 1 + n // my_hop
            pad = [(0, 0)] * (y.ndim - 1) + [(nf // 2, nf // 2)]
            frames = spectral.frame_signal(jnp.pad(my_y, pad), nf, my_hop,
                                           n_frames)
            resp = jnp.einsum("...tl,...kl->...kt", frames, K,
                              precision=lax.Precision.HIGHEST)
            rr, ri = resp[..., :bpo, :], resp[..., bpo:, :]
            octaves.append(jnp.sqrt(rr * rr + ri * ri))
            if o < n_oct - 1:
                my_hop //= 2
                my_y = cqt_ops.decimate2(my_y, taps)
        n_frames = min(oc.shape[-1] for oc in octaves)
        return jnp.concatenate([oc[..., :n_frames] for oc in octaves[::-1]],
                               axis=-2)

    rng = np.random.default_rng(0)
    tidx_np = rng.integers(0, 100, B).astype(np.int32)
    tidx = jnp.asarray(tidx_np)

    def timed_t(name, f):
        j = jax.jit(lambda w, ti: jnp.sum(lax.map(
            lambda c: jnp.sum(f(c[0], c[1])),
            (w.reshape(B // CHUNK, CHUNK, -1),
             ti.reshape(B // CHUNK, CHUNK)))))
        t0 = time.perf_counter(); float(j(x, tidx)); c_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(j(x, tidx)); dt = time.perf_counter() - t0
        print(f"{name:34s} {dt*1e3:7.1f} ms/2048  ({B/dt:8.0f} clips/s)"
              f"  [compile {c_s:.0f}s]", flush=True)

    timed_t("cqt multirate (current)",
            lambda y, ti: cqt_ops.cqt_mag_multirate(
                y, ti, sr, hop, spec.cqt_fmin, bpo, n_oct))
    timed_t("cqt fused time-kernels", cqt_fused)

    c_cur = np.asarray(jax.jit(lambda y, ti: cqt_ops.cqt_mag_multirate(
        y, ti, sr, hop, spec.cqt_fmin, bpo, n_oct))(x[:NERR], tidx[:NERR]))
    c_fus = np.asarray(jax.jit(cqt_fused)(x[:NERR], tidx[:NERR]))
    c64 = np.stack([dsp_np.vqt_multirate(
        w.astype(np.float64), sr, hop, spec.cqt_fmin, n_oct * bpo, bpo,
        tuning=-0.5 + ti * 0.01)
        for w, ti in zip(wavs[:NERR], tidx_np[:NERR])])
    print(f"  |CQT| max err vs f64: current {np.abs(c_cur - c64).max():.3e} "
          f" fused {np.abs(c_fus - c64).max():.3e}  peak {c64.max():.3f}",
          flush=True)

    # ---------------- D. tuning sub-stages ----------------
    for label, nf_t, sl in (("bpo36 [1025x32]", 2048, np.s_[..., ::2]),
                            ("bpo12 [257x63]", 512, np.s_[...])):
        def S_of(y, nf_t=nf_t, sl=sl):
            if nf_t == 2048:
                return spectral.stft_mag(y, 2048, hop)[sl]
            return spectral.stft_mag_cr(y, n_fft, hop)

        def pip_only(y):
            S = S_of(y)
            p, m = jax.vmap(lambda s: ch_ops.piptrack(s, sr, nf_t))(S)
            return p + m

        def pip_median(y):
            S = S_of(y)
            def one(s):
                p, m = ch_ops.piptrack(s, sr, nf_t)
                return ch_ops._masked_median(m, p > 0)
            return jax.vmap(one)(S)

        def full_tune(y, nf_t=nf_t):
            S = S_of(y)
            bpo_t = 36 if nf_t == 2048 else 12
            return jax.vmap(lambda s: ch_ops.estimate_tuning_index(
                s, sr, nf_t, bpo_t))(S).astype(jnp.float32)

        timed(f"tuning {label} S only", S_of)
        timed(f"tuning {label} +piptrack", pip_only)
        timed(f"tuning {label} +median", pip_median)
        timed(f"tuning {label} full", full_tune)


if __name__ == "__main__":
    main()
