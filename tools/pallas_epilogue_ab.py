"""On-chip A/B: the SURVEY §7.1 fused epilogue (filterbank·|STFT| + log1p +
z-norm) as a Pallas kernel vs the XLA subgraph, in both the production
double-float numerics and the plain-f32 variant the survey originally named.

Measures per 2048 clips in 128-clip chunks (the production chunking), warm,
checksum-forced. Records the verdict for RESULTS.md.

Usage: PYTHONPATH=. python tools/pallas_epilogue_ab.py
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
from tpu_breath.ops import spectral, dd
from tpu_breath.ops.pallas import epilogue_kernel
from tpu_breath.data import wav as wav_io

B, CH = 2048, 128


def main() -> None:
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:B]
    x = jnp.asarray(wav_io.load_wav_batch(paths))
    fb = jnp.asarray(spectral.mel_matrix(SPEC.sr, SPEC.n_fft,
                                         SPEC.n_gammatone))

    def stft(y):
        return spectral.stft_mag_dd(y, SPEC.n_fft, SPEC.hop_length)

    def xla_dd(m):
        gt = dd.log1p_cr(dd.matmul_dd(m.swapaxes(-1, -2), fb.T
                                      ).swapaxes(-1, -2))
        return spectral.znorm(gt, axes=(-2, -1))

    def xla_plain(m):
        gt = jnp.log1p(jnp.einsum("gf,bft->bgt", fb, m,
                                  precision=spectral.MM_PRECISION))
        return spectral.znorm(gt, axes=(-2, -1))

    basis = jnp.asarray(spectral._framedft_consts(SPEC.n_fft, "hann"))
    n_frames = 1 + 16000 // SPEC.hop_length

    def full_kernel(y):
        yp = jnp.pad(y, ((0, 0), (SPEC.n_fft // 2, SPEC.n_fft // 2)))
        frames = spectral.frame_signal(yp, SPEC.n_fft, SPEC.hop_length,
                                       n_frames)
        return epilogue_kernel.fused_gammatone(frames, basis, fb)

    variants = {
        "xla dd (production)": xla_dd,
        "pallas dd epilogue": lambda m: epilogue_kernel.fused_epilogue(m, fb),
        "xla plain": xla_plain,
        "pallas plain": lambda m: epilogue_kernel.fused_epilogue(
            m, fb, plain=True),
        "stft_dd alone (input)": lambda m: m,
        "pallas full channel": None,  # replaces the stft too
    }
    for name, f in variants.items():
        if f is None:
            def g(w):
                c = w.reshape(B // CH, CH, -1)
                return jnp.sum(lax.map(lambda y: jnp.sum(full_kernel(y)), c))
        else:
            def g(w, f=f):
                c = w.reshape(B // CH, CH, -1)
                return jnp.sum(lax.map(lambda y: jnp.sum(f(stft(y))), c))

        j = jax.jit(g)
        float(j(x))  # compile + warm
        t0 = time.perf_counter()
        float(j(x))
        dt = time.perf_counter() - t0
        print(f"{name:24s} {B / dt:9.1f} clips/s ({dt * 1000:.0f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
