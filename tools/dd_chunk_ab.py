"""A/B the compensated-GEMM slice width for the gammatone channel.

matmul_dd accumulates `chunk`-wide MXU slices in double-float across a
lax.scan; every iteration round-trips the [B, T, 2F] hi/lo carries through
HBM, so widening the slice cuts that traffic ~linearly while growing the
within-slice |term| sum (and so the plain-f32 within-slice error) by the
same factor. This measures, per width: wall time of the FULL gammatone
channel over 2048 clips (production 128-clip chunking, warm,
checksum-forced) and parity vs the float64 oracle on a 32-clip sample.

Usage: PYTHONPATH=. python tools/dd_chunk_ab.py [widths...]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, dd
from tpu_breath.baseline import feature_np
from tpu_breath.data import wav as wav_io

B, CHUNK, N_ORACLE = 2048, 128, 32


def channel(y, width: int):
    """The production gammatone block (features.py) at the given dd width."""
    gt_fb = jnp.asarray(spectral.mel_matrix(SPEC.sr, SPEC.n_fft,
                                            SPEC.n_gammatone))
    gt_mag = spectral.stft_mag_dd(y, SPEC.n_fft, SPEC.hop_length, chunk=width)
    gt = dd.log1p_cr(dd.matmul_dd(gt_mag.swapaxes(-1, -2), gt_fb.T,
                                  chunk=width).swapaxes(-1, -2))
    z = spectral.znorm(gt, axes=(-2, -1))
    return spectral.pad_freq_min(spectral.pad_time_min(z, SPEC.t_fixed),
                                 SPEC.n_mels)


def main() -> None:
    widths = [int(w) for w in sys.argv[1:]] or [8, 16, 32, 64]
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:B]
    wavs = wav_io.load_wav_batch(paths)
    x = jnp.asarray(wavs)

    oracle = np.stack([feature_np.process_clip(wavs[i], SPEC)["gammatone"]
                       for i in range(N_ORACLE)])

    for w in widths:
        f = jax.jit(lambda yy, w=w: jnp.sum(
            lax.map(lambda c: jnp.sum(channel(c, w)),
                    yy.reshape(B // CHUNK, CHUNK, -1))))
        t0 = time.perf_counter(); float(f(x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f(x))
        dt = time.perf_counter() - t0
        dev = np.asarray(jax.jit(lambda yy, w=w: channel(yy, w))(x[:N_ORACLE]))
        err = float(np.abs(dev - oracle).max())
        print(f"width {w:3d}: {dt * 1000:7.1f} ms/2048 clips  "
              f"max|err| {err:.2e}  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
