import sys, os, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, dft, scalars as scalar_ops, peaks
from tpu_breath.data import wav as wav_io

paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:2048]
x = jnp.asarray(wav_io.load_wav_batch(paths))
B, CH = 2048, 128
SR, HOP = SPEC.sr, SPEC.hop_length

def timed(name, f):
    def g(w):
        c = w.reshape(B // CH, CH, -1)
        return jnp.sum(lax.map(lambda y: jnp.sum(f(y)), c))
    j = jax.jit(g)
    float(j(x)); t0 = time.perf_counter(); float(j(x))
    dt = time.perf_counter() - t0
    print(f"{name:28s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

timed("stft2048 mag", lambda y: spectral.stft_mag(y, 2048, HOP))
timed("stft512 mag", lambda y: spectral.stft_mag(y, 512, HOP))
timed("hilbert envelope", lambda y: dft.hilbert_envelope(y))
timed("autocorr_full 16000", lambda y: dft.autocorr_full(y))
timed("find_peaks via env=|y|", lambda y: jax.vmap(lambda e: jnp.stack(peaks.find_peaks_stats(e, jnp.mean(e), SR // 10)))(jnp.abs(y)))
