import sys, os, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, chroma as ch_ops, cqt as cqt_ops, scalars as scalar_ops, rhythm
from tpu_breath.features import extract_features
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
    print(f"{name:26s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

def full(y):
    f, s = extract_features(y, SPEC)
    return jnp.sum(f) + jnp.sum(s)

def tuning_only(y):
    s = spectral.stft_mag(y, 2048, HOP)[..., ::2]
    return jax.vmap(lambda s1: ch_ops.estimate_tuning_index(s1, SR, 2048, 36))(s).astype(jnp.float32)

def cens_full(y):
    return cqt_ops.chroma_cens(y, SR, HOP, SPEC.cqt_fmin)

def chroma_stft_only(y):
    return ch_ops.chroma_stft(spectral.stft_mag(y, SPEC.n_fft, HOP), SR)

timed("full feature graph", full)
timed("tuning estimate (bpo36)", tuning_only)
timed("cens full", cens_full)
timed("chroma_stft (incl tuning)", chroma_stft_only)
timed("scalars full", lambda y: scalar_ops.extract_scalars(y, SR, HOP, SPEC.n_fft, 128))
timed("tempogram", lambda y: rhythm.tempogram(rhythm.onset_strength(y, SR, HOP), SPEC.tempogram_win_length))
