import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, chroma as ch_ops, cqt as cqt_ops
from tpu_breath.features import extract_features
from tpu_breath.data import wav as wav_io
import glob

paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:2048]
wavs = wav_io.load_wav_batch(paths)
x = jnp.asarray(wavs)
B, CH = 2048, 128
SR, HOP = SPEC.sr, SPEC.hop_length

def timed(name, fn):
    j = jax.jit(fn)
    float(j(x))  # compile+warm
    t0 = time.perf_counter()
    v = float(j(x))
    dt = time.perf_counter() - t0
    print(f"{name:28s} {B/dt:9.1f} clips/s  ({dt*1000:.0f} ms)")
    return dt

def chunked(f):
    def g(w):
        c = w.reshape(B // CH, CH, -1)
        return jnp.sum(lax.map(lambda y: jnp.sum(f(y)), c))
    return g

def tuning_only(y):
    s = spectral.stft_mag(y, 2048, HOP)[..., ::2]
    fn = jax.vmap(lambda s1: ch_ops.estimate_tuning_index(s1, SR, 2048, 36))
    return fn(s).astype(jnp.float32)

def cqt_only(y):
    idx = jnp.full(y.shape[:-1], 50, jnp.int32)
    return cqt_ops.cqt_mag_multirate(y, idx, SR, HOP, SPEC.cqt_fmin, 36, 7)

def cens_full(y):
    return cqt_ops.chroma_cens(y, SR, HOP, SPEC.cqt_fmin)

def cqt_direct(y):
    return cqt_ops.cqt_mag(y, SR, HOP, SPEC.cqt_fmin, 252, 36)

def full(y):
    f, s = extract_features(y, SPEC)
    return jnp.sum(f) + jnp.sum(s)

timed("full feature graph", chunked(lambda y: full(y)))
timed("tuning estimate only", chunked(tuning_only))
timed("multirate CQT only", chunked(cqt_only))
timed("cens full (tuning+cqt)", chunked(cens_full))
timed("direct CQT (old path)", chunked(cqt_direct))
