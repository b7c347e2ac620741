import time, glob
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, cepstral, lpc as lpc_ops, rhythm, scalars as scalar_ops
from tpu_breath.data import wav as wav_io

paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:2048]
wavs = wav_io.load_wav_batch(paths)
x = jnp.asarray(wavs)
B, CH = 2048, 128
SR, HOP, NFFT = SPEC.sr, SPEC.hop_length, SPEC.n_fft

def timed(name, f):
    def g(w):
        c = w.reshape(B // CH, CH, -1)
        return jnp.sum(lax.map(lambda y: jnp.sum(f(y)), c))
    j = jax.jit(g)
    float(j(x)); t0 = time.perf_counter(); float(j(x))
    dt = time.perf_counter() - t0
    print(f"{name:24s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

def mels(y):
    m = spectral.melspectrogram(y, SR, n_fft=NFFT, hop_length=HOP, n_mels=128, fmax=SPEC.fmax)
    db = spectral.power_to_db(m, ref_max=True)
    return db + cepstral.delta(db, 1) + cepstral.delta(db, 2)

def mfccs(y):
    mf = cepstral.mfcc(y, SR, SPEC.n_mfcc, HOP, NFFT)
    return mf + cepstral.delta(mf, 1) + cepstral.delta(mf, 2)

def lpcs(y):
    return lpc_ops.lpc_features(y, SPEC.n_lpc, SR)

def tempo(y):
    o = rhythm.onset_strength(y, SR, HOP)
    return rhythm.tempogram(o, SPEC.tempogram_win_length)

def scal(y):
    return scalar_ops.extract_scalars(y, SR, HOP, NFFT, 128)

timed("mel+deltas", mels)
timed("mfcc+deltas", mfccs)
timed("lpc", lpcs)
timed("tempogram", tempo)
timed("scalars", scal)
