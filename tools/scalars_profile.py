import time, glob
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import scalars as scalar_ops, peaks
from tpu_breath.data import wav as wav_io

paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:2048]
x = jnp.asarray(wav_io.load_wav_batch(paths))
B, CH = 2048, 128

def timed(name, f):
    def g(w):
        c = w.reshape(B // CH, CH, -1)
        return jnp.sum(lax.map(lambda y: jnp.sum(f(y)), c))
    j = jax.jit(g)
    float(j(x)); t0 = time.perf_counter(); float(j(x))
    dt = time.perf_counter() - t0
    print(f"{name:24s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

def peaks_only(y):
    env = jnp.abs(y)  # stand-in envelope, same shapes
    fn = jax.vmap(lambda e: jnp.stack(peaks.find_peaks_stats(
        e, jnp.mean(e), SPEC.sr // 10)))
    return fn(env)

timed("find_peaks_stats", peaks_only)
timed("scalars full", lambda y: scalar_ops.extract_scalars(
    y, SPEC.sr, SPEC.hop_length, SPEC.n_fft, 128))
