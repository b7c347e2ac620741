import sys, os, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.ops import peaks, dft
from tpu_breath.data import wav as wav_io

paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:2048]
x = jnp.asarray(wav_io.load_wav_batch(paths))
B, CH, SR = 2048, 128, 16000

def timed(name, f):
    def g(w):
        c = w.reshape(B // CH, CH, -1)
        return jnp.sum(lax.map(lambda y: jnp.sum(jnp.stack(f(y))), c))
    j = jax.jit(g)
    float(j(x)); t0 = time.perf_counter(); float(j(x))
    dt = time.perf_counter() - t0
    print(f"{name:30s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

def fp_xla(y):
    env = jnp.abs(y)
    return peaks.find_peaks_stats_batched(env, jnp.mean(env, -1), SR // 10,
                                          use_pallas=False)

def fp_pallas(y):
    env = jnp.abs(y)
    return peaks.find_peaks_stats_batched(env, jnp.mean(env, -1), SR // 10,
                                          use_pallas=True)

# on-chip parity first (real hilbert envelopes)
env = jnp.abs(x[:128])
h = jnp.mean(env, -1)
a = jax.jit(lambda e, hh: jnp.stack(peaks.find_peaks_stats_batched(e, hh, SR // 10, use_pallas=False)))(env, h)
b = jax.jit(lambda e, hh: jnp.stack(peaks.find_peaks_stats_batched(e, hh, SR // 10, use_pallas=True)))(env, h)
d = float(jnp.max(jnp.abs(a - b)))
print("on-chip parity max diff:", d)

timed("find_peaks XLA", fp_xla)
timed("find_peaks PALLAS", fp_pallas)
