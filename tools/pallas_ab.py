import sys, os, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.ops import spectral, chroma as ch_ops
from tpu_breath.ops.pallas.tuning_kernel import estimate_tuning_index_pallas
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
    print(f"{name:30s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

def tune_xla(y):
    s = spectral.stft_mag(y, 2048, HOP)[..., ::2]
    return jax.vmap(lambda s1: ch_ops.estimate_tuning_index(s1, SR, 2048, 36))(s).astype(jnp.float32)

def tune_pallas(y):
    s = spectral.stft_mag(y, 2048, HOP)[..., ::2]
    p, m = jax.vmap(lambda s1: ch_ops.piptrack(s1, SR, 2048))(s)
    return estimate_tuning_index_pallas(p, m, 36, False).astype(jnp.float32)

def pip_only(y):
    s = spectral.stft_mag(y, 2048, HOP)[..., ::2]
    p, m = jax.vmap(lambda s1: ch_ops.piptrack(s1, SR, 2048))(s)
    return jnp.sum(p) + jnp.sum(m)

# parity on chip first
s = spectral.stft_mag(x[:128], 2048, HOP)[..., ::2]
a = np.asarray(jax.jit(lambda s1: jax.vmap(lambda q: ch_ops.estimate_tuning_index(q, SR, 2048, 36))(s1))(s))
p, m = jax.jit(jax.vmap(lambda s1: ch_ops.piptrack(s1, SR, 2048)))(s)
b = np.asarray(estimate_tuning_index_pallas(p, m, 36, False))
print("on-chip parity:", "EQUAL" if np.array_equal(a, b) else f"MISMATCH {np.sum(a!=b)}/128")

timed("tuning XLA (full)", tune_xla)
timed("tuning PALLAS tail (full)", tune_pallas)
timed("piptrack only", pip_only)
