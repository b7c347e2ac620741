import sys, os, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.features import extract_features
from tpu_breath.data import wav as wav_io

paths = sorted(glob.glob("/root/reference/input/*/*.wav"))[:2048]
x = jnp.asarray(wav_io.load_wav_batch(paths))
B = 2048

for CH in (256, 512):
    def g(w):
        c = w.reshape(B // CH, CH, -1)
        def one(y):
            f, s = extract_features(y, SPEC)
            return jnp.sum(f) + jnp.sum(s)
        return jnp.sum(lax.map(one, c))
    j = jax.jit(g)
    t0 = time.perf_counter(); float(j(x)); comp = time.perf_counter() - t0
    t0 = time.perf_counter(); float(j(x))
    dt = time.perf_counter() - t0
    print(f"chunk {CH:5d}: {B/dt:9.1f} clips/s ({dt*1000:.0f} ms) compile {comp:.0f}s", flush=True)
