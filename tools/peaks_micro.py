import time, glob
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from tpu_breath.ops import peaks
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

timed("local_maxima", lambda y: jax.vmap(peaks.local_maxima)(jnp.abs(y)).astype(jnp.float32))
timed("prefix_max x2", lambda y: peaks._prefix_max(jnp.abs(y)) + peaks._prefix_max(jnp.abs(y), reverse=True))

def strict_localmax(y):
    e = jnp.abs(y)
    inner = e[..., 1:-1]
    m = (inner > e[..., :-2]) & (inner > e[..., 2:])
    return jnp.pad(m, [(0,0)]*(e.ndim-1)+[(1,1)]).astype(jnp.float32)
timed("strict local max (old)", strict_localmax)

def scan_only(y):
    e = jnp.abs(y)
    def one(ev):
        scores = jnp.where(ev > jnp.mean(ev), ev, -jnp.inf)
        pos = jnp.arange(ev.shape[-1])
        def body(a, _):
            i = jnp.argmax(a)
            v = a[i]
            take = jnp.isfinite(v)
            a = jnp.where(jnp.abs(pos - i) < 1600, -jnp.inf, a)
            return a, (take, jnp.where(take, v, 0.0))
        _, (k, vv) = lax.scan(body, scores, None, length=12)
        return jnp.sum(vv)
    return jax.vmap(one)(e)
timed("12-round argmax scan", scan_only)
