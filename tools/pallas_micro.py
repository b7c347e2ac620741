import sys, os, time, glob, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
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
    print(f"{name:34s} {B/dt:9.1f} clips/s ({dt*1000:.0f} ms)")

def mk(kern, out_cols=128, c=64):
    def f(y):
        s = jnp.abs(y)  # [128, 16000]
        out = pl.pallas_call(
            kern,
            grid=(s.shape[0] // c,),
            in_specs=[pl.BlockSpec((c, s.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((c, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((s.shape[0], out_cols), jnp.float32),
            interpret=False,
        )(s)
        return out
    return f

def k_copy(s_ref, o_ref):
    o_ref[:] = jnp.max(s_ref[:], axis=1, keepdims=True) * jnp.ones((1, 128), jnp.float32)

def k_12max_fori(s_ref, o_ref):
    s = s_ref[:]
    def body(i, carry):
        sc, acc = carry
        m = jnp.max(sc, axis=1, keepdims=True)
        sc = jnp.where(sc >= m, -jnp.inf, sc)
        return sc, acc + m
    _, acc = lax.fori_loop(0, 12, body, (s, jnp.zeros((s.shape[0], 1), jnp.float32)))
    o_ref[:] = acc * jnp.ones((1, 128), jnp.float32)

def k_12max_unroll(s_ref, o_ref):
    s = s_ref[:]
    acc = jnp.zeros((s.shape[0], 1), jnp.float32)
    for i in range(12):
        m = jnp.max(s, axis=1, keepdims=True)
        s = jnp.where(s >= m, -jnp.inf, s)
        acc = acc + m
    o_ref[:] = acc * jnp.ones((1, 128), jnp.float32)

timed("pallas 1 max (baseline)", mk(k_copy))
timed("pallas 12max fori", mk(k_12max_fori))
timed("pallas 12max unrolled", mk(k_12max_unroll))

def xla_12max(y):
    s = jnp.abs(y)
    def body(i, carry):
        sc, acc = carry
        m = jnp.max(sc, axis=1, keepdims=True)
        sc = jnp.where(sc >= m, -jnp.inf, sc)
        return sc, acc + m
    _, acc = lax.fori_loop(0, 12, body, (s, jnp.zeros((s.shape[0], 1), jnp.float32)))
    return acc
timed("XLA 12max fori", xla_12max)
