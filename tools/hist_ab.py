"""A/B: tuning-residual histogram as compare-reduce vs searchsorted+one-hot.

The estimate_tuning histogram (ops/chroma.py) counts 33k residuals/clip into
100 bins with a [101, N] >=-compare + shifted-AND + reduce (~202*N elementwise
ops). The candidate computes each residual's bin index ONCE with
jnp.searchsorted against the same adjusted f32 edges (log-time branchless
search, ~7*N) and counts with a [100, N] int equality (~100*N) — identical bin
assignment by construction, so the argmax (and every downstream tuning
constant) is bit-identical.

Usage: PYTHONPATH=. python tools/hist_ab.py
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_breath.config import DEFAULT_FEATURES as SPEC
from tpu_breath.data import wav as wav_io
from tpu_breath.ops import chroma as ch_ops, spectral

B, CHUNK = 2048, 128
SR, HOP = SPEC.sr, SPEC.hop_length


def hist_searchsorted(flat_r, flat_sel, edges):
    idx = jnp.searchsorted(edges, flat_r, side="right").astype(jnp.int32) - 1
    onehot = idx[None, :] == jnp.arange(len(edges) - 1,
                                        dtype=jnp.int32)[:, None]
    return jnp.sum(onehot & flat_sel[None, :], axis=1, dtype=jnp.int32)


def main():
    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))
    assert len(paths) >= B, (
        f"need >= {B} wavs under /root/reference/input, found {len(paths)}")
    wavs = wav_io.load_wav_batch(paths[:B])
    x = jnp.asarray(wavs)

    def run(hist):
        # the PRODUCTION estimate_tuning_index with only the histogram stage
        # swapped — candidates measure against the real tuning chain
        def chunk_fn(y):
            S = spectral.stft_mag(y, 2048, HOP)[..., ::2]
            return jax.vmap(lambda s: ch_ops.estimate_tuning_index(
                s, SR, 2048, 36, hist=hist))(S)

        def g(w):
            c = w.reshape(B // CHUNK, CHUNK, -1)
            return lax.map(chunk_fn, c).ravel()

        j = jax.jit(g)
        out = np.asarray(j(x))  # compile + warm + fetch for equality check
        t0 = time.perf_counter()
        float(jnp.sum(j(x)))
        return out, time.perf_counter() - t0

    base, t_base = run(ch_ops.hist_compare_reduce)
    cand, t_cand = run(hist_searchsorted)
    same = int(np.sum(base == cand))
    print(f"compare-reduce : {t_base*1e3:7.1f} ms ({B/t_base:8.0f} clips/s)")
    print(f"searchsorted   : {t_cand*1e3:7.1f} ms ({B/t_cand:8.0f} clips/s)")
    print(f"identical tuning indices: {same}/{B}")
    assert same == B, "bin assignment must be bit-identical"


if __name__ == "__main__":
    main()
