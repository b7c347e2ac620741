"""A/B the radix-select descent width (ops/select.py rank_select_u32 bits).

bits=1 (shipped round 2) reads the key array 32 times (one masked count per
bit). bits=b reads it 32/b times, each pass building a 2^b-bin in-prefix
histogram as one fused one-hot reduction — IF XLA fuses the one-hot into
the pass, HBM traffic over the keys drops b-fold. This measures, per bits:

  - correctness: exact equality with bits=1 on random u32 keys, random
    ranks (including duplicates / empty-mask edge shapes)
  - tuning-median shape: vmapped masked_median over [B, 32800] (the chroma
    tuning estimate's shape, ops/chroma.py:83)
  - percentile shape: vmapped percentile over [B, 16000] (the |y| scalar
    descriptors, ops/scalars.py:237)

Usage: python tools/select_ab.py [bits...]   (default 1 2 4 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = 128
N_MED, N_PCT = 32800, 16000


def main() -> None:
    import jax
    import jax.numpy as jnp
    from tpu_breath.ops import select

    bits_list = [int(b) for b in sys.argv[1:]] or [1, 2, 4, 8]
    rng = np.random.default_rng(0)

    # --- exactness on adversarial key sets (duplicates, extremes)
    keys = np.concatenate([
        rng.integers(0, 2**32, 4096, dtype=np.uint64).astype(np.uint32),
        np.repeat(rng.integers(0, 2**32, 16, dtype=np.uint64
                               ).astype(np.uint32), 64),
        np.zeros(7, np.uint32), np.full(9, 2**32 - 1, np.uint64
                                        ).astype(np.uint32)])
    ranks = rng.integers(0, len(keys), 257)
    kj, rj = jnp.asarray(keys), jnp.asarray(ranks)
    expect = np.sort(keys)[ranks]
    for b in bits_list:
        got = np.asarray(jax.jit(jax.vmap(
            lambda r, b=b: select.rank_select_u32(kj, r, bits=b)))(rj))
        assert (got == expect).all(), f"bits={b} mismatch"
    print(f"exactness: {len(ranks)} ranks x bits {bits_list} all equal",
          flush=True)

    # --- timing, production shapes
    med_v = jnp.asarray(rng.standard_normal((B, N_MED)).astype(np.float32))
    med_m = jnp.asarray(rng.random((B, N_MED)) < 0.3)
    pct_v = jnp.asarray(np.abs(rng.standard_normal(
        (B, N_PCT))).astype(np.float32))

    for b in bits_list:
        f_med = jax.jit(lambda v, m, b=b: jnp.sum(jax.vmap(
            lambda vv, mm: select.masked_median(vv, mm, bits=b))(v, m)))
        f_pct = jax.jit(lambda v, b=b: jnp.sum(jax.vmap(
            lambda vv: select.percentile(vv, 90, bits=b)
            + select.percentile(vv, 10, bits=b))(v)))
        float(f_med(med_v, med_m)); float(f_pct(pct_v))  # compile+warm
        t0 = time.perf_counter(); float(f_med(med_v, med_m))
        t_med = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_pct(pct_v))
        t_pct = time.perf_counter() - t0
        print(f"bits {b}: masked_median[{B},{N_MED}] {t_med * 1e3:7.1f} ms   "
              f"p90+p10[{B},{N_PCT}] {t_pct * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
