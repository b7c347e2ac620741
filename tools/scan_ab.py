"""A/B: production extraction layouts on one chip (VERDICT r2 #3).

  dispatch : one jit call per 128-clip chunk, async, sync at the end
             (the round-1/2 production path)
  scan     : lax.scan over chunk bodies inside ONE jit (one dispatch per
             dataset; features._extract_scan_jit)

Both timed with the download excluded (checksum forced on device) AND
included (np.asarray), because through the axon relay the result download
dominates cold production extraction; bench.py's feature metric is the
download-excluded one.

Usage: PYTHONPATH=. python tools/scan_ab.py [n_clips]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
CHUNK = 128


def main() -> None:
    import jax
    import jax.numpy as jnp
    from tpu_breath.config import DEFAULT_FEATURES as SPEC
    from tpu_breath.data import wav as wav_io
    from tpu_breath import features

    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))
    reps = -(-B // len(paths))
    wavs = wav_io.load_wav_batch((paths * reps)[:B])

    # --- scan layout, checksum-forced (no download)
    chunks, _ = features._chunked(wavs, CHUNK)
    xc = jnp.asarray(chunks)

    @jax.jit
    def scan_ck(wc):
        f, s = features._extract_scan_jit(wc, SPEC)
        return jnp.sum(f) + jnp.sum(s)

    t0 = time.perf_counter()
    float(scan_ck(xc))
    print(f"scan compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ck1 = float(scan_ck(xc))
    dt = time.perf_counter() - t0
    print(f"scan  (no download): {B / dt:8.1f} clips/s  ({dt * 1e3:.0f} ms)",
          flush=True)

    # --- dispatch layout, checksum-forced
    @jax.jit
    def one_ck(c):
        f, s = features.extract_features(c, SPEC)
        return jnp.sum(f) + jnp.sum(s)

    xs = [jnp.asarray(chunks[i]) for i in range(chunks.shape[0])]
    float(one_ck(xs[0]))  # compile
    t0 = time.perf_counter()
    ck2 = float(sum(one_ck(x) for x in xs))
    dt = time.perf_counter() - t0
    print(f"dispatch (no download): {B / dt:8.1f} clips/s  ({dt * 1e3:.0f} ms)",
          flush=True)
    assert np.isfinite(ck1) and np.isfinite(ck2)

    # --- end-to-end production calls (download included)
    for scan in (True, False):
        t0 = time.perf_counter()
        f, s = features.extract_features_batched(wavs, SPEC, chunk=CHUNK,
                                                 scan=scan)
        dt = time.perf_counter() - t0
        name = "scan" if scan else "dispatch"
        print(f"{name:8s} (with download): {B / dt:8.1f} clips/s  "
              f"({dt:.1f} s)", flush=True)
        assert np.isfinite(f).all() and np.isfinite(s).all()


if __name__ == "__main__":
    main()
