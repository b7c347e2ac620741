"""Roofline characterization of the feature graph (VERDICT r4 #7).

The fused train step sustains ~20% MFU (the MXU has real conv work), but the
feature-only graph reports ~0.1% MFU — this tool answers WHY, with numbers:
for the full graph and each named production subgraph
(utils/profiling.feature_stages), it records

  - wall time (checksum-forced, all chunks inside one jitted lax.map,
    exactly the production layout),
  - XLA compiled cost_analysis FLOPs and bytes accessed,
  - achieved FLOP/s as a fraction of the 197 TF/s bf16 MXU peak,
  - achieved bytes/s as a fraction of the 819 GB/s v5e HBM peak,

and classifies each stage: compute-bound (>30% MXU), bandwidth-bound
(>30% HBM), or latency/serial-bound (neither — dominated by sequential
scan steps, tiny-op dispatch chains, or double-float elementwise chains
whose modeled bytes are small but whose dependency depth is long).

Writes results/feature_roofline.json.
Usage: python tools/feature_roofline.py [--n 2048] [--chunk 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_S = 819e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.utils.profiling import feature_stages
    from tpu_breath.data import wav as wav_io
    import glob

    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))
    reps = -(-args.n // max(len(paths), 1))
    wavs = wav_io.load_wav_batch((paths * reps)[:args.n]) if paths else \
        (np.random.default_rng(0).standard_normal((args.n, 16000)) * 0.05
         ).astype(np.float32)
    x = jnp.asarray(wavs)
    nck = args.n // args.chunk

    stages = feature_stages()
    out = {"n_clips": args.n, "chunk": args.chunk,
           "peak_flops": V5E_PEAK_FLOPS, "peak_hbm_bytes_s": V5E_HBM_BYTES_S}
    rows = {}
    for name, fn in stages.items():
        @jax.jit
        def run(w, fn=fn):
            chunks = w.reshape(nck, args.chunk, -1)
            return jnp.sum(lax.map(
                lambda c: jnp.sum(sum(map(jnp.sum, jax.tree.leaves(fn(c))))),
                chunks))

        try:
            comp = run.lower(x).compile()
            cost = comp.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            nbytes = float(cost.get("bytes accessed", 0.0))
        except Exception as e:  # pragma: no cover
            flops, nbytes = None, None
            print(f"[{name}] cost analysis failed: {e}", flush=True)
        t0 = time.perf_counter()
        c = float(run(x))  # compile+warm
        assert np.isfinite(c)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            walls.append(time.perf_counter() - t0)
        wall = float(np.median(walls))
        mxu = flops / wall / V5E_PEAK_FLOPS if flops else None
        hbm = nbytes / wall / V5E_HBM_BYTES_S if nbytes else None
        if mxu is not None and mxu > 0.30:
            kind = "compute-bound"
        elif hbm is not None and hbm > 0.30:
            kind = "bandwidth-bound"
        else:
            kind = "latency/serial-bound"
        rows[name] = {
            "wall_ms": round(wall * 1e3, 2),
            "clips_per_s": round(args.n / wall, 1),
            "gflops": round(flops / 1e9, 3) if flops else None,
            "gbytes_accessed": round(nbytes / 1e9, 3) if nbytes else None,
            "mxu_frac": round(mxu, 5) if mxu is not None else None,
            "hbm_frac": round(hbm, 5) if hbm is not None else None,
            "bound": kind,
        }
        print(f"[{name:12s}] {rows[name]['wall_ms']:9.2f} ms  "
              f"mxu={rows[name]['mxu_frac']}  hbm={rows[name]['hbm_frac']}  "
              f"{kind}", flush=True)
    out["stages"] = rows

    os.makedirs("results", exist_ok=True)
    with open("results/feature_roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written: results/feature_roofline.json", flush=True)


if __name__ == "__main__":
    main()
