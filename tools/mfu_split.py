"""Per-stage time attribution of the FUSED wav->feature->train step
(VERDICT r3 #2): where do the milliseconds of the 18%-MFU step go, for both
archs, and is the MFU recoverable (63->64 frame pad, batch-size sweep) or a
geometry ceiling?

Pieces timed (each its own jitted graph, checksum-synced like bench.py):
  features   the feature subgraph alone (fused_chunk=128 lax.map, as in the
             production step, train/loop.py:136-150)
  fwd        forward pass (train=True)
  grad       value_and_grad of the loss (fwd+bwd)
  cached     full cached step: augment + fwd/bwd + clip/AdamW
  fused      full fused step: features + augment + fwd/bwd + clip/AdamW
Attribution: features ~= fused - cached; bwd ~= grad - fwd;
optimizer+augment ~= cached - grad. Each piece also gets XLA's compiled
cost_analysis FLOPs -> per-piece MFU, so "18% fused" decomposes into
"X% conv stack, Y% feature graph" instead of one opaque number.

Geometry experiments (cached step only, CNN8+VGG):
  pad64      features padded 63->64 frames at the model boundary (lane=128
             alignment: 63 frames leaves the last MXU lane tile 49% empty)
  batch swp  cached step at B in {256, 512, 1024}

Writes results/mfu_split.json. Usage: python tools/mfu_split.py
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRAIN_BATCH = 512
CHUNK = 128
REPS = 8  # dispatch REPS async steps, sync once (35 ms relay roundtrip)
V5E_PEAK_FLOPS = 197e12


def _flops(jitted, *args):
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _time(fn, *args) -> float:
    """Median-of-3 wall time of REPS async dispatches + one sync, seconds."""
    sync_out(fn(*args))  # compile + warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        sync_out(out)
        best.append((time.perf_counter() - t0) / REPS)
    return float(np.median(best))


def sync_out(out):
    import jax
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and x.size]
    float(np.asarray(leaves[-1].ravel()[0]))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_breath.augment import Batch
    from tpu_breath.config import DEFAULT_FEATURES as SPEC, CNN8_TRAIN, VGG_TRAIN
    from tpu_breath.features import extract_features
    from tpu_breath.models.cnn8 import CNN8
    from tpu_breath.models.vgg import VGG
    from tpu_breath.train import loop as train_loop

    paths = sorted(glob.glob("/root/reference/input/*/*.wav"))
    from tpu_breath.data import wav as wav_io
    reps = -(-TRAIN_BATCH // max(len(paths), 1))
    wavs = (wav_io.load_wav_batch((paths * reps)[:TRAIN_BATCH])
            if paths else np.random.default_rng(0)
            .standard_normal((TRAIN_BATCH, SPEC.expected_len))
            .astype(np.float32) * 0.05)
    x = jnp.asarray(wavs)
    labels = jnp.asarray(np.tile([0.0, 1.0], TRAIN_BATCH // 2))

    # features once (also the cached-step input)
    feats, scals = jax.jit(lambda w: extract_features(w, SPEC))(x[:2])
    sample = Batch(feats, scals, labels[:2])

    @jax.jit
    def features_chunked(w):
        c = w.reshape(TRAIN_BATCH // CHUNK, CHUNK, -1)
        f, s = lax.map(lambda y: extract_features(y, SPEC), c)
        return f.reshape(TRAIN_BATCH, *f.shape[2:]), \
            s.reshape(TRAIN_BATCH, *s.shape[2:])

    bf, bs = features_chunked(x)
    sync_out((bf, bs))

    out = {"train_batch": TRAIN_BATCH, "chunk": CHUNK, "reps": REPS}
    for arch, model_cls, cfg0 in (("cnn8", CNN8, CNN8_TRAIN),
                                  ("vgg", VGG, VGG_TRAIN)):
        cfg = type(cfg0)(**{**cfg0.__dict__, "batch_size": TRAIN_BATCH})
        model = model_cls(num_scalar_features=SPEC.n_scalars)
        state, tx, _ = train_loop.create_state(
            model, jax.random.PRNGKey(0), cfg, steps_per_epoch=8,
            sample_batch=sample)
        key, use_aug = jax.random.PRNGKey(1), jnp.asarray(True)

        @jax.jit
        def fwd(state, f, s):
            out, _ = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                f, s, train=True, mutable=["batch_stats"],
                rngs={"dropout": key})
            return out

        @jax.jit
        def grad(state, f, s, y):
            def loss_fn(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    f, s, train=True, mutable=["batch_stats"],
                    rngs={"dropout": key})
                return train_loop.bce_with_logits(out, y)
            return jax.value_and_grad(loss_fn)(state.params)

        cached = train_loop.make_train_step_batched(model, tx, cfg)
        fused = train_loop.make_train_step_batched(model, tx, cfg,
                                                   fused_spec=SPEC,
                                                   fused_chunk=CHUNK)
        cbatch = Batch(bf, bs, labels)
        fbatch = Batch(x, None, labels)

        rows = {}
        graphs = {
            "features": (features_chunked, (x,)),
            "fwd": (fwd, (state, bf, bs)),
            "grad": (grad, (state, bf, bs, labels)),
            # non-donated copies: timing loops reuse the same state
            "cached": (lambda s, b, k, u: cached(jax.tree.map(jnp.copy, s),
                                                 b, k, u),
                       (state, cbatch, key, use_aug)),
            "fused": (lambda s, b, k, u: fused(jax.tree.map(jnp.copy, s),
                                               b, k, u),
                      (state, fbatch, key, use_aug)),
        }
        for name, (fn, args) in graphs.items():
            dt = _time(fn, *args)
            fl = _flops(jax.jit(fn) if name in ("cached", "fused") else fn,
                        *args)
            rows[name] = {
                "ms": round(dt * 1e3, 2),
                "clips_per_s": round(TRAIN_BATCH / dt, 1),
                "gflops": round(fl / 1e9, 2) if fl else None,
                "mfu": round(fl / dt / V5E_PEAK_FLOPS, 4) if fl else None,
            }
            print(f"[{arch}] {name:9s} {rows[name]['ms']:8.2f} ms  "
                  f"{rows[name]['clips_per_s']:9.1f} clips/s  "
                  f"mfu={rows[name]['mfu']}", flush=True)
        rows["attribution_ms"] = {
            "feature_subgraph(fused-cached)": round(
                rows["fused"]["ms"] - rows["cached"]["ms"], 2),
            "bwd(grad-fwd)": round(rows["grad"]["ms"] - rows["fwd"]["ms"], 2),
            "aug+clip+adamw(cached-grad)": round(
                rows["cached"]["ms"] - rows["grad"]["ms"], 2),
        }

        # --- geometry: 63 -> 64 frame pad at the model boundary
        bf64 = jnp.pad(bf, ((0, 0), (0, 0), (0, 0), (0, 1)))
        cb64 = Batch(bf64, bs, labels)
        dt64 = _time(lambda s, b, k, u: cached(jax.tree.map(jnp.copy, s),
                                               b, k, u),
                     state, cb64, key, use_aug)
        rows["pad64_cached_ms"] = round(dt64 * 1e3, 2)
        print(f"[{arch}] pad64     {rows['pad64_cached_ms']:8.2f} ms "
              f"(vs {rows['cached']['ms']} at T=63)", flush=True)

        # --- batch sweep on the cached step
        sweep = {}
        for b in (256, 1024):
            cfg_b = type(cfg0)(**{**cfg0.__dict__, "batch_size": b})
            st_b, tx_b, _ = train_loop.create_state(
                model, jax.random.PRNGKey(0), cfg_b, steps_per_epoch=8,
                sample_batch=sample)
            step_b = train_loop.make_train_step_batched(model, tx_b, cfg_b)
            nrep = -(-b // TRAIN_BATCH)
            fb = jnp.tile(bf, (nrep, 1, 1, 1))[:b]
            sb = jnp.tile(bs, (nrep, 1))[:b]
            yb = jnp.tile(labels, nrep)[:b]
            dt = _time(lambda s, bb, k, u: step_b(jax.tree.map(jnp.copy, s),
                                                  bb, k, u),
                       st_b, Batch(fb, sb, yb), key, use_aug)
            sweep[str(b)] = {"ms": round(dt * 1e3, 2),
                             "clips_per_s": round(b / dt, 1)}
            print(f"[{arch}] cached B={b}: {sweep[str(b)]}", flush=True)
        sweep["512"] = {"ms": rows["cached"]["ms"],
                        "clips_per_s": rows["cached"]["clips_per_s"]}
        rows["cached_batch_sweep"] = sweep
        out[arch] = rows

    os.makedirs("results", exist_ok=True)
    with open("results/mfu_split.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written: results/mfu_split.json", flush=True)


if __name__ == "__main__":
    main()
