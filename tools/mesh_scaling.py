"""Multi-device scaling evidence for RESULTS.md (VERDICT r3 #4).

This host has ONE physical CPU core, so wall-clock speedup from 8 virtual
devices is not observable offline — what IS measurable and meaningful:

1. PARTITION: per-device FLOPs and peak memory of the compiled pjit train
   step at mesh sizes 1/2/4/8 with the global batch fixed. Under SPMD, XLA
   compiles one per-device program; its cost analysis dropping ~1/k is the
   compile-level proof that each device owns B/k of the work.
2. COLLECTIVES: all-reduce op count in the compiled per-device HLO — the
   XLA-inserted gradient psums the sharding annotations promise
   (SURVEY.md §2.4's "DP over ICI").
3. EXISTENCE: wall-clocks of the REAL two-process SPMD runs (production CLI
   under jax.distributed, tests/mp_worker.py) for train and precompute —
   the same desync-sensitive paths tests/test_multiprocess.py asserts on.

Writes results/mesh_scaling.json. Run standalone (it forces the CPU backend
with 8 virtual devices before first device use):
    PYTHONPATH=. python tools/mesh_scaling.py
"""
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

GLOBAL_BATCH = 512
# Timing protocol: wall_ms_1core_host is the mean of this many post-warmup
# executions; recorded in the JSON so round-over-round comparisons carry
# their protocol.
N_TIMING_ITERS = 3
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cost(jitted, *args):
    comp = jitted.lower(*args).compile()
    cost = comp.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    hlo = comp.as_text()
    mem = None
    try:
        ma = comp.memory_analysis()
        mem = float(ma.temp_size_in_bytes + ma.argument_size_in_bytes +
                    ma.output_size_in_bytes)
    except Exception:
        pass
    return {
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)) or None,
        "n_all_reduce": hlo.count("all-reduce"),
        "memory_bytes": mem,
    }, comp


def step_scaling() -> dict:
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    from tpu_breath.augment import Batch
    from tpu_breath.config import CNN8_TRAIN, DEFAULT_FEATURES as SPEC
    from tpu_breath.models.cnn8 import CNN8
    from tpu_breath.parallel import mesh as mesh_lib
    from tpu_breath.train import loop as train_loop

    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (GLOBAL_BATCH, SPEC.n_channels, SPEC.n_mels, SPEC.t_fixed)
    ).astype(np.float32)
    scals = rng.standard_normal((GLOBAL_BATCH, SPEC.n_scalars)
                                ).astype(np.float32)
    labels = rng.integers(0, 2, GLOBAL_BATCH).astype(np.float32)
    cfg = type(CNN8_TRAIN)(**{**CNN8_TRAIN.__dict__,
                              "batch_size": GLOBAL_BATCH})
    model = CNN8(num_scalar_features=SPEC.n_scalars)
    sample = Batch(jnp.asarray(feats[:2]), jnp.asarray(scals[:2]),
                   jnp.asarray(labels[:2]))
    key, use_aug = jax.random.PRNGKey(1), jnp.asarray(True)

    out = {}
    for k in (1, 2, 4, 8):
        mesh = mesh_lib.make_mesh(jax.devices()[:k])
        state, tx, _ = train_loop.create_state(
            model, jax.random.PRNGKey(0), cfg, steps_per_epoch=8,
            sample_batch=sample)
        state = jax.device_put(state, mesh_lib.replicated(mesh))
        step = train_loop.make_train_step_batched(model, tx, cfg, mesh)
        batch = Batch(
            jax.device_put(jnp.asarray(feats), mesh_lib.data_sharding(mesh)),
            jax.device_put(jnp.asarray(scals), mesh_lib.data_sharding(mesh)),
            jax.device_put(jnp.asarray(labels), mesh_lib.data_sharding(mesh)))
        # non-donated wrapper so the timing loop can reuse state
        run = jax.jit(lambda s, b: step(jax.tree.map(jnp.copy, s), b,
                                        key, use_aug))
        cost, _ = _cost(run, state, batch)
        out[str(k)] = dict(cost)
        # the partition evidence is the compile-level cost analysis; a
        # single-core host executing all k virtual devices serially can't
        # show speedup, so pay the (expensive, ~4 min/step) execution only
        # at the endpoints to prove the sharded step RUNS
        if k in (1, 8):
            _, stats = run(state, batch)  # compile+warm
            float(stats["loss"])
            t0 = time.perf_counter()
            for _ in range(N_TIMING_ITERS):
                _, stats = run(state, batch)
                float(stats["loss"])
            dt = (time.perf_counter() - t0) / N_TIMING_ITERS
            out[str(k)]["wall_ms_1core_host"] = round(dt * 1e3, 1)
            out[str(k)]["n_timing_iters"] = N_TIMING_ITERS
        cost = out[str(k)]
        mem = cost["memory_bytes"]
        mem_str = f"{mem / 1e6:.0f}MB" if mem is not None else "?MB"
        print(f"mesh={k}: per-device gflops {cost['flops']/1e9:.2f}, "
              f"all-reduce x{cost['n_all_reduce']}, mem {mem_str}"
              + (f", wall {cost['wall_ms_1core_host']:.0f}ms (1-core host, "
                 f"mean of {N_TIMING_ITERS})"
                 if "wall_ms_1core_host" in cost else ""), flush=True)
    return out


def feature_scaling() -> dict:
    import jax
    import jax.numpy as jnp
    from tpu_breath.config import DEFAULT_FEATURES as SPEC
    from tpu_breath.features import extract_features
    from tpu_breath.parallel import mesh as mesh_lib

    rng = np.random.default_rng(0)
    wavs = (rng.standard_normal((64, SPEC.expected_len)) * 0.05
            ).astype(np.float32)
    out = {}
    for k in (1, 8):
        mesh = mesh_lib.make_mesh(jax.devices()[:k])
        x = jax.device_put(jnp.asarray(wavs), mesh_lib.data_sharding(mesh))
        fn = jax.jit(lambda w: jax.tree.map(
            jnp.sum, extract_features(w, SPEC)))
        cost, _ = _cost(fn, x)
        out[str(k)] = cost
        print(f"features mesh={k}: per-device gflops "
              f"{cost['flops']/1e9:.2f}", flush=True)
    return out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def two_process(cmd: str, synth_root: str, out_dir: str, nproc: int) -> float:
    """Wall-clock of the production CLI under jax.distributed with nproc
    processes (nproc=1 uses the same worker for a like-for-like single
    process baseline)."""
    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           # PYTHONPATH = repo root ONLY, exactly like the pytest spawn of
           # this worker: the repo import needs it, and it must NOT include
           # the axon plugin site — its sitecustomize pre-registers the
           # device backend and the forced CPU device count is then ignored
           "PYTHONPATH": REPO,
           "XLA_FLAGS": f"--xla_force_host_platform_device_count="
                        f"{8 // nproc}"}
    t0 = time.perf_counter()
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
         str(pid), str(nproc), str(port), synth_root,
         os.path.join(out_dir, f"p{pid}"), cmd],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    logs = [p.communicate(timeout=1800)[0] for p in procs]
    dt = time.perf_counter() - t0
    for pid, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            path = f"/tmp/mesh_worker_{cmd}_n{nproc}_p{pid}.log"
            with open(path, "w") as f:
                f.write(log)
            raise AssertionError(
                f"worker {pid} rc={p.returncode}; full log at {path}")
    return dt


def make_synth_root(root: str, n_train: int = 32, n_test: int = 8) -> None:
    """Tiny synthetic dataset in the reference input/ layout (same shape the
    multiprocess tests build)."""
    import wave
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)
    rows = ["ID,Target"]
    for i in range(n_train):
        lab = "EI"[i % 2]
        wav = f"synth_{i:03d}.wav"
        rows.append(f"synth_{lab}_{i:03d}.wav,{lab}")
        _write_wav(os.path.join(root, "train", wav), rng)
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    rows = ["ID"]
    for i in range(n_test):
        wav = f"synthtest_{i:03d}.wav"
        rows.append(wav)
        _write_wav(os.path.join(root, "test", wav), rng)
    with open(os.path.join(root, "test.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def _write_wav(path: str, rng) -> None:
    import wave
    pcm = (rng.standard_normal(16000) * 3000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())


def main() -> None:
    import tempfile
    out = {"host": "1 physical core; 8 virtual XLA CPU devices",
           "global_batch": GLOBAL_BATCH}
    out["train_step_per_device"] = step_scaling()
    out["feature_graph_per_device"] = feature_scaling()

    with tempfile.TemporaryDirectory() as td:
        synth = os.path.join(td, "input")
        make_synth_root(synth)
        tp = {}
        for cmd in ("train", "precompute"):
            for nproc in (1, 2):
                dt = two_process(cmd, synth, os.path.join(td, f"{cmd}{nproc}"),
                                 nproc)
                tp[f"{cmd}_nproc{nproc}_wall_s"] = round(dt, 1)
                print(f"{cmd} nproc={nproc}: {dt:.1f}s", flush=True)
        out["two_process_spmd"] = tp

    os.makedirs("results", exist_ok=True)
    with open("results/mesh_scaling.json", "w") as f:
        json.dump(out, f, indent=1)
    print("written: results/mesh_scaling.json", flush=True)


if __name__ == "__main__":
    main()
