"""The production CLI train path under a data-parallel mesh (VERDICT r1 #1):
`train --mesh 8` must go through fit()'s streaming path (host_shard +
stream_batches + batch-sharded device_put) and produce the same history as
the single-device resident path, within the documented Adam sign-fragility
tolerance (see tests/test_parallel.py::test_dp_matches_single_device)."""
import json
import os

import numpy as np
import pytest

from tpu_breath import cli
from tpu_breath.config import Paths


N_TRAIN, N_TEST = 64, 8


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """Synthetic dataset root: csvs + a prebuilt flat feature cache (the CLI
    hits the cache and never needs wav files or the feature graph)."""
    root = tmp_path_factory.mktemp("synth_input")
    rng = np.random.default_rng(7)
    ids_tr = [f"breath_{'E' if i % 2 else 'I'}_{i:03d}" for i in range(N_TRAIN)]
    ids_te = [f"test_{i:03d}" for i in range(N_TEST)]
    with open(root / "train.csv", "w") as f:
        f.write("ID,Target\n")
        for i, fid in enumerate(ids_tr):
            f.write(f"{fid},{'E' if i % 2 else 'I'}\n")
    with open(root / "test.csv", "w") as f:
        f.write("ID\n" + "\n".join(ids_te) + "\n")
    paths = Paths(root=str(root))
    os.makedirs(paths.feature_cache)
    all_ids = ids_tr + ids_te
    # small spatial dims keep the CPU conv compile fast; CNN8 is size-agnostic
    feats = rng.standard_normal(
        (len(all_ids), 9, 16, 8)).astype(np.float32)
    # plant a learnable signal so accuracies move
    y = np.asarray([1.0 if "_E_" in i else 0.0 for i in ids_tr] + [0.5] * N_TEST)
    feats[:, 0, 0, 0] += 2.0 * y
    scals = rng.standard_normal((len(all_ids), 36)).astype(np.float32)
    np.save(os.path.join(paths.feature_cache, "features.npy"), feats)
    np.save(os.path.join(paths.feature_cache, "scalars.npy"), scals)
    with open(os.path.join(paths.feature_cache, "ids.txt"), "w") as f:
        f.write("\n".join(all_ids))
    return root


def _run(root, out, mesh):
    # --f32: in bf16, BatchNorm's cross-device reduction order shifts batch
    # stats by ~1e-3 and Adam amplifies it; layout equivalence is only
    # meaningfully testable in f32 (same rationale as test_parallel.py)
    cli.main(["train", "--root", str(root), "--out-root", str(out),
              "--archs", "cnn8", "--epochs", "2", "--batch-size", "16",
              "--seed", "0", "--f32", "--mesh", mesh])
    hist_path = os.path.join(str(out), "checkpoints", "cnn8", "history.jsonl")
    with open(hist_path) as f:
        return [json.loads(line) for line in f]


def test_cli_train_mesh_matches_single(synth_root, tmp_path):
    h1 = _run(synth_root, tmp_path / "single", "off")
    h8 = _run(synth_root, tmp_path / "mesh8", "8")
    assert len(h1) == len(h8) == 2
    for r1, r8 in zip(h1, h8):
        # identical batch schedule + PRNG keys; only f32 reduction order
        # differs between layouts (documented Adam sign-fragility)
        assert abs(r1["train_loss"] - r8["train_loss"]) < 1e-3, (r1, r8)
        assert abs(r1["val_loss"] - r8["val_loss"]) < 1e-3, (r1, r8)
        assert abs(r1["val_acc"] - r8["val_acc"]) <= 0.08, (r1, r8)
        assert r1["train_acc"] == r8["train_acc"]
        assert r1["lr"] == r8["lr"]


def test_cli_mesh_flag_default_auto():
    p = cli.build_parser()
    a = p.parse_args(["train"])
    assert a.mesh == "auto" and a.batch_size == 0
    a = p.parse_args(["train", "--mesh", "off", "--batch-size", "32"])
    assert a.mesh == "off" and a.batch_size == 32
