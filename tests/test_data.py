"""Data-layer tests: ID mapping, split parity, wav decode, npz interop,
streaming loader."""
import os

import numpy as np
import pandas as pd
import pytest

from tpu_breath.config import FeatureSpec
from tpu_breath.data import dataset as ds
from tpu_breath.data import wav as wav_io
from tpu_breath.data import loader

SPEC = FeatureSpec()


def test_train_wav_name_strips_label_fragment():
    # reference src/precompute/core.py:24
    assert ds.train_wav_name("steth_20180814_09_37_11_I_004") == \
        "steth_20180814_09_37_11_004.wav"
    assert ds.train_wav_name("steth_x_E_000") == "steth_x_000.wav"


def test_test_wav_name():
    assert ds.test_wav_name("a.wav") == "a.wav"
    assert ds.test_wav_name("a") == "a.wav"


def test_split_is_sklearn_seed42():
    df = pd.DataFrame({"ID": [f"c{i}" for i in range(100)],
                       "Target": ["E", "I"] * 50})
    tr, va = ds.split_train_val(df)
    assert len(tr) == 80 and len(va) == 20
    from sklearn.model_selection import train_test_split
    tr2, va2 = train_test_split(df, test_size=0.20, shuffle=True,
                                random_state=42)
    assert list(tr["ID"]) == list(tr2["ID"])
    assert list(va["ID"]) == list(va2["ID"])


def test_labels():
    assert ds.labels_from_targets(["E", "I", "E"]).tolist() == [1.0, 0.0, 1.0]


def test_wav_native_matches_python():
    import glob
    paths = sorted(glob.glob("/root/reference/input/test/*.wav"))[:8]
    if not paths:
        pytest.skip("no reference wavs")
    batch = wav_io.load_wav_batch(paths)
    ref = np.stack([wav_io.load_wav(p) for p in paths])
    np.testing.assert_array_equal(batch, ref)


def test_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ids = ["a", "b"]
    feats = rng.standard_normal((2, 9, 128, 63)).astype(np.float32)
    scals = rng.standard_normal((2, 36)).astype(np.float32)
    store = ds.FeatureStore(ids, feats, scals)
    store.save_npz(str(tmp_path), SPEC)
    d = np.load(tmp_path / "a.npz")
    assert set(d.keys()) == set(SPEC.npz_keys) | {"scalars"}
    rt = ds.FeatureStore.load_npz(str(tmp_path), ids, SPEC)
    np.testing.assert_array_equal(rt.features, feats)
    np.testing.assert_array_equal(rt.scalars, scals)


def test_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    store = ds.FeatureStore(["x", "y", "z"],
                            rng.standard_normal((3, 9, 8, 4)).astype(np.float32),
                            rng.standard_normal((3, 5)).astype(np.float32))
    store.save_cache(str(tmp_path))
    rt = ds.FeatureStore.load_cache(str(tmp_path))
    assert rt.ids == store.ids
    np.testing.assert_array_equal(np.asarray(rt.features), store.features)
    sub = rt.subset(["z", "x"])
    np.testing.assert_array_equal(sub.features[0], store.features[2])


def test_cache_version_guard(tmp_path):
    """A cache written before a feature-numerics change must read as absent
    (advisor r4: stale features silently mixing with post-fix fused training
    reintroduces the fused-vs-cached desync)."""
    import json
    import os
    rng = np.random.default_rng(2)
    store = ds.FeatureStore(["a"],
                            rng.standard_normal((1, 9, 8, 4)).astype(np.float32),
                            rng.standard_normal((1, 5)).astype(np.float32))
    store.save_cache(str(tmp_path))
    assert ds.FeatureStore.cache_exists(str(tmp_path))
    meta = os.path.join(tmp_path, "meta.json")
    with open(meta, "w") as f:
        json.dump({"numeric_version": "some-older-stack"}, f)
    assert not ds.FeatureStore.cache_exists(str(tmp_path))
    os.remove(meta)  # pre-versioning cache: no meta.json at all
    assert not ds.FeatureStore.cache_exists(str(tmp_path))


def test_batch_indices_drop_last_and_determinism():
    a = list(loader.batch_indices(10, 4, np.random.default_rng(0)))
    b = list(loader.batch_indices(10, 4, np.random.default_rng(0)))
    assert len(a) == 2 and all(len(x) == 4 for x in a)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_prefetcher_yields_all_batches():
    arrays = (np.arange(20).reshape(10, 2).astype(np.float32),
              np.arange(10).astype(np.float32))
    stream = loader.stream_batches(arrays, 2, np.random.default_rng(0),
                                   depth=3, shuffle=False)
    got = list(stream)
    assert len(got) == 5
    flat = np.concatenate([np.asarray(b[1]) for b in got])
    np.testing.assert_array_equal(np.sort(flat), np.arange(10))


def test_host_shard_partitions_everything():
    n = 103
    covered = []
    for h in range(4):
        s = loader.host_shard(n, host_id=h, host_count=4)
        covered.extend(range(*s.indices(n)))
    assert sorted(covered) == list(range(n))
