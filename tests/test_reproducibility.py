"""Keyed-PRNG reproducibility: two fit() runs with the same seed must produce
identical training histories (the reference's global np.random + loader
workers cannot make this guarantee — SURVEY.md §5 race-detection row)."""
import numpy as np
import jax.numpy as jnp

from tpu_breath.config import TrainCfg
from tpu_breath.models.cnn8 import CNN8
from tpu_breath.train import loop


def _run(seed):
    rng = np.random.default_rng(7)
    n = 32
    feats = rng.standard_normal((n, 9, 16, 8)).astype(np.float32)
    scals = rng.standard_normal((n, 36)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.float32)
    cfg = TrainCfg(num_epochs=3, base_lr=1e-3, batch_size=16,
                   eval_batch_size=16, warmup_epochs=1, patience=99,
                   seed=seed)
    model = CNN8(num_scalar_features=36, dtype=jnp.float32)
    res = loop.fit(model, (feats, scals), (feats, scals), labels, labels,
                   cfg, save_dir=None, log_fn=lambda *_: None)
    return [(r["train_loss"], r["val_acc"]) for r in res.history]


def test_same_seed_identical_history():
    a = _run(5)
    b = _run(5)
    assert a == b


def test_different_seed_different_history():
    a = _run(5)
    c = _run(6)
    assert a != c
