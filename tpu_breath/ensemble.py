"""Validation-accuracy-weighted sigmoid ensemble + submission writer.

Rebuild of reference src/utils/ensemble.py:49-74 and the submission logic of
src/scripts.py:62-69: weights = softmax(val accuracies) (or sum-normalized),
per-batch weighted sum of each model's sigmoid probabilities, threshold 0.5,
'E'/'I' labels. Inference is a jitted batched apply per model; the test set
lives on device once.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from tpu_breath.models import registry
from tpu_breath.train import checkpoint as ckpt_lib
from tpu_breath.train.loop import TrainState, create_state, make_eval_step
from tpu_breath.config import TrainCfg
from tpu_breath.augment import Batch


def softmax_weights(val_scores, use_softmax: bool = True) -> np.ndarray:
    w = np.asarray(val_scores, np.float64)
    if use_softmax:
        e = np.exp(w - w.max())
        return e / e.sum()
    return w / w.sum()


def predict_probs(model, state: TrainState, feats: np.ndarray,
                  scals: np.ndarray, batch_size: int = 1024) -> np.ndarray:
    """Sigmoid probabilities for one model over the whole set."""
    eval_step = make_eval_step(model)
    f = jnp.asarray(feats)
    s = jnp.asarray(scals)
    n = feats.shape[0]
    out = np.empty(n, np.float32)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        idx = np.arange(lo, hi)
        if hi - lo < batch_size:
            idx = np.concatenate([idx, np.full(batch_size - (hi - lo), hi - 1)])
        logits = np.asarray(eval_step(state, f, s, jnp.asarray(idx)))
        out[lo:hi] = logits[: hi - lo]
    return 1.0 / (1.0 + np.exp(-out))


def load_model_state(ckpt_path: str, arch: str, num_scalar_features: int,
                     sample_batch: Batch):
    """Arch registry + checkpoint restore (analogue of
    src/utils/ensemble.py:7-18)."""
    model = registry.build(arch, num_scalar_features)
    state, _, _ = create_state(model, jax.random.PRNGKey(0), TrainCfg(),
                               steps_per_epoch=1, sample_batch=sample_batch)
    state = ckpt_lib.restore(ckpt_path, state)
    return model, state


def weighted_ensemble(ckpt_paths, archs, val_scores, feats, scals,
                      num_scalar_features: int, use_softmax: bool = True,
                      batch_size: int = 1024) -> np.ndarray:
    assert len(ckpt_paths) == len(archs) == len(val_scores)
    sample = Batch(jnp.asarray(feats[:2]), jnp.asarray(scals[:2]),
                   jnp.zeros(2, jnp.float32))
    weights = softmax_weights(val_scores, use_softmax)
    probs = np.zeros(feats.shape[0], np.float64)
    for path, arch, w in zip(ckpt_paths, archs, weights):
        model, state = load_model_state(path, arch, num_scalar_features, sample)
        probs += w * predict_probs(model, state, feats, scals, batch_size)
    return probs


def average_ensemble(ckpt_paths, archs, feats, scals,
                     num_scalar_features: int, batch_size: int = 1024
                     ) -> np.ndarray:
    """Unweighted mean variant (src/utils/ensemble.py:20-46)."""
    n = len(ckpt_paths)
    return weighted_ensemble(ckpt_paths, archs, np.ones(n), feats, scals,
                             num_scalar_features, use_softmax=False,
                             batch_size=batch_size)


def write_submission(ids, probs, out_path: str,
                     threshold: float = 0.5) -> pd.DataFrame:
    """probs > 0.5 -> 'E' else 'I' (src/scripts.py:62-69)."""
    labels = ["E" if p > threshold else "I" for p in probs]
    df = pd.DataFrame({"ID": list(ids), "Target": labels})
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    df.to_csv(out_path, index=False)
    return df
