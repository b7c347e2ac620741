"""Evaluation metrics: accuracy, ROC-AUC, precision/recall/F1.

The reference computes only accuracy in its loop (src/train.py:118-133) but
publishes AUC/P/R/F1 in the paper's results table (SURVEY.md §6), so the
rebuild makes them first-class. Pure numpy on host — these run once per epoch
on small arrays.
"""
from __future__ import annotations

import numpy as np


def binary_metrics(probs: np.ndarray, labels: np.ndarray,
                   threshold: float = 0.5) -> dict[str, float]:
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels, np.float64)
    preds = (probs > threshold).astype(np.float64)
    tp = float(np.sum((preds == 1) & (labels == 1)))
    fp = float(np.sum((preds == 1) & (labels == 0)))
    fn = float(np.sum((preds == 0) & (labels == 1)))
    tn = float(np.sum((preds == 0) & (labels == 0)))
    acc = (tp + tn) / max(len(labels), 1)
    precision = tp / max(tp + fp, 1e-12)
    recall = tp / max(tp + fn, 1e-12)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    return {"acc": acc, "auc": roc_auc(probs, labels),
            "precision": precision, "recall": recall, "f1": f1}


def roc_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based AUC (equivalent to trapezoidal ROC integration, with the
    standard tie correction)."""
    pos = probs[labels == 1]
    neg = probs[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # average ranks over ties
    allv = np.concatenate([pos, neg])
    sortedv = allv[order]
    i = 0
    sorted_ranks = ranks[order]
    while i < len(sortedv):
        j = i
        while j + 1 < len(sortedv) and sortedv[j + 1] == sortedv[i]:
            j += 1
        if j > i:
            sorted_ranks[i:j + 1] = sorted_ranks[i:j + 1].mean()
        i = j + 1
    ranks[order] = sorted_ranks
    r_pos = ranks[: len(pos)].sum()
    n_pos, n_neg = len(pos), len(neg)
    return float((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
