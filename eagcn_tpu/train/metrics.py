"""Host-side evaluation metrics.

The reference computes per-task ROC-AUC with sklearn, skipping the -1
missing-label marker, and averages over non-NaN tasks
(`eagcn_pytorch/train.py:161-188`); regression RMSE at `train.py:190-211`.
eagcn_tpu implements AUC directly (rank statistic with midrank tie
handling — numerically identical to sklearn's trapezoidal ROC integral,
cross-checked in tests) so the eval path needs no sklearn."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def roc_auc(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Binary AUC via the Mann-Whitney U statistic with midranks.
    Returns nan when only one class is present (sklearn behaviour)."""
    y_true = np.asarray(y_true).astype(np.int64)
    y_score = np.asarray(y_score, dtype=np.float64)
    n_pos = int((y_true == 1).sum())
    n_neg = int((y_true == 0).sum())
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(y_score, kind="mergesort")
    ranks = np.empty_like(y_score)
    sorted_scores = y_score[order]
    # midranks for ties
    i = 0
    n = len(y_score)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    r_pos = ranks[y_true == 1].sum()
    u = r_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def masked_multitask_auc(
    y_true: np.ndarray,   # [n, T] in {1, 0, -1}
    y_prob: np.ndarray,   # [n, T]
) -> Tuple[List[float], float]:
    """Per-task AUC skipping label==-1 + mean over non-NaN tasks
    (`train.py:174-188`)."""
    aucs = []
    for t in range(y_true.shape[1]):
        keep = y_true[:, t] != -1
        aucs.append(roc_auc(y_true[keep, t], y_prob[keep, t]))
    finite = [a for a in aucs if not np.isnan(a)]
    mean = float(np.mean(finite)) if finite else float("nan")
    return aucs, mean


def rmse(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true, dtype=np.float64).ravel()
    y_pred = np.asarray(y_pred, dtype=np.float64).ravel()
    return float(np.sqrt(np.mean((y_true - y_pred) ** 2)))


def r_squared(x: np.ndarray, y: np.ndarray) -> float:
    """Squared Pearson correlation (the reference's `rsquared`,
    `utils.py:715-718`, via scipy.linregress)."""
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    xc, yc = x - x.mean(), y - y.mean()
    denom = np.sqrt((xc * xc).sum() * (yc * yc).sum())
    if denom == 0:
        return float("nan")
    return float(((xc * yc).sum() / denom) ** 2)
