"""Equal error rate for speaker verification.

Port of reference ``mindaudio/metric/eer.py`` (ROC → P_fa/P_miss → root of
interpolated difference, eer.py:14-34).
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import interp1d
from scipy.optimize import brentq

__all__ = ["get_eer", "get_eer_from_scores", "compute_fa_miss"]


def _roc(labels, scores):
    order = np.argsort(-scores)
    labels = np.asarray(labels)[order]
    tps = np.cumsum(labels)
    fps = np.cumsum(1 - labels)
    tpr = tps / max(tps[-1], 1)
    fpr = fps / max(fps[-1], 1)
    return fpr, tpr


def compute_fa_miss(scores, labels, pos_label=1, return_thresholds=True):
    """False-alarm / miss probability curves (reference eer.py:1).

    Returns ``(P_fa, P_miss[, thresholds])`` sorted by increasing P_fa,
    matching the reference's ``sklearn.roc_curve``-based convention.
    """
    scores = np.asarray(scores, dtype=np.float64)
    labels = (np.asarray(labels) == pos_label).astype(np.int64)
    order = np.argsort(-scores)
    s, l = scores[order], labels[order]
    # one operating point per distinct threshold (accept if score >= thr)
    distinct = np.r_[np.nonzero(np.diff(s))[0], len(s) - 1]
    tps = np.cumsum(l)[distinct]
    fps = (distinct + 1) - tps
    n_pos = max(int(l.sum()), 1)
    n_neg = max(int(len(l) - l.sum()), 1)
    fpr = fps / n_neg
    tpr = tps / n_pos
    P_fa = fpr[::-1]
    P_miss = (1.0 - tpr)[::-1]
    thresholds = s[distinct][::-1]
    if return_thresholds:
        return P_fa, P_miss, thresholds
    return P_fa, P_miss


def get_eer(positive_scores, negative_scores):
    """EER from separate positive-trial and negative-trial score arrays.

    Returns ``(eer, threshold)``.
    """
    scores = np.concatenate([positive_scores, negative_scores])
    labels = np.concatenate(
        [np.ones(len(positive_scores)), np.zeros(len(negative_scores))]
    )
    return get_eer_from_scores(scores, labels)


def get_eer_from_scores(scores, labels):
    """EER from scores + binary labels; returns ``(eer, threshold)``."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels)
    fpr, tpr = _roc(labels, scores)
    fpr = np.concatenate([[0.0], fpr])
    tpr = np.concatenate([[0.0], tpr])
    eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)

    # threshold at the EER operating point: sweep the "accept if score >=
    # cut" rule over every candidate cut and take the one where FPR and FNR
    # meet. A pure fpr-index lookup returns the single top score when
    # eer ~= 0, which rejects almost every positive trial despite the
    # perfect separation.
    sorted_scores = np.sort(scores)[::-1]  # descending candidate cuts
    fnr_sweep = 1.0 - tpr[1:]
    fpr_sweep = fpr[1:]
    idx = int(np.argmin(np.abs(fpr_sweep - fnr_sweep)))
    thresh = sorted_scores[idx]
    if idx + 1 < len(sorted_scores):
        # midpoint of the decision gap generalizes better than the boundary
        # score itself (any cut inside the gap has the same error rates)
        thresh = 0.5 * (thresh + sorted_scores[idx + 1])
    return float(eer), float(thresh)
