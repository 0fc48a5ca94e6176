"""Global CMVN stats: accumulate / save / load.

Counterpart of reference ``mindaudio/utils/load_files.py:9-36`` (JSON CMVN
loader returning mean and 1/std) and
``examples/conformer/compute_cmvn_stats.py``. The JSON schema keeps the
reference's accumulator fields (``mean_stat``, ``var_stat``, ``frame_num``)
so stats files are interchangeable.
"""

from __future__ import annotations

import json

import numpy as np

__all__ = ["CMVNAccumulator", "save_cmvn", "load_cmvn"]


class CMVNAccumulator:
    """Streaming sum / sum-of-squares over (N, T, F) feature batches."""

    def __init__(self, feat_dim: int):
        self.mean_stat = np.zeros(feat_dim, np.float64)
        self.var_stat = np.zeros(feat_dim, np.float64)
        self.frame_num = 0

    def update(self, feats, feat_lens=None):
        feats = np.asarray(feats, np.float64)
        if feats.ndim == 2:
            feats = feats[None]
        if feat_lens is None:
            valid = feats.reshape(-1, feats.shape[-1])
        else:
            rows = []
            for x, n in zip(feats, np.asarray(feat_lens)):
                rows.append(x[: int(n)])
            valid = np.concatenate(rows, axis=0)
        self.mean_stat += valid.sum(0)
        self.var_stat += (valid**2).sum(0)
        self.frame_num += valid.shape[0]

    def finalize(self):
        mean = self.mean_stat / self.frame_num
        var = self.var_stat / self.frame_num - mean**2
        # variance floor: degenerate (near-constant) dims would otherwise get
        # istd ~ 1e10 and saturate the network into exact zeros (GLU gates
        # collapse, all gradients die). Real log-mel variances are O(1-30),
        # so a 1e-3 floor (istd <= ~32) never binds on speech.
        istd = 1.0 / np.sqrt(np.maximum(var, 1e-3))
        return mean.astype(np.float32), istd.astype(np.float32)


def save_cmvn(path: str, acc: CMVNAccumulator):
    with open(path, "w") as f:
        json.dump({
            "mean_stat": acc.mean_stat.tolist(),
            "var_stat": acc.var_stat.tolist(),
            "frame_num": acc.frame_num,
        }, f)


def load_cmvn(path: str):
    """Returns ``(mean, istd)`` float32 arrays (reference load_files.py:31)."""
    with open(path) as f:
        stats = json.load(f)
    mean = np.asarray(stats["mean_stat"], np.float64) / stats["frame_num"]
    var = np.asarray(stats["var_stat"], np.float64) / stats["frame_num"] - mean**2
    istd = 1.0 / np.sqrt(np.maximum(var, 1e-3))  # same floor as finalize
    return mean.astype(np.float32), istd.astype(np.float32)
