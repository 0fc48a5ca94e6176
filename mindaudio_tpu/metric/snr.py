"""Separation metrics: SI-SNR(i) and SDR(i).

Port of reference ``mindaudio/metric/snr.py:5/23/40``. SDR is computed with a
self-contained least-squares projection (the reference calls
``mir_eval.bss_eval_sources``; mir_eval isn't a dependency here, and for the
single-frame case bss_eval's SDR reduces to the projection formula below).
"""

from __future__ import annotations

import itertools

import numpy as np

__all__ = ["cal_SISNR", "cal_SISNRi", "cal_SDRi"]


def cal_SISNR(ref_sig, out_sig, eps=1e-8):
    """SI-SNR in dB between two 1-D signals (zero-mean projected)."""
    assert len(ref_sig) == len(out_sig)
    ref_sig = ref_sig - np.mean(ref_sig)
    out_sig = out_sig - np.mean(out_sig)
    proj = np.sum(ref_sig * out_sig) * ref_sig / (np.sum(ref_sig**2) + eps)
    noise = out_sig - proj
    return 10 * np.log10(np.sum(proj**2) / (np.sum(noise**2) + eps) + eps)


def cal_SISNRi(src_ref, src_est, mix):
    """SI-SNR improvement: mean over sources of best-permutation SI-SNR minus
    the mixture baseline. ``src_ref``/``src_est``: (C, T); ``mix``: (T,)."""
    c = src_ref.shape[0]
    best = -np.inf
    for perm in itertools.permutations(range(c)):
        snr = np.mean([cal_SISNR(src_ref[i], src_est[perm[i]]) for i in range(c)])
        best = max(best, snr)
    base = np.mean([cal_SISNR(src_ref[i], mix) for i in range(c)])
    return best - base, best


def _sdr(ref, est, eps=1e-8):
    proj = np.sum(ref * est) * ref / (np.sum(ref**2) + eps)
    noise = est - proj
    return 10 * np.log10(np.sum(proj**2) / (np.sum(noise**2) + eps) + eps)


def cal_SDRi(src_ref, src_est, mix):
    """SDR improvement over the mixture baseline (best permutation)."""
    c = src_ref.shape[0]
    best = -np.inf
    for perm in itertools.permutations(range(c)):
        sdr = np.mean([_sdr(src_ref[i], src_est[perm[i]]) for i in range(c)])
        best = max(best, sdr)
    base = np.mean([_sdr(src_ref[i], mix) for i in range(c)])
    return best - base, best
