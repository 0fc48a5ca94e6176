"""SI-SNR + permutation-invariant training loss for source separation.

Re-design of reference ``mindaudio/loss/separation_loss.py``
(``Separation_Loss`` :13, ``Convtasnet_Loss`` :133): zero-mean projection
SI-SNR, PIT over all C! permutations via a vmapped gather — general in the
number of speakers, replacing the reference's hard-coded 2-speaker one-hot
matmuls and fixed mask lengths (separation_loss.py:95-109, 262-274).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cal_si_snr_jax", "pit_si_snr_loss"]


def cal_si_snr_jax(est, target, lengths=None, eps=1e-8):
    """Scale-invariant SNR in dB, per (batch, source).

    Args:
        est / target: ``(B, C, T)``.
        lengths: optional ``(B,)`` valid sample counts (padding excluded from
            all statistics).

    Returns:
        ``(B, C)`` SI-SNR values.
    """
    if lengths is not None:
        mask = (jnp.arange(est.shape[-1])[None, None, :] < lengths[:, None, None]).astype(est.dtype)
        n = jnp.maximum(lengths[:, None, None].astype(est.dtype), 1.0)
    else:
        mask = jnp.ones_like(est)
        n = jnp.asarray(est.shape[-1], est.dtype)

    est = est * mask
    target = target * mask
    est = est - est.sum(-1, keepdims=True) / n
    target = target - target.sum(-1, keepdims=True) / n
    est = est * mask
    target = target * mask

    dot = (est * target).sum(-1, keepdims=True)
    t_energy = (target**2).sum(-1, keepdims=True) + eps
    proj = dot * target / t_energy
    noise = est - proj
    ratio = (proj**2).sum(-1) / ((noise**2).sum(-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def pit_si_snr_loss(est, target, lengths=None):
    """Permutation-invariant −SI-SNR loss, O(C!) but general in C.

    Returns ``(loss, best_perm)``: scalar mean of the best permutation's
    negative SI-SNR and the per-batch best permutation indices ``(B, C)``.
    """
    c = est.shape[1]
    perms = jnp.asarray(list(itertools.permutations(range(c))))  # (P, C)

    def snr_for_perm(perm):
        return cal_si_snr_jax(est, target[:, perm, :], lengths).mean(-1)  # (B,)

    all_snr = jax.vmap(snr_for_perm)(perms)  # (P, B)
    best = jnp.argmax(all_snr, axis=0)  # (B,)
    max_snr = jnp.max(all_snr, axis=0)  # (B,)
    return -max_snr.mean(), perms[best]
