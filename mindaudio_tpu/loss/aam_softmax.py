"""Additive angular margin (AAM-softmax) for speaker verification.

Port of reference ``mindaudio/loss/AdditiveAngularMargin.py:8``: cosine logits
get ``cos(θ + m)`` applied at the target class (scaled cross-entropy is applied
by the caller).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["additive_angular_margin", "aam_softmax_loss"]


def additive_angular_margin(cosine, targets_onehot, margin=0.2, scale=30.0, easy_margin=False):
    """Apply the angular margin to cosine logits.

    Args:
        cosine: ``(B, classes)`` cosine similarities in [-1, 1].
        targets_onehot: ``(B, classes)`` one-hot targets.
        margin / scale: AAM hyperparameters.
        easy_margin: use the monotonic-safe variant only where cos > 0.

    Returns:
        ``(B, classes)`` margined logits, scaled by ``scale``.
    """
    cos_m = np.cos(margin)
    sin_m = np.sin(margin)
    th = np.cos(np.pi - margin)
    mm = np.sin(np.pi - margin) * margin

    sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
    phi = cosine * cos_m - sine * sin_m  # cos(θ + m)
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine > th, phi, cosine - mm)
    return scale * jnp.where(targets_onehot > 0, phi, cosine)


def aam_softmax_loss(cosine, targets, margin=0.2, scale=30.0, easy_margin=False):
    """Cross-entropy over AAM-margined cosine logits; ``targets`` int ``(B,)``."""
    onehot = jax.nn.one_hot(targets, cosine.shape[-1])
    logits = additive_angular_margin(cosine, onehot, margin, scale, easy_margin)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -(onehot * logp).sum(-1).mean()
