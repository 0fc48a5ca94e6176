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

    # Clamp strictly inside (-1, 1) before the sine: d/dx sqrt(1-x^2) is
    # infinite at |x|=1, and on TPU the bf16 MXU cosine of two normalized
    # vectors routinely lands at 1.0 or slightly above — unclamped, one such
    # hit makes the whole gradient NaN (observed: all-NaN params after the
    # first ECAPA train step on chip, while f32 CPU never reproduces it).
    cosine_in = jnp.clip(cosine, -1.0 + 1e-4, 1.0 - 1e-4)
    sine = jnp.sqrt(1.0 - cosine_in**2)
    phi = cosine_in * cos_m - sine * sin_m  # cos(θ + m)
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
