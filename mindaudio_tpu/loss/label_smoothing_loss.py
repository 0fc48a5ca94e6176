"""Label-smoothing KL-divergence loss for the attention decoder branch.

Port of reference ``mindaudio/loss/label_smoothing_loss.py`` (KLDivLoss :10,
LabelSmoothingLoss :24): smoothed one-hot targets, pad positions masked by
``ignore_id``, normalized by batch size (default) or token count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["label_smoothing_loss"]

IGNORE_ID = -1


def label_smoothing_loss(
    logits, targets, smoothing=0.1, ignore_id=IGNORE_ID, normalize_length=False
):
    """KL(smoothed one-hot ‖ softmax(logits)), pad-masked.

    Args:
        logits: ``(B, L, vocab)``.
        targets: ``(B, L)`` int ids, ``ignore_id`` at padding.
        smoothing: mass distributed over non-target classes.
        normalize_length: divide by token count instead of batch size.
    """
    vocab = logits.shape[-1]
    confidence = 1.0 - smoothing
    low = smoothing / (vocab - 1)

    mask = targets != ignore_id
    safe_t = jnp.where(mask, targets, 0)
    true_dist = jax.nn.one_hot(safe_t, vocab) * (confidence - low) + low

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    kl = (true_dist * (jnp.log(jnp.maximum(true_dist, 1e-10)) - log_probs)).sum(-1)
    kl = jnp.where(mask, kl, 0.0)

    denom = jnp.maximum(mask.sum(), 1) if normalize_length else targets.shape[0]
    return kl.sum() / denom
