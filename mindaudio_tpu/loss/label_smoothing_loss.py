"""Label-smoothing KL-divergence loss for the attention decoder branch.

Port of reference ``mindaudio/loss/label_smoothing_loss.py`` (KLDivLoss :10,
LabelSmoothingLoss :24): smoothed one-hot targets, pad positions masked by
``ignore_id``, normalized by batch size (default) or token count.

TPU shape note: the smoothed target puts ``confidence`` on the target class
and a single constant ``low`` everywhere else, so the KL collapses to a
gather plus two row reductions —

    KL(p ‖ q) = Σ p log p − (conf − low)·log q[target] − low·Σ_v log q_v

— and no ``(B, L, vocab)`` one-hot / true-dist tensor is ever materialized
(the naive form costs ~3× (B,L,V) f32 intermediates in fwd+bwd at the
flagship's 4233-way vocab; the decoder branch is latency-bound small-shape
work, PERF.md round-5). ``tests/test_models.py::TestLabelSmoothing``
asserts value+grad equality vs the dense formulation.
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

    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B, L)
    logit_t = jnp.take_along_axis(logits, safe_t[..., None], axis=-1)[..., 0]
    logq_t = logit_t - lse
    sum_logq = logits.sum(-1) - vocab * lse

    # Σ p log p — a constant of the smoothing config, not of the logits
    plogp = confidence * jnp.log(confidence) if confidence > 0 else 0.0
    if low > 0:
        plogp = plogp + (vocab - 1) * low * jnp.log(low)

    kl = plogp - (confidence - low) * logq_t - low * sum_logq
    kl = jnp.where(mask, kl, 0.0)

    denom = jnp.maximum(mask.sum(), 1) if normalize_length else targets.shape[0]
    return kl.sum() / denom
