"""CTC loss on TPU.

Replaces the reference's ``ops.CTCLossV2`` native kernel (reference
loss/ctc_loss.py:10-87) with ``optax.ctc_loss`` — XLA's log-alpha recursion
compiles to an on-chip ``scan``. Interface: time-major-free, batched,
mask-aware, mean over batch like the reference's ``reduction='mean'``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["ctc_loss"]


def ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id=0):
    """Mean CTC negative log-likelihood.

    Args:
        logits: ``(B, T, vocab)`` unnormalized scores (optax applies
            log-softmax internally).
        logit_lengths: ``(B,)`` valid frame counts.
        labels: ``(B, L)`` target ids padded with anything (masked by
            ``label_lengths``); must not contain ``blank_id`` in valid slots.
        label_lengths: ``(B,)`` target lengths.
        blank_id: CTC blank index (reference uses 0 for DS2, vocab-1 option for
            Conformer via config).

    Returns:
        scalar mean loss over the batch.
    """
    t = logits.shape[1]
    L = labels.shape[1]
    logit_paddings = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    label_paddings = (jnp.arange(L)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    return per_seq.mean()
