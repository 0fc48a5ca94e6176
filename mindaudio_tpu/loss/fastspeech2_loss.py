"""FastSpeech2 multi-term loss.

Port of reference ``mindaudio/models/fastspeech2/loss.py:6``: masked MSE on
pitch/energy, masked MAE on log-duration and mel, each renormalized by its
mask density, summed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fastspeech2_loss"]


def fastspeech2_loss(
    mel_pred,
    mel_target,
    log_d_pred,
    duration_target,
    p_pred,
    p_target,
    e_pred,
    e_target,
    src_mask,
    mel_mask,
):
    """Returns ``(total, mel_loss, duration_loss, pitch_loss, energy_loss)``.

    ``src_mask``: (B, L) True=valid phoneme; ``mel_mask``: (B, T) True=valid
    frame.
    """
    src_m = src_mask.astype(jnp.float32)
    mel_m = mel_mask.astype(jnp.float32)
    src_n = jnp.maximum(src_m.sum(), 1.0)
    mel_n = jnp.maximum(mel_m.sum(), 1.0)

    log_d_target = jnp.log(duration_target.astype(jnp.float32) + 1.0)
    duration_loss = (jnp.abs(log_d_pred - log_d_target) * src_m).sum() / src_n
    pitch_loss = (((p_pred - p_target) ** 2) * src_m).sum() / src_n
    energy_loss = (((e_pred - e_target) ** 2) * src_m).sum() / src_n
    mel_loss = (jnp.abs(mel_pred - mel_target) * mel_m[..., None]).sum() / (
        mel_n * mel_pred.shape[-1]
    )

    total = mel_loss + duration_loss + pitch_loss + energy_loss
    return total, mel_loss, duration_loss, pitch_loss, energy_loss
