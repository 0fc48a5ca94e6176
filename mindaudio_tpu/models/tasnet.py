"""TasNet speech separation (LSTM-mask variant).

TPU-native re-design of reference ``mindaudio/models/tasnet.py``: ``Encoder``
(tasnet.py:43, gated 1-D conv: conv × sigmoid(conv)), ``Separator``
(tasnet.py:93, LayerNorm + 4-layer LSTM + softmax masks), ``Decoder``
(tasnet.py:136). Frames are L2-normalized per frame with the norm coefficient
carried to the decoder, as in the reference.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.spectral import overlap_and_add

__all__ = ["TasNet"]


class TasNet(nn.Module):
    """``__call__(mixture)`` with mixture ``(B, K, L)`` pre-framed segments
    returns separated sources ``(B, C, K, L)``.

    ``frame_waveform``/``reconstruct`` handle the framing round-trip for raw
    ``(B, T)`` audio with 50% overlap (hop = L // 2).
    """

    enc_dim: int = 500  # N basis signals
    frame_len: int = 40  # L samples per frame (5 ms @ 8 kHz)
    num_spk: int = 2
    hidden: int = 500
    num_layers: int = 4

    @nn.compact
    def __call__(self, mixture, deterministic=True):
        b, k, L = mixture.shape
        eps = 1e-8

        # per-frame L2 norm (kept for the decoder)
        norm_coef = jnp.sqrt(jnp.sum(mixture**2, axis=-1, keepdims=True) + eps)  # (B,K,1)
        norm_mix = mixture / norm_coef

        # gated conv encoder: (B, K, N)
        conv = nn.Dense(self.enc_dim, use_bias=False, name="conv1d_U")(norm_mix)
        gate = nn.Dense(self.enc_dim, use_bias=False, name="conv1d_V")(norm_mix)
        w = jax.nn.relu(conv) * jax.nn.sigmoid(gate)

        # separator: LN + stacked (bidirectional) LSTM + per-source masks
        x = nn.LayerNorm(name="layer_norm")(w)
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name=f"lstm_f{i}")(x)
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden), reverse=True, keep_order=True,
                name=f"lstm_b{i}",
            )(x)
            x = fwd + bwd
        score = nn.Dense(self.num_spk * self.enc_dim, name="fc_mask")(x)
        score = score.reshape(b, k, self.num_spk, self.enc_dim)
        masks = jax.nn.softmax(score, axis=2)  # (B, K, C, N)

        # apply masks and decode
        sources_w = w[:, :, None, :] * masks  # (B, K, C, N)
        est = nn.Dense(self.frame_len, use_bias=False, name="basis_signals")(sources_w)
        est = est * norm_coef[:, :, None, :]
        return est.transpose(0, 2, 1, 3)  # (B, C, K, L)

    def frame_waveform(self, audio):
        """(B, T) → (B, K, L) 50%-overlap frames (pads the tail).

        ``k`` is the ceil frame count so every sample is covered — floor
        division would silently drop up to ``hop - 1`` tail samples and
        reconstruct them as silence.
        """
        L = self.frame_len
        hop = L // 2
        b, t = audio.shape
        k = max(-(-(t - L) // hop) + 1, 1) if t > L else 1
        need = (k - 1) * hop + L
        if t < need:
            audio = jnp.pad(audio, ((0, 0), (0, need - t)))
        idx0 = jnp.arange(k) * hop
        frames = jax.vmap(
            lambda a: jax.vmap(lambda s: jax.lax.dynamic_slice(a, (s,), (L,)))(idx0)
        )(audio)
        return frames

    def reconstruct(self, est_source):
        """(B, C, K, L) → (B, C, T) via overlap-add with hop = L // 2."""
        return overlap_and_add(est_source, self.frame_len // 2)
