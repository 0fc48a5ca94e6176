"""DeepSpeech2 ASR model.

TPU-native re-design of reference ``mindaudio/models/deepspeech2.py``:
``MaskConv`` (deepspeech2.py:58), ``BatchRNN`` (deepspeech2.py:119),
``DeepSpeechModel`` (deepspeech2.py:190). Two masked 2-D convs over the
spectrogram, a stack of summed-bidirectional LSTMs (the reference's
cuDNN/CANN LSTM becomes a ``jax.lax.scan`` cell — the idiomatic XLA RNN),
and a time-distributed projection to characters.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.mask import make_non_pad_mask

__all__ = ["DeepSpeechModel"]


class BatchRNN(nn.Module):
    """BN → bidirectional LSTM with summed directions (reference deepspeech2.py:119).

    The recurrence is ``flax.linen.RNN`` (``lax.scan`` under jit) — the
    idiomatic XLA replacement for the reference's cuDNN/CANN fused LSTM.
    """

    hidden: int
    use_batch_norm: bool = True
    # BN momentum 0.9 matches the MindSpore default the reference trains with
    # (flax's 0.99 needs ~10x more steps before eval-mode running stats work)

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="bn")(x)
        # seq_lengths matters for the backward direction: without it the
        # reverse scan starts inside the trailing padding and pushes
        # padding-derived state into valid frames, making logits (and WER)
        # depend on how much the batch happens to be padded
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")(
            x, seq_lengths=lengths)
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden), reverse=True, keep_order=True, name="bwd"
        )(x, seq_lengths=lengths)
        return fwd + bwd


class MaskConv(nn.Module):
    """Two Conv2d(+BN+hardtanh) blocks with sequence-length masking
    (reference deepspeech2.py:58). Input (B, 1, F, T) conceptually; here we use
    (B, T, F, C) NHWC and mask along T.
    """

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        # conv1: kernel (time 11, freq 41), stride (2, 2)
        x = nn.Conv(32, (11, 41), strides=(2, 2), padding=((5, 5), (20, 20)), name="conv1")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="bn1")(x)
        x = jnp.clip(x, 0.0, 20.0)
        lengths = (lengths + 2 * 5 - 11) // 2 + 1
        x = jnp.where(make_non_pad_mask(lengths, x.shape[1])[:, :, None, None], x, 0.0)

        # conv2: kernel (time 11, freq 21), stride (1, 2)
        x = nn.Conv(32, (11, 21), strides=(1, 2), padding=((5, 5), (10, 10)), name="conv2")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="bn2")(x)
        x = jnp.clip(x, 0.0, 20.0)
        x = jnp.where(make_non_pad_mask(lengths, x.shape[1])[:, :, None, None], x, 0.0)
        return x, lengths


class DeepSpeechModel(nn.Module):
    """Conv front-end → N summed-BiLSTM layers → FC head (reference deepspeech2.py:190).

    ``__call__(spect, lengths)``: ``spect`` is ``(B, T, F)`` log-spectrogram
    (F = n_fft // 2 + 1), returns ``(log_probs_or_logits (B, T', vocab),
    out_lengths (B,))``.
    """

    vocab_size: int = 29
    hidden_size: int = 1024
    num_rnn_layers: int = 5

    @nn.compact
    def __call__(self, spect, lengths, deterministic=True):
        x = spect[..., None]  # (B, T, F, 1)
        x, out_lens = MaskConv(name="conv")(x, lengths, deterministic=deterministic)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)

        for i in range(self.num_rnn_layers):
            x = BatchRNN(self.hidden_size, use_batch_norm=(i != 0), name=f"rnn_{i}")(
                x, lengths=out_lens, deterministic=deterministic
            )

        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="head_bn")(x)
        logits = nn.Dense(self.vocab_size, use_bias=False, name="fc")(x)
        return logits, out_lens
