"""FastSpeech2 text-to-speech.

TPU-native re-design of reference ``mindaudio/models/fastspeech2_v190.py`` and
``models/transformer/``: FFT-block encoder/decoder (transformer/models.py:10/77,
layers.py:9), variance adaptor with duration/pitch/energy predictors and
bucketized embeddings (variance_adapter.py:34/92), mel linear head.

The reference works around MindSpore static graphs by pre-expanding phonemes by
ground-truth durations on host ("forward_expanded", fastspeech2_v190.py:84-144).
Here the LengthRegulator runs **on device** under a static ``max_mel_len``
bound: output frame t maps to phoneme ``searchsorted(cumsum(dur), t)`` — one
gather, fully jittable, so the whole training step stays on-chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.mask import make_non_pad_mask
from .layers import FastDropout, sinusoid_table

__all__ = ["FastSpeech2", "FastSpeech2WithLoss", "LengthRegulator"]

PAD = 0


class FFTBlock(nn.Module):
    """Multi-head self-attention + conv1d FFN with post-norm residuals
    (reference transformer/layers.py:9, sublayers.py:9/103)."""

    d_model: int
    head_num: int
    conv_filter: int
    conv_kernels: Sequence[int] = (9, 1)
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        # self-attention
        res = x
        d_k = self.d_model // self.head_num

        def proj(v, name):
            y = nn.Dense(self.d_model, name=name)(v)
            return y.reshape(v.shape[:-1] + (self.head_num, d_k)).transpose(0, 2, 1, 3)

        q, k, v = proj(x, "w_q"), proj(x, "w_k"), proj(x, "w_v")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = FastDropout(self.dropout_rate)(attn, deterministic=deterministic)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(x.shape)
        y = nn.Dense(self.d_model, name="fc")(y)
        y = FastDropout(self.dropout_rate)(y, deterministic=deterministic)
        x = nn.LayerNorm(name="attn_norm")(res + y)
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)

        # conv FFN
        res = x
        y = nn.Conv(self.conv_filter, (self.conv_kernels[0],), padding="SAME", name="conv1")(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.d_model, (self.conv_kernels[1],), padding="SAME", name="conv2")(y)
        y = FastDropout(self.dropout_rate)(y, deterministic=deterministic)
        x = nn.LayerNorm(name="ffn_norm")(res + y)
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        return x


class VariancePredictor(nn.Module):
    """2× (conv1d → ReLU → LN → dropout) → linear scalar head
    (reference variance_adapter.py:34)."""

    filter_size: int = 256
    kernel_size: int = 3
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        y = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME", name="conv1")(x)
        y = jax.nn.relu(y)
        y = nn.LayerNorm(name="ln1")(y)
        y = FastDropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME", name="conv2")(y)
        y = jax.nn.relu(y)
        y = nn.LayerNorm(name="ln2")(y)
        y = FastDropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(1, name="linear")(y)[..., 0]
        if mask is not None:
            y = jnp.where(mask, y, 0.0)
        return y


class LengthRegulator(nn.Module):
    """Expand phoneme features by durations, entirely on device
    (replaces reference variance_adapter.py:8 host repeat-expansion).

    ``__call__(x, durations, max_len)``: output frame t takes phoneme
    ``p(t) = #{i : cumsum(dur)[i] <= t}``; frames beyond total duration are
    zeroed. Returns ``(expanded (B, max_len, D), mel_len (B,))``.
    """

    @nn.compact
    def __call__(self, x, durations, max_len):
        cum = jnp.cumsum(durations, axis=-1)  # (B, L)
        total = cum[:, -1]
        t_idx = jnp.arange(max_len)[None, :, None]  # (1, T, 1)
        # phoneme index per output frame via vectorized searchsorted
        idx = (t_idx >= cum[:, None, :]).sum(-1)  # (B, T)
        idx = jnp.minimum(idx, x.shape[1] - 1)
        expanded = jnp.take_along_axis(x, idx[..., None], axis=1)
        valid = jnp.arange(max_len)[None, :] < total[:, None]
        return jnp.where(valid[..., None], expanded, 0.0), jnp.minimum(total, max_len)


class VarianceAdaptor(nn.Module):
    """Duration/pitch/energy prediction + bucketized embeddings
    (reference variance_adapter.py:92). Phoneme-level pitch/energy features."""

    d_model: int = 256
    n_bins: int = 256
    pitch_range: Sequence[float] = (-2.917, 11.391)  # LJSpeech stats (log-f0-ish)
    energy_range: Sequence[float] = (-1.431, 8.184)

    def setup(self):
        self.duration_predictor = VariancePredictor(name="duration_predictor")
        self.pitch_predictor = VariancePredictor(name="pitch_predictor")
        self.energy_predictor = VariancePredictor(name="energy_predictor")
        self.length_regulator = LengthRegulator(name="length_regulator")
        # unit-variance init for the same reason as src_embed (torch lineage)
        self.pitch_embedding = nn.Embed(
            self.n_bins, self.d_model, name="pitch_embedding",
            embedding_init=nn.initializers.normal(1.0))
        self.energy_embedding = nn.Embed(
            self.n_bins, self.d_model, name="energy_embedding",
            embedding_init=nn.initializers.normal(1.0))
        self.pitch_bins = jnp.linspace(self.pitch_range[0], self.pitch_range[1], self.n_bins - 1)
        self.energy_bins = jnp.linspace(self.energy_range[0], self.energy_range[1], self.n_bins - 1)

    def _bucketize(self, values, bins):
        return jnp.sum(values[..., None] > bins, axis=-1)

    def __call__(
        self,
        x,
        src_mask,
        max_mel_len,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        p_control=1.0,
        e_control=1.0,
        d_control=1.0,
        deterministic=True,
    ):
        log_d_pred = self.duration_predictor(x, src_mask, deterministic)
        p_pred = self.pitch_predictor(x, src_mask, deterministic)
        pitch = pitch_target if pitch_target is not None else p_pred * p_control
        x = x + self.pitch_embedding(self._bucketize(pitch, self.pitch_bins))
        e_pred = self.energy_predictor(x, src_mask, deterministic)
        energy = energy_target if energy_target is not None else e_pred * e_control
        x = x + self.energy_embedding(self._bucketize(energy, self.energy_bins))

        if duration_target is not None:
            dur = duration_target
        else:
            dur = jnp.round((jnp.exp(log_d_pred) - 1.0) * d_control)
            dur = jnp.maximum(dur, 0.0).astype(jnp.int32)
            dur = jnp.where(src_mask, dur, 0)

        x, mel_len = self.length_regulator(x, dur, max_mel_len)
        return x, log_d_pred, p_pred, e_pred, mel_len


class FastSpeech2(nn.Module):
    """FFT encoder → variance adaptor → FFT decoder → mel head
    (reference fastspeech2_v190.py:10).

    ``__call__(phonemes, src_lens, max_mel_len, ...)`` returns
    ``(mel (B, T, n_mels), log_d_pred, p_pred, e_pred, mel_len, mel_mask)``.
    """

    vocab_size: int = 365
    d_model: int = 256
    n_mels: int = 80
    encoder_layers: int = 4
    decoder_layers: int = 6
    head_num: int = 2
    conv_filter: int = 1024
    max_seq_len: int = 2000
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(
        self,
        phonemes,
        src_lens,
        max_mel_len,
        pitch_target=None,
        energy_target=None,
        duration_target=None,
        p_control=1.0,
        e_control=1.0,
        d_control=1.0,
        deterministic=True,
    ):
        b, L = phonemes.shape
        src_mask = make_non_pad_mask(src_lens, L)  # (B, L) True=valid

        pos = jnp.asarray(sinusoid_table(self.max_seq_len, self.d_model))
        # Unit-variance embedding init (the reference's torch lineage:
        # nn.Embedding ~ N(0,1)). Flax's default 1/sqrt(d) init makes the
        # phone identity ~16x weaker than the sigma~0.7 sinusoid table the
        # encoder adds next, and the variance predictors then collapse to
        # the corpus mean for thousands of steps (measured: duration
        # predictions constant across phones at 4k steps).
        x = nn.Embed(self.vocab_size, self.d_model, name="src_embed",
                     embedding_init=nn.initializers.normal(1.0))(phonemes)
        x = x + pos[None, :L]
        for i in range(self.encoder_layers):
            x = FFTBlock(
                self.d_model, self.head_num, self.conv_filter,
                dropout_rate=self.dropout_rate, name=f"enc_{i}",
            )(x, mask=src_mask, deterministic=deterministic)

        x, log_d, p_pred, e_pred, mel_len = VarianceAdaptor(
            self.d_model, name="variance_adaptor"
        )(
            x, src_mask, max_mel_len,
            pitch_target=pitch_target, energy_target=energy_target,
            duration_target=duration_target,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=deterministic,
        )

        mel_mask = make_non_pad_mask(mel_len, max_mel_len)
        x = x + pos[None, :max_mel_len]
        for i in range(self.decoder_layers):
            x = FFTBlock(
                self.d_model, self.head_num, self.conv_filter,
                dropout_rate=self.dropout_rate, name=f"dec_{i}",
            )(x, mask=mel_mask, deterministic=deterministic)

        mel = nn.Dense(self.n_mels, name="mel_linear")(x)
        return mel, log_d, p_pred, e_pred, mel_len, mel_mask

    def infer(self, phonemes, src_lens, max_mel_len, p_control=1.0, e_control=1.0, d_control=1.0):
        """Inference path (reference fastspeech2_v190.py:149)."""
        return self(
            phonemes, src_lens, max_mel_len,
            p_control=p_control, e_control=e_control, d_control=d_control,
            deterministic=True,
        )


class FastSpeech2WithLoss(nn.Module):
    """Model + multi-term loss in one module (reference fastspeech2_v190.py:208)."""

    model: FastSpeech2

    @nn.compact
    def __call__(self, phonemes, src_lens, mel_target, pitch, energy, duration, deterministic=True):
        from ..loss.fastspeech2_loss import fastspeech2_loss

        max_mel_len = mel_target.shape[1]
        mel, log_d, p_pred, e_pred, mel_len, mel_mask = self.model(
            phonemes, src_lens, max_mel_len,
            pitch_target=pitch, energy_target=energy, duration_target=duration,
            deterministic=deterministic,
        )
        src_mask = make_non_pad_mask(src_lens, phonemes.shape[1])
        return fastspeech2_loss(
            mel, mel_target, log_d, duration, p_pred, pitch, e_pred, energy,
            src_mask, mel_mask,
        )
