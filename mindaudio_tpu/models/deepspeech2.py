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
import numpy as np

from ..utils.mask import make_non_pad_mask

__all__ = ["DeepSpeechModel", "BiLSTM", "flip_valid"]


def flip_valid(x, lengths):
    """Flip each row's valid prefix along time, padding stays at the end
    (``[a, b, c, pad, pad] -> [c, b, a, pad, pad]``) — the flax
    ``flip_sequences`` semantic the backward LSTM direction needs so its
    scan never starts inside trailing padding."""
    t = x.shape[1]
    if lengths is None:
        return x[:, ::-1]
    # (arange(T-1..0) + len) % T: valid prefix reversed, padding rotated to
    # the tail — the exact flax flip_sequences index map, so outputs match
    # the flax RNN bit-for-bit even at padding positions
    idx = (jnp.arange(t - 1, -1, -1)[None, :] + lengths[:, None]) % t
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def _block_init(per_block_init, n_blocks, block_cols):
    """Initializer building ``n_blocks`` column blocks with ``per_block_init``
    each — keeps per-gate init statistics (lecun input / orthogonal
    recurrent) identical to flax's per-gate ``OptimizedLSTMCell`` denses."""

    def init(key, shape, dtype=jnp.float32):
        *lead, rows, cols = shape
        assert cols == n_blocks * block_cols, (shape, n_blocks, block_cols)
        n_lead = int(np.prod(lead)) if lead else 1
        keys = jax.random.split(key, n_lead * n_blocks)
        mats = []
        for pos in range(n_lead):
            mats.append(jnp.concatenate(
                [per_block_init(keys[pos * n_blocks + g], (rows, block_cols),
                                dtype) for g in range(n_blocks)], axis=-1))
        out = jnp.stack(mats, 0).reshape(tuple(lead) + (rows, cols))
        return out.astype(dtype)

    return init


class BiLSTM(nn.Module):
    """Bidirectional LSTM with hoisted input projections, both directions in
    ONE ``lax.scan``.

    Numerically identical to a pair of
    ``flax.linen.RNN(OptimizedLSTMCell(hidden))`` (forward + reverse with
    ``seq_lengths``/``keep_order``) but shaped for the MXU: the input
    projection for all T frames and both directions is a single
    ``(B, T, D) x (2, D, 4H)`` contraction OUTSIDE the scan (flax's cell
    re-does its ``x @ W_x`` inside every scan step — measured 2.9x slower at
    DS2 size), and the scan body is just the ``(2, B, H) x (2, H, 4H)``
    recurrent matmul plus elementwise gates. Returns ``fwd + bwd`` (the
    reference sums directions, deepspeech2.py:119).
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32
    unroll: int = 8
    # remat the scan body: XLA otherwise saves every step's gate activations
    # for the backward (~0.7 GB/layer at the recipe's 1250-frame pad — the
    # full DS2 train step wanted 10+ GB of temp and crashed the 16 GB chip);
    # checkpointing keeps only the inter-step carries and recomputes gates
    # during the backward scan
    remat: bool = True

    @nn.compact
    def __call__(self, x, lengths=None):
        b, t, d = x.shape
        h = self.hidden
        # axis 0 = direction (0 fwd, 1 bwd); gate order (i, f, g, o) matches
        # flax's OptimizedLSTMCell concat order for param-mapping tests
        wx = self.param("wx", _block_init(nn.initializers.lecun_normal(), 4, h),
                        (2, d, 4 * h))
        wh = self.param("wh", _block_init(nn.initializers.orthogonal(), 4, h),
                        (2, h, 4 * h))
        bias = self.param("bias", nn.initializers.zeros_init(), (2, 4 * h))

        # compute dtype (bf16 = the TPU counterpart of the reference's fp16
        # loss-scale mode, deepspeech2.yaml loss_scale:1024 — bf16's range
        # needs no scale); cell state stays f32 below for accumulation
        wx, wh = wx.astype(self.dtype), wh.astype(self.dtype)
        bias = bias.astype(self.dtype)
        x = x.astype(self.dtype)

        xz = jnp.einsum("btd,ndk->nbtk", x, wx)  # ONE MXU pass for all T
        # flipping commutes with the (time-pointwise) projection, so the
        # backward direction flips the projected sequence, not the input
        xz = jnp.stack([xz[0], flip_valid(xz[1], lengths)], 0)

        def step(carry, inp):  # inp: (2, B, 4H)
            c, hh = carry
            gates = inp + jnp.einsum("nbh,nhk->nbk", hh, wh) + bias[:, None, :]
            gi, gf, gg, go = jnp.split(gates.astype(jnp.float32), 4, axis=-1)
            c = nn.sigmoid(gf) * c + nn.sigmoid(gi) * jnp.tanh(gg)
            hh = (nn.sigmoid(go) * jnp.tanh(c)).astype(self.dtype)
            return (c, hh), hh

        zeros_c = jnp.zeros((2, b, h), jnp.float32)
        zeros_h = jnp.zeros((2, b, h), self.dtype)
        body = jax.checkpoint(step) if self.remat else step
        _, ys = jax.lax.scan(body, (zeros_c, zeros_h),
                             jnp.moveaxis(xz, 2, 0), unroll=self.unroll)
        ys = jnp.moveaxis(ys, 0, 2)  # (2, B, T, H)
        return ys[0] + flip_valid(ys[1], lengths)


class BatchRNN(nn.Module):
    """BN → bidirectional LSTM with summed directions (reference deepspeech2.py:119).

    The recurrence is :class:`BiLSTM` — a ``lax.scan`` with the input
    projections hoisted out, the TPU-native replacement for the reference's
    cuDNN/CANN fused LSTM.
    """

    hidden: int
    use_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32
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
        return BiLSTM(self.hidden, dtype=self.dtype, name="bilstm")(x, lengths=lengths)


class MaskConv(nn.Module):
    """Two Conv2d(+BN+hardtanh) blocks with sequence-length masking
    (reference deepspeech2.py:58). Input (B, 1, F, T) conceptually; here we use
    (B, T, F, C) NHWC and mask along T.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths, deterministic=True):
        # conv1: kernel (time 11, freq 41), stride (2, 2)
        x = nn.Conv(32, (11, 41), strides=(2, 2), padding=((5, 5), (20, 20)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="bn1")(x)
        x = jnp.clip(x, 0.0, 20.0)
        lengths = (lengths + 2 * 5 - 11) // 2 + 1
        x = jnp.where(make_non_pad_mask(lengths, x.shape[1])[:, :, None, None], x, 0.0)

        # conv2: kernel (time 11, freq 21), stride (1, 2)
        x = nn.Conv(32, (11, 21), strides=(1, 2), padding=((5, 5), (10, 10)),
                    dtype=self.dtype, name="conv2")(x)
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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spect, lengths, deterministic=True):
        x = spect[..., None]  # (B, T, F, 1)
        x, out_lens = MaskConv(dtype=self.dtype, name="conv")(
            x, lengths, deterministic=deterministic)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)

        for i in range(self.num_rnn_layers):
            x = BatchRNN(self.hidden_size, use_batch_norm=(i != 0),
                         dtype=self.dtype, name=f"rnn_{i}")(
                x, lengths=out_lens, deterministic=deterministic
            )

        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="head_bn")(x)
        # logits in f32: the CTC log-softmax and loss want full precision
        logits = nn.Dense(self.vocab_size, use_bias=False, name="fc")(
            x.astype(jnp.float32))
        return logits, out_lens
