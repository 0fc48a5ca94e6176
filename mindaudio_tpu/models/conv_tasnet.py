"""Conv-TasNet speech separation.

TPU-native re-design of reference ``mindaudio/models/conv_tasnet.py``:
``Encoder`` (conv_tasnet.py:80), ``TemporalConvNet`` TCN separator (:193) with
``TemporalBlock`` (:272) / ``DepthwiseSeparableConv`` (:335), channel/global
LayerNorm (:415/:439), ``Decoder`` (:122). The reference's hard-coded
6398×3199 overlap-add matrix hack (conv_tasnet.py:113-119) is replaced by the
shape-generic ``ops.overlap_and_add`` segment-sum.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.spectral import overlap_and_add

__all__ = ["ConvTasNet"]


class ChannelwiseLayerNorm(nn.Module):
    """Normalize over the channel axis only (reference conv_tasnet.py:415)."""

    @nn.compact
    def __call__(self, x):  # (B, K, C)
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, x.shape[-1]))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, x.shape[-1]))
        return gamma * (x - mean) / jnp.sqrt(var + 1e-8) + beta


class GlobalLayerNorm(nn.Module):
    """Normalize over both time and channels (gLN, reference conv_tasnet.py:439)."""

    @nn.compact
    def __call__(self, x):  # (B, K, C)
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, x.shape[-1]))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, x.shape[-1]))
        return gamma * (x - mean) / jnp.sqrt(var + 1e-8) + beta


def _norm(norm_type, name):
    if norm_type == "gLN":
        return GlobalLayerNorm(name=name)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(name=name)
    raise ValueError(f"Unsupported norm type {norm_type}")


class DepthwiseSeparableConv(nn.Module):
    """Depthwise dilated conv + pointwise conv with PReLU/norm in between
    (reference conv_tasnet.py:335)."""

    out_channels: int
    kernel_size: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x):  # (B, K, H)
        h = x.shape[-1]
        pad = (self.kernel_size - 1) * self.dilation
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        y = nn.Conv(
            h, (self.kernel_size,), kernel_dilation=(self.dilation,),
            feature_group_count=h, padding=padding, use_bias=False, name="depthwise",
        )(x)
        y = nn.PReLU()(y)
        y = _norm(self.norm_type, "norm")(y)
        return nn.Conv(self.out_channels, (1,), use_bias=False, name="pointwise")(y)


class TemporalBlock(nn.Module):
    """1×1 conv → PReLU → norm → depthwise-separable conv, residual
    (reference conv_tasnet.py:272)."""

    bottleneck_channels: int
    hidden_channels: int
    kernel_size: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x):  # (B, K, Bc)
        y = nn.Conv(self.hidden_channels, (1,), use_bias=False, name="conv1x1")(x)
        y = nn.PReLU()(y)
        y = _norm(self.norm_type, "norm")(y)
        y = DepthwiseSeparableConv(
            self.bottleneck_channels, self.kernel_size, self.dilation,
            self.norm_type, self.causal, name="dsconv",
        )(y)
        return x + y


class ConvTasNet(nn.Module):
    """Conv-TasNet (reference conv_tasnet.py:12).

    ``__call__(mixture)`` with ``(B, T)`` raw audio returns ``(B, C, T)``
    separated sources.

    Hyperparameters follow the reference defaults: N=512 basis, L=16 window,
    B=128 bottleneck, H=512 hidden, P=3 kernel, X=8 blocks, R=3 repeats, C=2.
    """

    enc_dim: int = 512  # N
    win_len: int = 16  # L (samples, 50% overlap)
    bottleneck: int = 128  # B
    hidden: int = 512  # H
    kernel_size: int = 3  # P
    num_blocks: int = 8  # X
    num_repeats: int = 3  # R
    num_spk: int = 2  # C
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, mixture, deterministic=True):
        b, t = mixture.shape
        L, hop = self.win_len, self.win_len // 2

        # frame: (B, K, L). Ceil frame count: every input sample must land in
        # a frame (floor would truncate up to hop-1 tail samples to silence).
        k = max(-(-(t - L) // hop) + 1, 1) if t > L else 1
        need = (k - 1) * hop + L
        x = mixture if t >= need else jnp.pad(mixture, ((0, 0), (0, need - t)))
        x = x[:, :need]
        frames = jnp.concatenate(
            [
                x[:, j * hop : (k + j - 1) * hop + hop].reshape(b, k, hop)
                for j in range(L // hop)
            ],
            axis=-1,
        )

        # encoder: ReLU(conv1d) (B, K, N)
        w = jax.nn.relu(nn.Dense(self.enc_dim, use_bias=False, name="encoder")(frames))

        # TCN separator → masks
        y = ChannelwiseLayerNorm(name="layer_norm")(w)
        y = nn.Conv(self.bottleneck, (1,), use_bias=False, name="bottleneck_conv1x1")(y)
        for r in range(self.num_repeats):
            for xi in range(self.num_blocks):
                y = TemporalBlock(
                    self.bottleneck, self.hidden, self.kernel_size,
                    dilation=2**xi, norm_type=self.norm_type, causal=self.causal,
                    name=f"tcn_r{r}_x{xi}",
                )(y)
        score = nn.Conv(self.num_spk * self.enc_dim, (1,), use_bias=False, name="mask_conv1x1")(y)
        score = score.reshape(b, k, self.num_spk, self.enc_dim)
        if self.mask_nonlinear == "softmax":
            masks = jax.nn.softmax(score, axis=2)
        else:
            masks = jax.nn.relu(score)

        # decode: (B, C, K, L) → overlap-add → (B, C, T)
        src_w = w[:, :, None, :] * masks
        est = nn.Dense(L, use_bias=False, name="decoder")(src_w)
        est = est.transpose(0, 2, 1, 3)
        out = overlap_and_add(est, hop)
        if out.shape[-1] < t:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, t - out.shape[-1])))
        return out[..., :t]
