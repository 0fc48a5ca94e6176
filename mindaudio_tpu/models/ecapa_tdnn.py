"""ECAPA-TDNN speaker-embedding model.

TPU-native re-design of reference ``mindaudio/models/ecapatdnn.py``:
``TDNNBlock`` (ecapatdnn.py:35), ``Res2NetBlock`` (:67), ``SEBlock`` (:117),
``SERes2NetBlock`` (:159), ``AttentiveStatisticsPooling`` (:243), ``EcapaTDNN``
(:306), cosine ``Classifier`` (:436).

Layout is (B, T, C) throughout; dilated 1-D convs are ``nn.Conv`` with
``kernel_dilation`` (SAME padding like the reference's pad-preserving convs).
Length masking is threaded through the statistics pooling so padded frames
never contaminate the embedding.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.mask import make_non_pad_mask

__all__ = ["EcapaTDNN", "Classifier"]


class TDNNBlock(nn.Module):
    """Conv1d → ReLU → BatchNorm (reference ecapatdnn.py:35)."""

    out_channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            name="conv",
        )(x)
        x = jax.nn.relu(x)
        return nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="bn")(x)


class Res2NetBlock(nn.Module):
    """Split-scale residual convolutions, scale-wise accumulation
    (reference ecapatdnn.py:67)."""

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, deterministic=True):
        hidden = self.out_channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outs = [chunks[0]]
        y = None
        for i in range(1, self.scale):
            xi = chunks[i] if y is None else chunks[i] + y
            y = TDNNBlock(hidden, self.kernel_size, self.dilation, name=f"tdnn_{i}")(
                xi, deterministic=deterministic
            )
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-and-excitation over time (reference ecapatdnn.py:117)."""

    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        if lengths is not None:
            mask = make_non_pad_mask(lengths, x.shape[1])[..., None]
            total = jnp.maximum(mask.sum(axis=1), 1.0)
            s = (x * mask).sum(axis=1, keepdims=True) / total[:, None]
        else:
            s = x.mean(axis=1, keepdims=True)
        s = jax.nn.relu(nn.Dense(self.se_channels, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.out_channels, name="fc2")(s))
        return x * s


class SERes2NetBlock(nn.Module):
    """TDNN → Res2Net → TDNN → SE with residual (reference ecapatdnn.py:159)."""

    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,), name="shortcut")(x)
        y = TDNNBlock(self.out_channels, 1, 1, name="tdnn1")(x, deterministic=deterministic)
        y = Res2NetBlock(
            self.out_channels, self.res2net_scale, self.kernel_size, self.dilation, name="res2net"
        )(y, deterministic=deterministic)
        y = TDNNBlock(self.out_channels, 1, 1, name="tdnn2")(y, deterministic=deterministic)
        y = SEBlock(self.se_channels, self.out_channels, name="se")(
            y, lengths=lengths, deterministic=deterministic
        )
        return y + residual


class AttentiveStatisticsPooling(nn.Module):
    """Attention-weighted mean ‖ std pooling (reference ecapatdnn.py:243).

    Global context (mean, std over time) is concatenated to each frame before
    the attention TDNN, as in the reference.
    """

    attention_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        b, t, c = x.shape
        eps = 1e-12
        if lengths is None:
            mask = jnp.ones((b, t, 1), x.dtype)
        else:
            mask = make_non_pad_mask(lengths, t)[..., None].astype(x.dtype)
        total = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)

        def masked_stats(v, w):
            mean = (v * w).sum(axis=1, keepdims=True) / total
            var = ((v - mean) ** 2 * w).sum(axis=1, keepdims=True) / total
            return mean, jnp.sqrt(jnp.maximum(var, eps))

        if self.global_context:
            mean, std = masked_stats(x, mask)
            attn_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
            )
        else:
            attn_in = x

        a = TDNNBlock(self.attention_channels, 1, 1, name="tdnn")(
            attn_in, deterministic=deterministic
        )
        a = jnp.tanh(a)
        a = nn.Conv(c, (1,), name="conv")(a)
        a = jnp.where(mask > 0, a, -1e9)
        a = jax.nn.softmax(a, axis=1)

        mean = (x * a).sum(axis=1)
        var = ((x - mean[:, None]) ** 2 * a).sum(axis=1)
        std = jnp.sqrt(jnp.maximum(var, eps))
        return jnp.concatenate([mean, std], axis=-1)[:, None, :]  # (B, 1, 2C)


class EcapaTDNN(nn.Module):
    """ECAPA-TDNN embedding network (reference ecapatdnn.py:306).

    ``__call__(x)`` with ``x`` (B, T, n_mels) log-fbank features returns
    (B, 1, lin_neurons) embeddings.
    """

    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    lin_neurons: int = 192
    global_context: bool = True

    @nn.compact
    def __call__(self, x, lengths=None, deterministic=True):
        feats = []
        x = TDNNBlock(self.channels[0], self.kernel_sizes[0], self.dilations[0], name="block_0")(
            x, deterministic=deterministic
        )
        feats.append(x)
        for i in range(1, len(self.channels) - 1):
            x = SERes2NetBlock(
                self.channels[i],
                res2net_scale=self.res2net_scale,
                se_channels=self.se_channels,
                kernel_size=self.kernel_sizes[i],
                dilation=self.dilations[i],
                name=f"block_{i}",
            )(x, lengths=lengths, deterministic=deterministic)
            feats.append(x)

        # Multi-layer feature aggregation (skip the first block's output)
        x = jnp.concatenate(feats[1:], axis=-1)
        x = TDNNBlock(self.channels[-1], self.kernel_sizes[-1], self.dilations[-1], name="mfa")(
            x, deterministic=deterministic
        )
        x = AttentiveStatisticsPooling(
            self.attention_channels, self.global_context, name="asp"
        )(x, lengths=lengths, deterministic=deterministic)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name="asp_bn")(x)
        return nn.Conv(self.lin_neurons, (1,), name="fc")(x)  # (B, 1, emb)


class Classifier(nn.Module):
    """Cosine-similarity classifier head for AAM-softmax training
    (reference ecapatdnn.py:436): L2-normalize embeddings and class weights,
    output cosine logits.
    """

    out_neurons: int
    lin_blocks: int = 0
    lin_neurons: int = 192

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x.reshape(x.shape[0], -1)
        for i in range(self.lin_blocks):
            x = nn.Dense(self.lin_neurons, name=f"linear_{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, name=f"bn_{i}")(x)
        w = self.param(
            "weight", nn.initializers.xavier_uniform(), (self.lin_neurons, self.out_neurons)
        )
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return x @ w  # cosine logits (B, out_neurons)
