"""Shared Flax building blocks for the model zoo.

TPU-native counterparts of reference ``mindaudio/models/layers/``: masked MHSA
(attention.py:17), Transformer-XL rel-pos attention with u/v biases
(attention.py:156, bd-shift dropped like the reference :232-234), positional
encodings (embedding.py), the GLU-gated Conformer convolution module
(convolution.py:15), Conv2dSubsampling4 (subsampling.py:22), GlobalCMVN
(cmvn.py:6), and the position-wise FFN (positionwise_feed_forward.py:9).

Conventions:
- batch-time-feature ``(B, T, D)`` layout everywhere (XLA-friendly; the MXU
  contraction is always the last axis).
- boolean masks, True = attend; converted to additive form in f32 with a
  bf16-safe constant.
- every module takes ``dtype`` (compute, default bf16-capable) and keeps
  params in f32 (flax default ``param_dtype``).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MASK_VALUE = -1.0e9


def apply_mask(scores, mask):
    """Additive-mask attention scores; ``mask`` True = keep."""
    return jnp.where(mask, scores, jnp.asarray(MASK_VALUE, scores.dtype))


class FastDropout(nn.Module):
    """Dropout as an integer threshold on raw PRNG bits.

    ``nn.Dropout`` materializes a float32 uniform per mask element
    (hardware bits → float convert → compare); at B=32 conformer size the
    masks cost ~4 ms/step even on the rbg generator (PERF.md ablation).
    Comparing raw uint8 bits against a quantized threshold skips the float
    conversion and shrinks mask intermediates 4x; the keep-probability is
    exactly ``(256 - round(rate*256)) / 256`` and the kept values are
    rescaled by exactly that, so the expectation stays unbiased. Rate
    resolution of 1/256 is immaterial for regularization.

    Drop-in replacement for ``nn.Dropout(rate)(x, deterministic=...)``
    (same "dropout" RNG collection).
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        thresh = int(round(self.rate * 256.0))
        if deterministic or thresh <= 0:
            return x
        if thresh >= 256:  # rate ≈ 1.0: nn.Dropout(1.0) semantics — drop all
            return jnp.zeros_like(x)
        keep_prob = 1.0 - thresh / 256.0
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint8)
        keep = bits >= jnp.uint8(thresh)  # P(keep) = (256 - thresh)/256
        return jnp.where(keep, x / jnp.asarray(keep_prob, x.dtype),
                         jnp.zeros((), x.dtype))


class Swish(nn.Module):
    """x * sigmoid(x) (reference layers/swish.py:7)."""

    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(x)


class GLU(nn.Module):
    """Gated linear unit along ``axis`` (reference layers/glu.py:8)."""

    axis: int = -1

    @nn.compact
    def __call__(self, x):
        a, b = jnp.split(x, 2, axis=self.axis)
        return a * jax.nn.sigmoid(b)


class GlobalCMVN(nn.Module):
    """(x - mean) * istd with fixed stats (reference layers/cmvn.py:6)."""

    mean: jnp.ndarray
    istd: jnp.ndarray
    norm_var: bool = True

    @nn.compact
    def __call__(self, x):
        x = x - self.mean.astype(x.dtype)
        if self.norm_var:
            x = x * self.istd.astype(x.dtype)
        return x


class Int8Dense(nn.Module):
    """``nn.Dense`` drop-in whose forward runs on the int8 MXU (W8A8).

    Same param names/shapes as ``nn.Dense`` (``kernel``/``bias``, f32), so
    checkpoints and the TP sharding rules are unchanged. The forward
    quantizes both operands dynamically (per-row activations, per-channel
    weights) and contracts int8 x int8 → int32 — 2x the bf16 MXU rate on
    v5e, measured 1.38x end-to-end at the flagship FFN shape; the backward
    is bf16 from the unquantized operands (``ops.quant.int8_training_matmul``),
    so gradients match the bf16 step and only the forward sees the ~1%
    rounding error.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32  # accepted for API parity; fwd is int8

    @nn.compact
    def __call__(self, x):
        from mindaudio_tpu.ops.quant import int8_training_matmul

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        y = int8_training_matmul(x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + jnp.asarray(bias, y.dtype)
        return y


class PositionwiseFeedForward(nn.Module):
    """Two-layer FFN applied per position (reference layers/positionwise_feed_forward.py:9).

    ``int8=True`` runs both projections' forward on the int8 MXU
    (:class:`Int8Dense`) — the macaron FFNs dominate the Conformer step's
    FLOPs ~10:1 over attention (PERF.md), so this is where the v5e's 2x
    int8 rate pays.
    """

    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = jax.nn.relu
    int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        d_model = x.shape[-1]
        dense = Int8Dense if self.int8 else nn.Dense
        x = dense(self.hidden_units, dtype=self.dtype, name="Dense_0")(x)
        x = self.activation(x)
        x = FastDropout(self.dropout_rate)(x, deterministic=deterministic)
        return dense(d_model, dtype=self.dtype, name="Dense_1")(x)


class MultiHeadedAttention(nn.Module):
    """Masked multi-head attention (reference layers/attention.py:17).

    ``query/key/value``: (B, T, D). ``mask``: broadcastable to (B, 1, Tq, Tk),
    True = attend.
    """

    head_num: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def qkv(self, query, key, value):
        d_model = query.shape[-1]
        d_k = d_model // self.head_num

        def proj(x, name):
            y = nn.Dense(d_model, dtype=self.dtype, name=name)(x)
            return y.reshape(x.shape[:-1] + (self.head_num, d_k)).transpose(0, 2, 1, 3)

        return proj(query, "linear_q"), proj(key, "linear_k"), proj(value, "linear_v"), d_k

    def attend(self, scores, value, mask, deterministic):
        if mask is not None:
            scores = apply_mask(scores, mask)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = FastDropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, value)
        b, h, t, d_k = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d_k)
        return nn.Dense(h * d_k, dtype=self.dtype, name="linear_out")(out)

    @nn.compact
    def __call__(self, query, key, value, mask=None, pos_emb=None, deterministic=True):
        q, k, v, d_k = self.qkv(query, key, value)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(d_k, jnp.float32)
        ).astype(self.dtype)
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None, :, :]
        return self.attend(scores, v, mask, deterministic)


class RelPositionMultiHeadedAttention(nn.Module):
    """Transformer-XL relative-position attention with u/v biases.

    WeNet/reference convention (attention.py:156): ``score = (q+u)·k + (q+v)·p``
    where ``p`` projects the relative positional embedding; the bd matrix-shift
    is dropped exactly as in the reference (attention.py:232-234).

    Sequence parallelism (long-audio encoders; SURVEY §5.7 north star): when
    ``sp_mesh`` is set, the score decomposition above is folded into ONE
    standard attention with an augmented head dim —
    ``[q+u; q+v] · [k; p] = (q+u)·k + (q+v)·p`` — and routed through
    :func:`parallel.ring_attention.sequence_parallel_attention`, with the time
    axis sharded over ``sp_axis``. Restrictions on the SP path: padding masks
    only (no chunk masks), no streaming cache, and attention-weight dropout is
    skipped (the streaming-softmax kernel never materializes the weights).
    """

    head_num: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh
    sp_axis: str = "seq"
    sp_variant: str = "ring"
    sp_batch_axis: Optional[str] = "data"

    @nn.compact
    def __call__(self, query, key, value, mask=None, pos_emb=None,
                 deterministic=True, kv_cache=None):
        d_model = query.shape[-1]
        d_k = d_model // self.head_num

        def proj(x, name):
            y = nn.Dense(d_model, dtype=self.dtype, name=name)(x)
            return y.reshape(x.shape[:-1] + (self.head_num, d_k)).transpose(0, 2, 1, 3)

        q = proj(query, "linear_q")
        k = proj(key, "linear_k")
        v = proj(value, "linear_v")
        # streaming: prepend cached keys/values (left context from previous
        # chunks); pos_emb must then span the concatenated key length
        if kv_cache is not None:
            k = jnp.concatenate([kv_cache[0].astype(k.dtype), k], axis=2)
            v = jnp.concatenate([kv_cache[1].astype(v.dtype), v], axis=2)
        p = proj(pos_emb.astype(self.dtype), "linear_pos")  # (1, h, T_k, d_k)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (self.head_num, d_k))
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (self.head_num, d_k))

        q_u = q + u.astype(self.dtype)[None, :, None, :]
        q_v = q + vb.astype(self.dtype)[None, :, None, :]

        if self.sp_mesh is not None and kv_cache is None:
            from ..parallel.ring_attention import sequence_parallel_attention

            if mask is None:
                kv_valid = None
            elif mask.shape[-2] == 1:
                kv_valid = mask.reshape(mask.shape[0], mask.shape[-1])
            else:
                raise ValueError(
                    "sequence-parallel attention supports padding masks only "
                    f"(got mask shape {mask.shape}); disable dynamic/static "
                    "chunking when sp_mesh is set"
                )
            q_aug = jnp.concatenate([q_u, q_v], axis=-1)
            k_aug = jnp.concatenate(
                [k, jnp.broadcast_to(p.astype(k.dtype), k.shape)], axis=-1
            )
            out = sequence_parallel_attention(
                q_aug, k_aug, v, self.sp_mesh, kv_valid=kv_valid,
                seq_axis=self.sp_axis, batch_axis=self.sp_batch_axis,
                variant=self.sp_variant, scale=float(d_k) ** -0.5,
            )
            b, h, t, _ = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, t, d_model)
            return nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)

        # one augmented-head contraction instead of two: [q+u; q+v]·[k; p]
        # = (q+u)·k + (q+v)·p, and K=2*d_k=128 fills the MXU lane dim exactly
        q_aug = jnp.concatenate([q_u, q_v], axis=-1)
        k_aug = jnp.concatenate(
            [k, jnp.broadcast_to(p.astype(k.dtype), k.shape)], axis=-1
        )
        scores = jnp.einsum("bhqd,bhkd->bhqk", q_aug, k_aug) / jnp.sqrt(
            jnp.asarray(d_k, jnp.float32)
        ).astype(self.dtype)

        if mask is not None and mask.ndim == 3:
            mask = mask[:, None, :, :]
        # reuse output projection + softmax plumbing from the base module
        if mask is not None:
            scores = apply_mask(scores, mask)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = FastDropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b, h, t, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d_k)
        out = nn.Dense(d_model, dtype=self.dtype, name="linear_out")(out)
        if kv_cache is not None:
            return out, (k, v)
        return out


def sinusoid_table(max_len, d_model, dtype=np.float32):
    """Standard sinusoidal position table ``(max_len, d_model)``."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, d_model, 2) * -(np.log(10000.0) / d_model))
    table = np.zeros((max_len, d_model))
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term)
    return table.astype(dtype)


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal encoding: scale input and add PE (reference embedding.py:16)."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, offset=0, deterministic=True):
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        pos = jax.lax.dynamic_slice_in_dim(pe, offset, x.shape[1], axis=0)
        x = x + pos.astype(x.dtype)[None]
        return FastDropout(self.dropout_rate)(x, deterministic=deterministic), pos[None]


class RelPositionalEncoding(nn.Module):
    """Relative positional encoding: scale input, return PE separately
    (reference embedding.py:65)."""

    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, offset=0, deterministic=True):
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        x = x * jnp.sqrt(jnp.asarray(self.d_model, x.dtype))
        pos = jax.lax.dynamic_slice_in_dim(pe, offset, x.shape[1], axis=0)[None]
        x = FastDropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, pos.astype(x.dtype)


class NoPositionalEncoding(nn.Module):
    """Identity encoding (reference embedding.py:144)."""

    d_model: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, offset=0, deterministic=True):
        x = FastDropout(self.dropout_rate)(x, deterministic=deterministic)
        return x, jnp.zeros((1, x.shape[1], self.d_model), x.dtype)


class ConvolutionModule(nn.Module):
    """Conformer convolution module (reference layers/convolution.py:15).

    pointwise(2C) → GLU → depthwise(k) → norm → swish → pointwise(C); inputs
    are length-masked before each conv so padding never leaks across frames
    (the reference's masked Conv1d, conv1d.py:94-115).
    """

    kernel_size: int = 15
    norm_type: str = "batch_norm"  # or "layer_norm"
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_pad=None, deterministic=True, cache=None):
        # x: (B, T, C); mask_pad: (B, T) True = valid
        # cache (streaming, causal only): (B, kernel-1, C) left context of the
        # depthwise-conv input from the previous chunk
        channels = x.shape[-1]
        if mask_pad is not None:
            x = jnp.where(mask_pad[..., None], x, 0.0)

        x = nn.Dense(2 * channels, dtype=self.dtype, name="pointwise_conv1")(x)
        x = GLU(axis=-1)(x)

        new_cache = None
        if cache is not None:
            assert self.causal, "conv cache requires a causal conv module"
            x = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
            new_cache = x[:, -(self.kernel_size - 1):]
            pad = (0, 0)
        elif self.causal:
            pad = (self.kernel_size - 1, 0)
        else:
            pad = ((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)
        x = nn.Conv(
            features=channels,
            kernel_size=(self.kernel_size,),
            feature_group_count=channels,
            padding=[pad],
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)

        if self.norm_type == "batch_norm":
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             dtype=self.dtype, name="norm")(x)
        else:
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = x * jax.nn.sigmoid(x)
        x = nn.Dense(channels, dtype=self.dtype, name="pointwise_conv2")(x)
        if mask_pad is not None:
            x = jnp.where(mask_pad[..., None], x, 0.0)
        if new_cache is not None:
            return x, new_cache
        return x


class Conv2dSubsampling4(nn.Module):
    """Two stride-2 3x3 Conv2d blocks: 4× time subsampling + linear projection
    (reference layers/subsampling.py:22). Input (B, T, F) → (B, T//4, d_model),
    plus the positional encoding of the subsampled sequence.
    """

    d_model: int
    dropout_rate: float = 0.1
    pos_enc: str = "rel_pos"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset=0, deterministic=True):
        b, t, f = x.shape
        x = x[..., None]  # (B, T, F, 1) NHWC
        x = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.Conv(self.d_model, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        b, t2, f2, c = x.shape
        x = x.reshape(b, t2, f2 * c)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="out")(x)
        if self.pos_enc == "rel_pos":
            enc = RelPositionalEncoding(self.d_model, self.dropout_rate)
        elif self.pos_enc == "abs_pos":
            enc = PositionalEncoding(self.d_model, self.dropout_rate)
        else:
            enc = NoPositionalEncoding(self.d_model, self.dropout_rate)
        return enc(x, offset=offset, deterministic=deterministic)

    @staticmethod
    def output_len(t):
        """Subsampled length for input length t (two valid stride-2 3x3 convs)."""
        return ((t - 1) // 2 - 1) // 2
