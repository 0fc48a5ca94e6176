"""Conformer encoder + Transformer decoder (WeNet-style hybrid ASR).

TPU-native re-design of reference ``mindaudio/models/conformer.py``:
``ConformerEncoderLayer`` (conformer.py:25), ``BaseEncoder``/``ConformerEncoder``
(conformer.py:164/261), ``DecoderLayer``/``TransformerDecoder``
(conformer.py:382/508). Differences from the reference are architectural, not
functional: batch-time-feature layout, boolean masks, Flax modules with bf16
compute / f32 params, chunk masks built by ``utils.mask`` for streaming.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.mask import add_optional_chunk_mask, make_non_pad_mask, subsequent_mask
from .layers import (
    FastDropout,
    Conv2dSubsampling4,
    ConvolutionModule,
    GlobalCMVN,
    MultiHeadedAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    RelPositionMultiHeadedAttention,
    Swish,
    apply_mask,
    sinusoid_table,
)

__all__ = ["ConformerEncoder", "ConformerEncoderLayer", "TransformerDecoder"]


class ConformerEncoderLayer(nn.Module):
    """Macaron FFN → MHSA(rel-pos) → conv module → FFN, pre-norm
    (reference conformer.py:25, construct at :86-161)."""

    d_model: int
    head_num: int
    ffn_dim: int
    dropout_rate: float = 0.1
    # separate rate for attention-WEIGHT dropout. The reference trains with
    # attention_dropout_rate: 0 (reference examples/conformer/conformer.yaml:11)
    # — and the (B, H, T, T) score masks are also the single most expensive
    # dropout surface (~2 ms/step of hardware-RNG bits at B=32).
    attention_dropout_rate: float = 0.0
    kernel_size: int = 15
    norm_type: str = "layer_norm"
    causal_conv: bool = False
    use_macaron: bool = True
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh: sequence-parallel attention
    sp_axis: str = "seq"
    sp_variant: str = "ring"
    sp_batch_axis: Optional[str] = "data"
    # Mixture-of-Experts: replace the final FFN with an expert-parallel
    # MoE layer (parallel/moe.py) when moe_experts > 0. The macaron FFN
    # stays dense (the MoE-Conformer convention).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_mesh: Optional[object] = None
    moe_expert_axis: str = "model"
    # W8A8 int8-MXU forward for both FFNs (bf16 backward; ops/quant.py
    # int8_training_matmul) — the FFNs carry ~10x the attention FLOPs here
    int8_ffn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pos_emb, mask_pad=None, deterministic=True,
                 att_cache=None, cnn_cache=None):
        # Macaron feed-forward (half-step residual)
        streaming = att_cache is not None
        if self.use_macaron:
            res = x
            y = nn.LayerNorm(dtype=self.dtype, name="norm_ff_macaron")(x)
            y = PositionwiseFeedForward(
                self.ffn_dim, self.dropout_rate, activation=lambda v: v * jax.nn.sigmoid(v),
                int8=self.int8_ffn, dtype=self.dtype, name="feed_forward_macaron",
            )(y, deterministic=deterministic)
            x = res + 0.5 * FastDropout(self.dropout_rate)(y, deterministic=deterministic)

        # Self-attention with relative position (+ optional streaming KV cache)
        res = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm_mha")(x)
        y = RelPositionMultiHeadedAttention(
            self.head_num, self.attention_dropout_rate, dtype=self.dtype,
            sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            sp_variant=self.sp_variant, sp_batch_axis=self.sp_batch_axis,
            name="self_attn",
        )(y, y, y, mask=mask, pos_emb=pos_emb, deterministic=deterministic,
          kv_cache=att_cache)
        if streaming:
            y, new_att_cache = y
        x = res + FastDropout(self.dropout_rate)(y, deterministic=deterministic)

        # Convolution module (+ optional streaming left-context cache)
        res = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        y = ConvolutionModule(
            kernel_size=self.kernel_size, norm_type=self.norm_type,
            causal=self.causal_conv, dtype=self.dtype, name="conv_module",
        )(y, mask_pad=mask_pad, deterministic=deterministic, cache=cnn_cache)
        if cnn_cache is not None:
            y, new_cnn_cache = y
        x = res + FastDropout(self.dropout_rate)(y, deterministic=deterministic)

        # Final feed-forward
        res = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm_ff")(x)
        if self.moe_experts > 0:
            from mindaudio_tpu.parallel.moe import MoEFeedForward

            y = MoEFeedForward(
                self.moe_experts, self.ffn_dim, self.dropout_rate,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                activation=lambda v: v * jax.nn.sigmoid(v),
                dtype=self.dtype, mesh=self.moe_mesh,
                expert_axis=self.moe_expert_axis, name="feed_forward",
            )(y, deterministic=deterministic, mask_pad=mask_pad)
        else:
            y = PositionwiseFeedForward(
                self.ffn_dim, self.dropout_rate, activation=lambda v: v * jax.nn.sigmoid(v),
                int8=self.int8_ffn, dtype=self.dtype, name="feed_forward",
            )(y, deterministic=deterministic)
        scale = 0.5 if self.use_macaron else 1.0
        x = res + scale * FastDropout(self.dropout_rate)(y, deterministic=deterministic)

        out = nn.LayerNorm(dtype=self.dtype, name="norm_final")(x)
        if streaming:
            return out, new_att_cache, (new_cnn_cache if cnn_cache is not None else None)
        return out


class ConformerEncoder(nn.Module):
    """CMVN → Conv2d 4× subsampling → N Conformer blocks
    (reference conformer.py:261; defaults follow examples/conformer/conformer.yaml).

    ``__call__`` returns ``(encoder_out, encoder_mask)`` with
    ``encoder_mask: (B, 1, T')`` True at valid subsampled frames.
    """

    input_dim: int = 80
    d_model: int = 256
    head_num: int = 4
    ffn_dim: int = 2048
    num_layers: int = 12
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0  # reference conformer.yaml:11
    kernel_size: int = 15
    norm_type: str = "layer_norm"
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    static_chunk_size: int = 0
    causal_conv: bool = False  # required True for streaming forward_chunk
    cmvn_mean: Optional[jnp.ndarray] = None
    cmvn_istd: Optional[jnp.ndarray] = None
    remat: bool = False  # rematerialize each block's activations in backward
    # Sequence parallelism over the (subsampled) time axis — the long-audio
    # capability the reference lacks (SURVEY §5.7). Set sp_mesh to a Mesh with
    # an ``sp_axis`` dim: self-attention runs as a ring (or Ulysses) kernel
    # over ICI, the conv module's time-dim halo exchange is inserted by GSPMD
    # from the with_sharding_constraint below, and the subsampled length must
    # be divisible by the axis size (pad the bucket). Requires full-context
    # attention (no dynamic/static chunking).
    sp_mesh: Optional[object] = None
    sp_axis: str = "seq"
    sp_variant: str = "ring"
    sp_batch_axis: Optional[str] = "data"
    # Mixture-of-Experts blocks (expert-parallel over moe_expert_axis;
    # parallel/moe.py) — moe_experts > 0 swaps every block's final FFN.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_mesh: Optional[object] = None
    moe_expert_axis: str = "model"
    # int8-MXU FFN forwards in every block (see ConformerEncoderLayer)
    int8_ffn: bool = False
    # GPipe pipeline parallelism over the blocks (parallel/pipeline.py):
    # set pipeline_mesh to a Mesh with a 'pipe' axis that divides
    # num_layers. The layer params keep their layer_i checkpoint layout
    # (stacked in-graph each step — a transient copy, so this pipelines
    # COMPUTE; persistent param-memory sharding is the direct
    # pipeline_apply usage). Dropout keys are folded per layer; each
    # layer's mask is shared across microbatches.
    pipeline_mesh: Optional[object] = None
    pipeline_microbatches: int = 4
    pipeline_axis: str = "pipe"
    pipeline_batch_axis: Optional[str] = "data"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.cmvn_mean is not None:
            self.global_cmvn = GlobalCMVN(self.cmvn_mean, self.cmvn_istd,
                                          name="global_cmvn")
        self.embed = Conv2dSubsampling4(
            self.d_model, self.dropout_rate, pos_enc="rel_pos",
            dtype=self.dtype, name="embed",
        )
        layer_cls = (
            nn.remat(ConformerEncoderLayer, static_argnums=(5,))
            if self.remat else ConformerEncoderLayer
        )
        self.layers = [
            layer_cls(
                self.d_model, self.head_num, self.ffn_dim, self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                kernel_size=self.kernel_size, norm_type=self.norm_type,
                causal_conv=self.causal_conv,
                sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
                sp_variant=self.sp_variant, sp_batch_axis=self.sp_batch_axis,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                moe_mesh=self.moe_mesh, moe_expert_axis=self.moe_expert_axis,
                int8_ffn=self.int8_ffn, dtype=self.dtype, name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        xs,
        xs_lens,
        decoding_chunk_size: int = 0,
        num_decoding_left_chunks: int = -1,
        deterministic: bool = True,
        chunk_rng=None,
    ):
        if self.cmvn_mean is not None:
            xs = self.global_cmvn(xs)

        xs, pos_emb = self.embed(xs.astype(self.dtype), deterministic=deterministic)

        if self.sp_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if self.use_dynamic_chunk or self.static_chunk_size > 0:
                raise ValueError(
                    "sequence parallelism requires full-context attention; "
                    "disable dynamic/static chunking"
                )
            if xs.shape[1] % self.sp_mesh.shape[self.sp_axis] != 0:
                raise ValueError(
                    f"subsampled length {xs.shape[1]} not divisible by "
                    f"'{self.sp_axis}' axis size "
                    f"{self.sp_mesh.shape[self.sp_axis]}; pad the bucket"
                )
            bax = (self.sp_batch_axis
                   if self.sp_batch_axis
                   and self.sp_mesh.shape.get(self.sp_batch_axis, 1) > 1
                   else None)
            xs = jax.lax.with_sharding_constraint(
                xs, NamedSharding(self.sp_mesh, PartitionSpec(bax, self.sp_axis, None))
            )

        t_sub = xs.shape[1]
        sub_lens = ((xs_lens - 1) // 2 - 1) // 2
        masks = make_non_pad_mask(sub_lens, t_sub)[:, None, :]  # (B, 1, T')
        chunk_masks = add_optional_chunk_mask(
            masks, self.use_dynamic_chunk, self.use_dynamic_left_chunk,
            decoding_chunk_size, self.static_chunk_size, num_decoding_left_chunks,
            rng_key=chunk_rng,
        )  # (B, T', T') or (B, 1, T')
        mask_pad = masks[:, 0, :]

        if self.pipeline_mesh is not None and not self.is_initializing():
            xs = self._pipeline_blocks(xs, chunk_masks, pos_emb, mask_pad,
                                       deterministic)
        else:
            for layer in self.layers:
                xs = layer(xs, chunk_masks, pos_emb, mask_pad, deterministic)
        return xs, masks

    def _pipeline_blocks(self, xs, chunk_masks, pos_emb, mask_pad,
                         deterministic):
        """Run the block stack as a GPipe pipeline over the ``pipe`` axis.

        Params are created layer-by-layer as usual (the sequential path
        runs at init), then stacked in-graph and streamed through
        ``parallel.pipeline.pipeline_apply``; masks ride along as
        per-microbatch batched extras. Numerically equal to the sequential
        loop when deterministic (tested); under dropout each layer folds
        its index into the step key, with the same mask shared across
        microbatches (documented deviation — iid per layer, not per row).
        """
        from ..parallel.pipeline import pipeline_apply, stack_layer_params

        stacked = {
            "p": stack_layer_params(
                [l.variables["params"] for l in self.layers]),
            "i": jnp.arange(self.num_layers),
        }
        layer_cfg = dict(
            d_model=self.d_model, head_num=self.head_num,
            ffn_dim=self.ffn_dim, dropout_rate=self.dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            kernel_size=self.kernel_size, norm_type=self.norm_type,
            causal_conv=self.causal_conv, int8_ffn=self.int8_ffn,
            dtype=self.dtype,
        )
        # parent=None detaches the template from this module tree (we only
        # use its .apply with explicitly-passed stacked params)
        layer_mod = ConformerEncoderLayer(**layer_cfg, parent=None)

        extras = (pos_emb,)
        if not deterministic:
            extras += (jax.random.key_data(self.make_rng("dropout")),)

        def layer_fn(pk, h, pos_emb, *rest):
            if deterministic:
                (mask, mpad), rngs = rest, None
            else:
                key_data, mask, mpad = rest
                key = jax.random.wrap_key_data(
                    key_data, impl="rbg" if key_data.shape == (4,)
                    else "threefry2x32")
                rngs = {"dropout": jax.random.fold_in(key, pk["i"])}
            return layer_mod.apply(
                {"params": pk["p"]}, h, mask, pos_emb, mpad,
                deterministic, rngs=rngs)

        return pipeline_apply(
            layer_fn, stacked, xs, self.pipeline_mesh,
            num_microbatches=self.pipeline_microbatches,
            extras=extras, batched_extras=(chunk_masks, mask_pad),
            axis_name=self.pipeline_axis,
            batch_axis=self.pipeline_batch_axis,
        )

    def forward_chunk(self, xs, att_caches=None, cnn_caches=None,
                      required_cache_size=-1):
        """Streaming: encode ONE raw-feature chunk with per-layer caches.

        New capability beyond the reference (its layers carry cache args but
        no recipe drives them; SURVEY §2.2 "chunk-mask ready").

        Args:
            xs: ``(B, raw_T, F)`` feature chunk. For subsampled chunk size C
                feed ``raw_T = 4*C + 3`` frames stepping 4*C (the stride-4
                conv front-end's receptive field needs 3 look-back frames).
            att_caches: per-layer ``(k, v)`` tuples from the previous call
                (keys/values over all previous chunks), or None at stream
                start.
            cnn_caches: per-layer ``(B, kernel-1, d_model)`` conv left
                context, or None at stream start. Requires
                ``causal_conv=True``.
            required_cache_size: cap on the attention left-context length
                (subsampled frames). ``-1`` keeps the full history — exact,
                but the cache (and a jitted loop's compile count) grows with
                every chunk. A positive cap bounds memory/compute to
                O(cap + chunk) per call and the set of jit shapes to
                ``cap // chunk + 1``, matching WeNet's
                ``required_cache_size`` streaming semantic.

        Returns:
            ``(ys (B, C, d_model), att_caches, cnn_caches)``.
        """
        assert self.causal_conv, "streaming needs causal_conv=True"
        if self.cmvn_mean is not None:
            xs = self.global_cmvn(xs)
        xs, _ = self.embed(xs.astype(self.dtype), deterministic=True)

        b = xs.shape[0]
        d_k = self.d_model // self.head_num
        if att_caches is None:
            att_caches = [
                (jnp.zeros((b, self.head_num, 0, d_k), self.dtype),) * 2
                for _ in range(self.num_layers)
            ]
        if cnn_caches is None:
            cnn_caches = [
                jnp.zeros((b, self.kernel_size - 1, self.d_model), self.dtype)
                for _ in range(self.num_layers)
            ]

        t_total = att_caches[0][0].shape[2] + xs.shape[1]
        pos_emb = jnp.asarray(
            sinusoid_table(max(t_total, 1), self.d_model)
        )[None].astype(self.dtype)

        new_att, new_cnn = [], []
        for layer, a_c, c_c in zip(self.layers, att_caches, cnn_caches):
            xs, a_new, c_new = layer(
                xs, None, pos_emb, None, True,
                att_cache=a_c, cnn_cache=c_c,
            )
            if required_cache_size >= 0:
                a_new = (a_new[0][:, :, -required_cache_size:, :] if required_cache_size
                         else a_new[0][:, :, :0, :],
                         a_new[1][:, :, -required_cache_size:, :] if required_cache_size
                         else a_new[1][:, :, :0, :])
            new_att.append(a_new)
            new_cnn.append(c_new)
        return xs, new_att, new_cnn


class DecoderLayer(nn.Module):
    """Pre-norm self-attn → cross-attn → FFN decoder block (reference conformer.py:382)."""

    d_model: int
    head_num: int
    ffn_dim: int
    dropout_rate: float = 0.1
    # reference conformer.yaml:27-28 trains with self/src attention-weight
    # dropout 0
    attention_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask, deterministic=True):
        res = tgt
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        y = MultiHeadedAttention(self.head_num, self.attention_dropout_rate,
                                 dtype=self.dtype, name="self_attn")(
            y, y, y, mask=tgt_mask, deterministic=deterministic
        )
        x = res + FastDropout(self.dropout_rate)(y, deterministic=deterministic)

        res = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = MultiHeadedAttention(self.head_num, self.attention_dropout_rate,
                                 dtype=self.dtype, name="src_attn")(
            y, memory, memory, mask=memory_mask, deterministic=deterministic
        )
        x = res + FastDropout(self.dropout_rate)(y, deterministic=deterministic)

        res = x
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        y = PositionwiseFeedForward(self.ffn_dim, self.dropout_rate, dtype=self.dtype, name="feed_forward")(
            y, deterministic=deterministic
        )
        return res + FastDropout(self.dropout_rate)(y, deterministic=deterministic)


class TransformerDecoder(nn.Module):
    """Embedding + abs-pos encoding + N cross-attention blocks + output head
    (reference conformer.py:508).

    ``__call__(memory, memory_mask, ys_in, ys_in_lens)`` returns logits
    ``(B, L, vocab)``.
    """

    vocab_size: int
    d_model: int = 256
    head_num: int = 4
    ffn_dim: int = 2048
    num_layers: int = 6
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, memory, memory_mask, ys_in, ys_in_lens, deterministic=True):
        L = ys_in.shape[1]
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype, name="embed")(ys_in)
        x, _ = PositionalEncoding(self.d_model, self.dropout_rate, name="pos_enc")(
            x, deterministic=deterministic
        )

        tgt_mask = make_non_pad_mask(ys_in_lens, L)[:, None, :] & subsequent_mask(L)[None]
        for i in range(self.num_layers):
            x = DecoderLayer(
                self.d_model, self.head_num, self.ffn_dim, self.dropout_rate,
                attention_dropout_rate=self.attention_dropout_rate,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, tgt_mask, memory, memory_mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="output_layer")(x)

    def forward_one_step(self, memory, memory_mask, ys, deterministic=True):
        """Full-prefix decode step (used by beam search): returns logits of the
        last position, log-softmaxed."""
        lens = jnp.full((ys.shape[0],), ys.shape[1], jnp.int32)
        logits = self(memory, memory_mask, ys, lens, deterministic=deterministic)
        return jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
