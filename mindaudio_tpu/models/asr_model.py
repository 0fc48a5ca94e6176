"""Hybrid CTC/attention ASR model (the flagship Conformer recipe).

TPU-native counterpart of reference ``examples/conformer/asr_model.py``
(``ASRModel`` :213, ``ASRModelWithAcc`` :16, ``create_asr_model`` :301): a
Conformer encoder, a Transformer decoder with label-smoothing loss, and a CTC
head, combined as ``loss = w * loss_ctc + (1 - w) * loss_att``.

Differences from the reference are idiomatic-JAX, not functional:
- one Flax module; the loss is computed inside ``__call__`` so the whole
  forward+loss graph jits (and shards via GSPMD) as a single XLA program;
- decoder input/target framing (sos/eos) happens on host in the collate
  (``utils.common.add_sos_eos``) exactly as the reference does;
- bf16 compute / f32 params replace fp16 + dynamic loss scaling.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..loss.ctc_loss import ctc_loss
from ..loss.label_smoothing_loss import label_smoothing_loss
from .conformer import ConformerEncoder, TransformerDecoder

__all__ = ["ASRModel"]

IGNORE_ID = -1


class ASRModel(nn.Module):
    """Conformer encoder + Transformer decoder + CTC head.

    ``__call__`` takes a batch dict (see :meth:`loss_keys`) and returns
    ``(loss, metrics)``. ``encode``/``ctc_log_probs``/``decode_step`` expose
    the pieces the decode drivers (utils/recognize.py counterpart) need.
    """

    vocab_size: int
    input_dim: int = 80
    d_model: int = 256
    head_num: int = 4
    ffn_dim: int = 2048
    num_encoder_layers: int = 12
    num_decoder_layers: int = 6
    dropout_rate: float = 0.1
    # attention-WEIGHT dropout; the reference trains with 0
    # (reference examples/conformer/conformer.yaml:11,27-28)
    attention_dropout_rate: float = 0.0
    kernel_size: int = 15
    ctc_weight: float = 0.3
    # CTC DP implementation: "auto" (the measured-fastest scan), "scan", or
    # "pallas" (explicit opt-in kernel) — see loss/ctc_loss.py
    ctc_impl: str = "auto"
    lsm_weight: float = 0.1
    use_dynamic_chunk: bool = False
    static_chunk_size: int = 0
    causal_conv: bool = False
    cmvn_mean: Optional[jnp.ndarray] = None
    cmvn_istd: Optional[jnp.ndarray] = None
    remat: bool = False
    # sequence-parallel encoder attention (see ConformerEncoder.sp_mesh)
    sp_mesh: Optional[object] = None
    sp_axis: str = "seq"
    sp_variant: str = "ring"
    sp_batch_axis: Optional[str] = "data"
    # W8A8 int8-MXU forward for the encoder FFNs and the CTC vocab
    # projection — the two training-dominant matmul groups (PERF.md FLOP
    # balance). Backward stays bf16 (ops/quant.py int8_training_matmul).
    int8_ffn: bool = False
    # Mixture-of-Experts encoder blocks (parallel/moe.py). The router's
    # load-balance loss is sowed under intermediates/moe_aux_loss; trainers
    # apply(..., mutable=["intermediates"]) and add moe_aux_weight * aux.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_mesh: Optional[object] = None
    moe_expert_axis: str = "model"
    # GPipe pipeline over the encoder blocks (see ConformerEncoder)
    pipeline_mesh: Optional[object] = None
    pipeline_microbatches: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConformerEncoder(
            input_dim=self.input_dim,
            d_model=self.d_model,
            head_num=self.head_num,
            ffn_dim=self.ffn_dim,
            num_layers=self.num_encoder_layers,
            dropout_rate=self.dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            kernel_size=self.kernel_size,
            use_dynamic_chunk=self.use_dynamic_chunk,
            static_chunk_size=self.static_chunk_size,
            causal_conv=self.causal_conv,
            cmvn_mean=self.cmvn_mean,
            cmvn_istd=self.cmvn_istd,
            remat=self.remat,
            sp_mesh=self.sp_mesh,
            sp_axis=self.sp_axis,
            sp_variant=self.sp_variant,
            sp_batch_axis=self.sp_batch_axis,
            int8_ffn=self.int8_ffn,
            moe_experts=self.moe_experts,
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_mesh=self.moe_mesh,
            moe_expert_axis=self.moe_expert_axis,
            pipeline_mesh=self.pipeline_mesh,
            pipeline_microbatches=self.pipeline_microbatches,
            dtype=self.dtype,
        )
        self.decoder = TransformerDecoder(
            vocab_size=self.vocab_size,
            d_model=self.d_model,
            head_num=self.head_num,
            ffn_dim=self.ffn_dim,
            num_layers=self.num_decoder_layers,
            dropout_rate=self.dropout_rate,
            attention_dropout_rate=self.attention_dropout_rate,
            dtype=self.dtype,
        )
        # CTC projection (reference loss/ctc_loss.py:10 fuses Dense + CTCLossV2)
        from .layers import Int8Dense

        proj_cls = Int8Dense if self.int8_ffn else nn.Dense
        self.ctc_proj = proj_cls(self.vocab_size, dtype=self.dtype,
                                 name="ctc_proj")

    def __call__(self, batch, deterministic: bool = True, chunk_rng=None):
        """Hybrid training loss.

        ``batch`` keys: ``feats (B,T,F) f32``, ``feat_lens (B,)``,
        ``ys_in (B,L+1)`` decoder input with sos, ``ys_out (B,L+1)`` decoder
        target with eos / IGNORE_ID pads, ``ys_lens (B,)`` = label len + 1,
        ``labels (B,L)`` CTC targets (no sos/eos), ``label_lens (B,)``.
        """
        # without a chunk rng (eval/init) dynamic-chunk models fall back to
        # full context instead of asserting (WeNet decoding_chunk_size=-1)
        enc_out, enc_mask = self.encoder(
            batch["feats"], batch["feat_lens"],
            decoding_chunk_size=0 if chunk_rng is not None else -1,
            deterministic=deterministic, chunk_rng=chunk_rng,
        )
        enc_lens = enc_mask[:, 0, :].sum(-1).astype(jnp.int32)

        loss_att = jnp.asarray(0.0, jnp.float32)
        acc_att = jnp.asarray(0.0, jnp.float32)
        if self.ctc_weight < 1.0:
            dec_logits = self.decoder(
                enc_out, enc_mask, batch["ys_in"], batch["ys_lens"],
                deterministic=deterministic,
            )
            loss_att = label_smoothing_loss(
                dec_logits, batch["ys_out"], smoothing=self.lsm_weight
            )
            pred = dec_logits.argmax(-1)
            valid = batch["ys_out"] != IGNORE_ID
            acc_att = (jnp.where(valid, pred == batch["ys_out"], False).sum()
                       / jnp.maximum(valid.sum(), 1))

        loss_ctc = jnp.asarray(0.0, jnp.float32)
        if self.ctc_weight > 0.0:
            ctc_logits = self.ctc_proj(enc_out)
            loss_ctc = ctc_loss(
                ctc_logits, enc_lens, batch["labels"], batch["label_lens"],
                impl=self.ctc_impl,
            )

        loss = self.ctc_weight * loss_ctc + (1.0 - self.ctc_weight) * loss_att
        return loss, {
            "loss_att": loss_att,
            "loss_ctc": loss_ctc,
            "acc_att": acc_att,
        }

    # ---- inference pieces (used by utils/recognize decode drivers) ----

    def encode(self, feats, feat_lens, decoding_chunk_size=-1,
               num_decoding_left_chunks=-1):
        return self.encoder(
            feats, feat_lens,
            decoding_chunk_size=decoding_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks,
            deterministic=True,
        )

    def encode_chunk(self, xs, att_caches=None, cnn_caches=None,
                     required_cache_size=-1):
        """Streaming: one encoder chunk + its CTC log-probs
        (drives ``ConformerEncoder.forward_chunk``; needs causal_conv=True)."""
        ys, att_caches, cnn_caches = self.encoder.forward_chunk(
            xs, att_caches, cnn_caches, required_cache_size=required_cache_size
        )
        log_probs = jax.nn.log_softmax(
            self.ctc_proj(ys).astype(jnp.float32), axis=-1
        )
        return log_probs, att_caches, cnn_caches

    def ctc_log_probs(self, enc_out):
        """(B, T', vocab) log-softmax CTC posterior (reference
        ctc_loss.py ``compute_log_softmax_out``)."""
        return jax.nn.log_softmax(
            self.ctc_proj(enc_out).astype(jnp.float32), axis=-1
        )

    def decode_step(self, enc_out, enc_mask, ys):
        """Log-probs of the next token for each hyp prefix (full-prefix
        recompute; beam drivers batch hyps into the batch axis)."""
        return self.decoder.forward_one_step(enc_out, enc_mask, ys)

    def decoder_logits(self, enc_out, enc_mask, ys_in, ys_lens):
        """Full decoder pass (attention-rescoring scores one pass per hyp set)."""
        return self.decoder(enc_out, enc_mask, ys_in, ys_lens, deterministic=True)
