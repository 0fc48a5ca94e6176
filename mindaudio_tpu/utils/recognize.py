"""ASR decode drivers: CTC greedy / CTC prefix beam / attention beam / rescoring.

TPU-native counterpart of reference ``mindaudio/utils/recognize.py``
(``recognize`` :78, ``ctc_greedy_search`` :254, ``ctc_prefix_beam_search``
:273, ``attention_rescoring`` :339) and the whole-graph decode nets of
``examples/conformer/decoder_factory.py``. Division of labor on TPU:

- greedy / per-frame topk / the attention beam loop run **on device** as one
  jitted program each (the beam loop is a ``lax.fori_loop`` over static
  shapes, replacing the reference's scatter-update while-graph,
  decoder_factory.py:141-192);
- the CTC prefix-beam dynamic program stays **on host** (inherently
  sequential over hash-keyed prefixes, reference recognize.py:297-337),
  consuming the device-computed per-frame topk.
"""

from __future__ import annotations

from collections import defaultdict
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import add_sos_eos, log_add, pad_sequence, remove_duplicates_and_blank

__all__ = [
    "ASRInference",
    "ctc_prefix_beam_dp",
]

NEG_INF = -1.0e9


def ctc_prefix_beam_dp(
    top_k_logp: np.ndarray,
    top_k_index: np.ndarray,
    n_valid: int,
    beam_size: int,
    blank_id: int = 0,
) -> List[Tuple[Tuple[int, ...], float]]:
    """Host CTC prefix beam search over per-frame top-k posteriors.

    Args:
        top_k_logp/top_k_index: ``(T, K)`` per-frame top-k log-probs and ids.
        n_valid: number of valid frames.
        beam_size: prefixes kept per step.

    Returns:
        list of ``(prefix_tuple, log_prob)`` sorted best-first
        (reference recognize.py:297-337 semantics).
    """
    cur_hyps: List[Tuple[Tuple[int, ...], Tuple[float, float]]] = [
        (tuple(), (0.0, -float("inf")))
    ]
    for t in range(int(n_valid)):
        next_hyps = defaultdict(lambda: (-float("inf"), -float("inf")))
        for ps, s in zip(top_k_logp[t].tolist(), top_k_index[t].tolist()):
            s = int(s)
            for prefix, (pb, pnb) in cur_hyps:
                last = prefix[-1] if prefix else None
                if s == blank_id:
                    n_pb, n_pnb = next_hyps[prefix]
                    next_hyps[prefix] = (log_add([n_pb, pb + ps, pnb + ps]), n_pnb)
                elif s == last:
                    # *ss -> *s (repeat merged into the non-blank path)
                    n_pb, n_pnb = next_hyps[prefix]
                    next_hyps[prefix] = (n_pb, log_add([n_pnb, pnb + ps]))
                    # *s-s -> *ss (blank separated the repeat)
                    n_prefix = prefix + (s,)
                    n_pb, n_pnb = next_hyps[n_prefix]
                    next_hyps[n_prefix] = (n_pb, log_add([n_pnb, pb + ps]))
                else:
                    n_prefix = prefix + (s,)
                    n_pb, n_pnb = next_hyps[n_prefix]
                    next_hyps[n_prefix] = (n_pb, log_add([n_pnb, pb + ps, pnb + ps]))
        cur_hyps = sorted(
            next_hyps.items(), key=lambda x: log_add(list(x[1])), reverse=True
        )[:beam_size]
    return [(p, log_add(list(v))) for p, v in cur_hyps]


class ASRInference:
    """Jitted decode front-ends over a trained hybrid ASR model.

    One instance holds compiled programs keyed by input shape (feed
    length-bucketed features to bound the compile-cache like the reference
    bounds graph shapes, SURVEY §5.7).
    """

    def __init__(self, model, variables, beam_size=10, ctc_weight=0.3,
                 max_tgt_len=50, blank_id=0, sos=None, eos=None,
                 weight_quant="none", weight_quant_min_size=65536):
        self.model = model
        self.variables = variables
        self.beam_size = beam_size
        self.ctc_weight = ctc_weight
        self.max_tgt_len = max_tgt_len
        self.blank_id = blank_id
        self.sos = model.vocab_size - 1 if sos is None else sos
        self.eos = model.vocab_size - 1 if eos is None else eos

        # weight_quant="int8": serve with weight-only int8 — every large
        # Dense kernel is pre-quantized per-channel and its matmul routed
        # through the Pallas dequant-in-VMEM kernel (ops/quant.py). Halves
        # weight HBM traffic, which bounds small-batch/streaming decode; the
        # f32 copies are stripped from the live params to free HBM.
        self._apply = model.apply
        if weight_quant == "int8":
            from ..ops.quant import (
                intercept_dense_int8,
                quantize_dense_params,
                strip_quantized,
            )

            tables = quantize_dense_params(
                variables["params"], min_weights=weight_quant_min_size)
            self.variables = dict(
                variables,
                params=strip_quantized(variables["params"], tables),
            )

            def apply_q(*args, **kwargs):
                with intercept_dense_int8(tables):
                    return model.apply(*args, **kwargs)

            self._apply = apply_q
        elif weight_quant != "none":
            raise ValueError(f"unknown weight_quant {weight_quant!r}")

        self._encode_jit = jax.jit(self._encode)
        self._encode_greedy = jax.jit(self._encode_greedy_impl)
        self._encode_topk = jax.jit(self._encode_topk_impl)
        self._beam_device = jax.jit(self._beam_device_impl)
        # batched beam search: vmap the single-utterance fori_loop over the
        # batch (each row re-adds its leading length-1 "batch" dim)
        self._beam_device_vmapped = jax.jit(jax.vmap(
            lambda eo, em: self._beam_device_impl(eo[None], em[None])))
        self._rescore_device = jax.jit(self._rescore_device_impl)
        # streaming chunk step: one compiled program per (chunk, cache)
        # shape — eager apply dispatches every op separately (measured RTF 5
        # over the remote tunnel vs 0.1 jitted)
        self._encode_chunk = jax.jit(
            lambda xs, att, cnn, rcs: self._apply(
                self.variables, xs, att, cnn, rcs,
                method=self.model.encode_chunk,
            ),
            static_argnums=(3,),
        )

    # ---- device programs ----

    def _encode(self, feats, feat_lens):
        enc_out, enc_mask = self._apply(
            self.variables, feats, feat_lens, method=self.model.encode
        )
        log_probs = self._apply(
            self.variables, enc_out, method=self.model.ctc_log_probs
        )
        return enc_out, enc_mask, log_probs

    def _encode_greedy_impl(self, feats, feat_lens):
        enc_out, enc_mask, log_probs = self._encode(feats, feat_lens)
        best = log_probs.argmax(-1)
        best_p = log_probs.max(-1)
        valid = enc_mask[:, 0, :]
        return jnp.where(valid, best, self.blank_id), (best_p * valid).sum(-1), valid

    def _encode_topk_impl(self, feats, feat_lens):
        enc_out, enc_mask, log_probs = self._encode(feats, feat_lens)
        top_logp, top_idx = jax.lax.top_k(log_probs, self.beam_size)
        return enc_out, enc_mask, top_logp, top_idx

    def _beam_device_impl(self, enc_out, enc_mask):
        """Batch-1 attention beam search as a device fori_loop
        (replaces reference decoder_factory.py:141-192)."""
        beam, eos, sos = self.beam_size, self.eos, self.sos
        maxlen = self.max_tgt_len
        memory = jnp.repeat(enc_out, beam, axis=0)
        mem_mask = jnp.repeat(enc_mask, beam, axis=0)

        hyps = jnp.full((beam, maxlen + 1), eos, jnp.int32).at[:, 0].set(sos)
        scores = jnp.full((beam,), NEG_INF, jnp.float32).at[0].set(0.0)
        end_flag = jnp.zeros((beam,), bool)

        eos_only = jnp.full((self.model.vocab_size,), NEG_INF, jnp.float32
                            ).at[eos].set(0.0)

        def body(i, carry):
            hyps, scores, end_flag = carry
            lens = jnp.full((beam,), i + 1, jnp.int32)
            logits = self._apply(
                self.variables, memory, mem_mask, hyps, lens,
                method=self.model.decoder_logits,
            )
            logp = jax.nn.log_softmax(
                logits[:, :, :].astype(jnp.float32), axis=-1
            )
            step_logp = jnp.take_along_axis(
                logp, jnp.full((beam, 1, 1), i), axis=1
            )[:, 0, :]  # (beam, V) — logits at position i predict token i+1
            step_logp = jnp.where(end_flag[:, None], eos_only[None], step_logp)

            top_logp, top_idx = jax.lax.top_k(step_logp, beam)  # (beam, beam)
            cand = (scores[:, None] + top_logp).reshape(-1)
            best_scores, best_flat = jax.lax.top_k(cand, beam)
            src_beam = best_flat // beam
            tokens = top_idx.reshape(-1)[best_flat]

            hyps = hyps[src_beam].at[:, i + 1].set(tokens)
            end_flag = end_flag[src_beam] | (tokens == eos)
            return hyps, best_scores, end_flag

        hyps, scores, _ = jax.lax.fori_loop(0, maxlen, body, (hyps, scores, end_flag))
        best = jnp.argmax(scores)
        return hyps[best], scores[best]

    def _rescore_device_impl(self, enc_out, enc_mask, hyps_in, hyps_out,
                             hyps_lens):
        """One decoder pass over ``B * beam`` hypotheses (``enc_out`` batch B,
        hyps grouped per utterance: utt0's beam rows, then utt1's, ...).

        Returns the per-hypothesis attention log-prob ``sum_j logp[j,
        hyps_out[j]]`` over the first ``hyps_lens`` positions — scored ON
        DEVICE: returning the raw ``(B*beam, L, vocab)`` log-softmax cost a
        147 MB device→host transfer that dominated rescoring RTF (PERF.md).
        """
        beam = hyps_in.shape[0] // enc_out.shape[0]
        memory = jnp.repeat(enc_out, beam, axis=0)
        mem_mask = jnp.repeat(enc_mask, beam, axis=0)
        logits = self._apply(
            self.variables, memory, mem_mask, hyps_in, hyps_lens,
            method=self.model.decoder_logits,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(logp, hyps_out[..., None], axis=-1)[..., 0]
        pos = jnp.arange(hyps_in.shape[1])[None, :]
        return jnp.where(pos < hyps_lens[:, None], tok_lp, 0.0).sum(-1)

    # ---- host drivers ----

    def ctc_greedy_search(self, feats, feat_lens):
        """Best CTC path, repeats/blanks collapsed (reference recognize.py:254)."""
        best, score, valid = self._encode_greedy(feats, feat_lens)
        best, valid = np.asarray(best), np.asarray(valid)
        hyps = [
            remove_duplicates_and_blank(row[v].tolist(), self.blank_id)
            for row, v in zip(best, valid)
        ]
        return hyps, np.asarray(score)

    def ctc_prefix_beam_search_batch(self, feats, feat_lens):
        """Batched prefix beam search: ONE encoder+topk device program for the
        whole batch, then the (inherently sequential) host DP per utterance.

        Returns ``(batch_hyps, enc_out, enc_mask)`` where ``batch_hyps[b]`` is
        the utterance's best-first ``[(prefix, log_prob), ...]`` list. The
        reference runs this one utterance at a time (recognize.py:273);
        batching amortizes the encoder pass and the host↔device round trip —
        the two costs that dominated the round-1 RTF.
        """
        enc_out, enc_mask, top_logp, top_idx = self._encode_topk(feats, feat_lens)
        valid = np.asarray(enc_mask[:, 0, :]).sum(-1).astype(np.int32)
        top_logp, top_idx = np.asarray(top_logp), np.asarray(top_idx)
        # native C++ DP when built (one thread per utterance; ~1000x the
        # Python loop, which dominated rescoring RTF — PERF.md); the Python
        # DP below is the always-available reference implementation
        try:
            from mindaudio_tpu import _native

            if _native.beam_available():
                batch_hyps = _native.ctc_prefix_beam_batch(
                    top_logp, top_idx, valid, self.beam_size, self.blank_id)
                return batch_hyps, enc_out, enc_mask
        except Exception:
            pass
        batch_hyps = [
            ctc_prefix_beam_dp(top_logp[b], top_idx[b], int(valid[b]),
                               self.beam_size, self.blank_id)
            for b in range(feats.shape[0])
        ]
        return batch_hyps, enc_out, enc_mask

    def ctc_prefix_beam_search(self, feats, feat_lens):
        """Batch-1 prefix beam search (reference recognize.py:273).

        Returns ``(hyps, enc_out, enc_mask)`` with hyps best-first.
        """
        assert feats.shape[0] == 1, "use ctc_prefix_beam_search_batch for B>1"
        batch_hyps, enc_out, enc_mask = self.ctc_prefix_beam_search_batch(
            feats, feat_lens)
        return batch_hyps[0], enc_out, enc_mask

    def _hyp_to_tokens(self, hyp):
        out = []
        for tok in np.asarray(hyp)[1:].tolist():  # drop sos
            if tok == self.eos:
                break
            out.append(int(tok))
        return out

    def recognize(self, feats, feat_lens):
        """Batch-1 attention beam search; returns (token list, score)."""
        assert feats.shape[0] == 1
        enc_out, enc_mask, _ = self._encode_jit(feats, feat_lens)
        hyp, score = self._beam_device(enc_out, enc_mask)
        return self._hyp_to_tokens(hyp), float(score)

    def recognize_batch(self, feats, feat_lens):
        """Batched attention beam search: the per-utterance beam fori_loop
        vmapped over the batch — one device program for all utterances
        (identical per-utterance math to :meth:`recognize`; the reference's
        beam graph is batch-1 only, decoder_factory.py:141-192).

        Returns ``[(tokens, score), ...]`` per utterance.
        """
        enc_out, enc_mask, _ = self._encode_jit(feats, feat_lens)
        hyps, scores = self._beam_device_vmapped(enc_out, enc_mask)
        hyps, scores = np.asarray(hyps), np.asarray(scores)
        return [(self._hyp_to_tokens(hyps[b]), float(scores[b]))
                for b in range(feats.shape[0])]

    def streaming_ctc_greedy(self, feat_chunks, required_cache_size=-1):
        """Streaming CTC greedy over an iterable of raw-feature chunks.

        Each chunk is ``(1, 4*C + 3, F)`` raw frames (see
        ``ConformerEncoder.forward_chunk``); emission is incremental —
        tokens for chunk i are final when chunk i is processed. The model
        must be built with ``causal_conv=True`` and trained with chunked
        masks. New capability beyond the reference (no streaming driver
        exists there).

        ``required_cache_size`` caps the attention left context so cache
        size, per-chunk cost, and the jit-shape set stay bounded on long
        streams (see ``ConformerEncoder.forward_chunk``). The default ``-1``
        keeps exact full history (identical hypotheses to offline greedy on
        chunk-trained models); long/unbounded streams should pass a cap
        (e.g. 128 subsampled frames ~5 s) or the cache grows — and
        recompiles — every chunk.

        Returns the collapsed token list.
        """
        att_caches = cnn_caches = None
        hyp: List[int] = []
        prev = self.blank_id
        for chunk in feat_chunks:
            log_probs, att_caches, cnn_caches = self._encode_chunk(
                jnp.asarray(chunk), att_caches, cnn_caches,
                required_cache_size,
            )
            best = np.asarray(log_probs.argmax(-1))[0]
            for tok in best.tolist():
                if tok != prev and tok != self.blank_id:
                    hyp.append(int(tok))
                prev = tok
        return hyp

    def attention_rescoring_batch(self, feats, feat_lens):
        """Batched attention rescoring: batched prefix beam candidates, ONE
        decoder pass over all ``B * beam`` hypotheses, host argmax per
        utterance (reference recognize.py:339-406 is batch-1 throughout).

        Returns ``[(tokens, score), ...]`` per utterance.
        """
        batch_hyps, enc_out, enc_mask = self.ctc_prefix_beam_search_batch(
            feats, feat_lens)
        max_tgt = self.max_tgt_len
        beam = self.beam_size
        # CTC prefixes are bounded by frame count, not max_tgt_len — truncate
        # so decoder scoring and padding agree; pad each utterance's list to
        # exactly `beam` rows (the DP can return fewer) for a static shape
        batch_hyps = [
            ([(h[:max_tgt], s) for h, s in hyps]
             + [((), -float("inf"))] * (beam - len(hyps)))[:beam]
            for hyps in batch_hyps
        ]
        flat = [h for hyps in batch_hyps for h in hyps]
        hyps_lens = np.array([len(h[0]) for h in flat], np.int32)
        padded = pad_sequence(
            [np.array(h[0], np.int32) for h in flat],
            padding_value=-1, max_len=max_tgt,
        )
        hyps_in, hyps_out = add_sos_eos(padded, self.sos, self.eos)
        # gather targets: prefix tokens then eos; pads → 0 for a safe gather
        hyps_out = np.where(hyps_out < 0, 0, hyps_out)
        att_scores = np.asarray(self._rescore_device(
            enc_out, enc_mask, jnp.asarray(hyps_in.astype(np.int32)),
            jnp.asarray(hyps_out.astype(np.int32)),
            jnp.asarray(hyps_lens + 1),
        ))

        results = []
        for b, hyps in enumerate(batch_hyps):
            best_score, best_index = -float("inf"), 0
            for i, (prefix, ctc_score) in enumerate(hyps):
                score = float(att_scores[b * beam + i]) + ctc_score * self.ctc_weight
                if score > best_score:
                    best_score, best_index = score, i
            results.append((list(hyps[best_index][0]), float(best_score)))
        return results

    def attention_rescoring(self, feats, feat_lens):
        """Batch-1 attention rescoring (reference recognize.py:339-406)."""
        assert feats.shape[0] == 1, "use attention_rescoring_batch for B>1"
        return self.attention_rescoring_batch(feats, feat_lens)[0]


# ---- reference-name module-level drivers ----
#
# The reference exposes decode as free functions taking the model per call
# (recognize.py:78/254/273/339). These wrappers keep that calling
# convention; each (model, variables, options) tuple gets one cached
# ASRInference so the jitted programs compile once. The cache is a small
# LRU — decode loops over one model hit the same entry every call.

_INFERENCE_LRU_MAX = 8
_inference_cache: "dict" = {}


def _cached_inference(model, variables, **opts):
    key = (id(model), id(variables), tuple(sorted(opts.items())))
    inf = _inference_cache.pop(key, None)
    if inf is None:
        inf = ASRInference(model, variables, **opts)
    _inference_cache[key] = inf  # re-insert = move to MRU end
    while len(_inference_cache) > _INFERENCE_LRU_MAX:
        _inference_cache.pop(next(iter(_inference_cache)))
    return inf


def ctc_greedy_search(model, variables, feats, feat_lens, **opts):
    """Reference recognize.py:254 convention; see
    :meth:`ASRInference.ctc_greedy_search`."""
    return _cached_inference(model, variables, **opts).ctc_greedy_search(
        feats, feat_lens)


def ctc_prefix_beam_search(model, variables, feats, feat_lens,
                           beam_size=10, **opts):
    """Reference recognize.py:273 convention; batch-1 or batched ``feats``
    both work (see :meth:`ASRInference.ctc_prefix_beam_search_batch`)."""
    inf = _cached_inference(model, variables, beam_size=beam_size, **opts)
    if feats.shape[0] == 1:
        return inf.ctc_prefix_beam_search(feats, feat_lens)
    return inf.ctc_prefix_beam_search_batch(feats, feat_lens)


def recognize(model, variables, feats, feat_lens, beam_size=10, **opts):
    """Attention beam search (reference recognize.py:78 convention)."""
    inf = _cached_inference(model, variables, beam_size=beam_size, **opts)
    if feats.shape[0] == 1:
        return inf.recognize(feats, feat_lens)
    return inf.recognize_batch(feats, feat_lens)


def attention_rescoring(model, variables, feats, feat_lens,
                        beam_size=10, ctc_weight=0.3, **opts):
    """CTC prefix beam + decoder rescoring (reference recognize.py:339)."""
    inf = _cached_inference(model, variables, beam_size=beam_size,
                            ctc_weight=ctc_weight, **opts)
    if feats.shape[0] == 1:
        return inf.attention_rescoring(feats, feat_lens)
    return inf.attention_rescoring_batch(feats, feat_lens)


__all__ += [
    "ctc_greedy_search",
    "ctc_prefix_beam_search",
    "recognize",
    "attention_rescoring",
]
