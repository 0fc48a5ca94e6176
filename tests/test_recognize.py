"""Decode-driver tests: CTC prefix-beam DP vs exact enumeration, plus
end-to-end shape/consistency checks of the four decode modes on a tiny model
(the reference has no decode tests at all — SURVEY §4)."""

import itertools

import numpy as np
import pytest


def _exact_ctc_scores(log_probs, blank=0):
    """Exact CTC label-sequence posteriors by enumerating all alignments."""
    T, V = log_probs.shape
    scores = {}
    for path in itertools.product(range(V), repeat=T):
        # collapse path -> label sequence
        label, prev = [], None
        for s in path:
            if s != prev and s != blank:
                label.append(s)
            prev = s
        lp = sum(log_probs[t, s] for t, s in enumerate(path))
        key = tuple(label)
        if key in scores:
            m = max(scores[key], lp)
            scores[key] = m + np.log(np.exp(scores[key] - m) + np.exp(lp - m))
        else:
            scores[key] = lp
    return scores


class TestCTCPrefixBeamDP:
    def test_matches_exact_enumeration(self):
        from mindaudio_tpu.utils.recognize import ctc_prefix_beam_dp

        rng = np.random.default_rng(0)
        T, V = 5, 4
        logits = rng.standard_normal((T, V))
        log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

        # full-vocab "topk" makes the beam DP exact up to pruning
        idx = np.argsort(-log_probs, axis=-1)
        logp = np.take_along_axis(log_probs, idx, axis=-1)
        hyps = ctc_prefix_beam_dp(logp, idx, T, beam_size=64)

        exact = _exact_ctc_scores(log_probs)
        best_exact = max(exact.items(), key=lambda kv: kv[1])
        assert hyps[0][0] == best_exact[0]
        np.testing.assert_allclose(hyps[0][1], best_exact[1], rtol=1e-6)
        # every reported hyp's score matches the exact posterior
        for prefix, score in hyps[:5]:
            np.testing.assert_allclose(score, exact[prefix], rtol=1e-6)

    def test_repeat_needs_blank(self):
        from mindaudio_tpu.utils.recognize import ctc_prefix_beam_dp

        # posterior strongly favors token 1 every frame -> best label is (1,)
        log_probs = np.log(np.array([[0.05, 0.9, 0.05]] * 4))
        idx = np.argsort(-log_probs, axis=-1)
        logp = np.take_along_axis(log_probs, idx, axis=-1)
        hyps = ctc_prefix_beam_dp(logp, idx, 4, beam_size=8)
        assert hyps[0][0] == (1,)


@pytest.fixture(scope="module")
def tiny_asr():
    import jax
    import jax.numpy as jnp

    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.utils.common import add_sos_eos
    from mindaudio_tpu.utils.recognize import ASRInference

    vocab = 16
    model = ASRModel(
        vocab_size=vocab, input_dim=20, d_model=32, head_num=2, ffn_dim=64,
        num_encoder_layers=1, num_decoder_layers=1,
    )
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 32, 20)).astype(np.float32)
    feat_lens = np.array([32], np.int32)
    labels = np.array([[1, 2, 3]], np.int32)
    ys_in, ys_out = add_sos_eos(labels, vocab - 1, vocab - 1)
    batch = {
        "feats": jnp.asarray(feats), "feat_lens": jnp.asarray(feat_lens),
        "labels": jnp.asarray(labels), "label_lens": jnp.asarray([3], jnp.int32),
        "ys_in": jnp.asarray(ys_in.astype(np.int32)),
        "ys_out": jnp.asarray(ys_out.astype(np.int32)),
        "ys_lens": jnp.asarray([4], jnp.int32),
    }
    variables = {"params": model.init(jax.random.PRNGKey(0), batch)["params"]}
    inf = ASRInference(model, variables, beam_size=4, max_tgt_len=8)
    return inf, feats, feat_lens


class TestDecodeModes:
    def test_ctc_greedy(self, tiny_asr):
        inf, feats, lens = tiny_asr
        hyps, scores = inf.ctc_greedy_search(feats, lens)
        assert len(hyps) == 1 and isinstance(hyps[0], list)
        # deterministic
        hyps2, _ = inf.ctc_greedy_search(feats, lens)
        assert hyps == hyps2

    def test_prefix_beam(self, tiny_asr):
        inf, feats, lens = tiny_asr
        hyps, enc_out, enc_mask = inf.ctc_prefix_beam_search(feats, lens)
        assert len(hyps) <= 4
        scores = [s for _, s in hyps]
        assert scores == sorted(scores, reverse=True)
        # greedy result must appear among the beam prefixes for an easy input
        assert all(isinstance(p, tuple) for p, _ in hyps)

    def test_attention_beam(self, tiny_asr):
        inf, feats, lens = tiny_asr
        hyp, score = inf.recognize(feats, lens)
        assert isinstance(hyp, list) and len(hyp) <= 8
        assert all(0 <= t < 16 for t in hyp)
        assert np.isfinite(score)

    def test_attention_rescoring(self, tiny_asr):
        inf, feats, lens = tiny_asr
        hyp, score = inf.attention_rescoring(feats, lens)
        beam_hyps, _, _ = inf.ctc_prefix_beam_search(feats, lens)
        assert tuple(hyp) in [p for p, _ in beam_hyps]
        assert np.isfinite(score)


@pytest.fixture(scope="module")
def tiny_asr_batch(tiny_asr):
    """A 3-utterance variable-length batch sharing tiny_asr's model."""
    inf, _, _ = tiny_asr
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((3, 32, 20)).astype(np.float32)
    feat_lens = np.array([32, 25, 19], np.int32)
    return inf, feats, feat_lens


class TestBatchedDecode:
    """VERDICT r1 #8: batched prefix-beam + rescoring must equal the
    sequential batch-1 paths (reference recognize.py:339-406 is batch-1)."""

    def test_prefix_beam_batch_matches_sequential(self, tiny_asr_batch):
        inf, feats, lens = tiny_asr_batch
        batch_hyps, _, _ = inf.ctc_prefix_beam_search_batch(feats, lens)
        assert len(batch_hyps) == 3
        for b in range(3):
            seq_hyps, _, _ = inf.ctc_prefix_beam_search(
                feats[b:b + 1], lens[b:b + 1])
            assert [p for p, _ in batch_hyps[b]] == [p for p, _ in seq_hyps]
            np.testing.assert_allclose(
                [s for _, s in batch_hyps[b]], [s for _, s in seq_hyps],
                rtol=1e-5, atol=1e-5)

    def test_rescoring_batch_matches_sequential(self, tiny_asr_batch):
        inf, feats, lens = tiny_asr_batch
        results = inf.attention_rescoring_batch(feats, lens)
        assert len(results) == 3
        for b, (hyp, score) in enumerate(results):
            seq_hyp, seq_score = inf.attention_rescoring(
                feats[b:b + 1], lens[b:b + 1])
            assert hyp == seq_hyp
            np.testing.assert_allclose(score, seq_score, rtol=1e-4, atol=1e-4)

    def test_device_scoring_matches_host_formula(self, tiny_asr):
        """Independent oracle for the on-device gather/mask/sum: recompute
        each candidate's score on host as sum_j logp[j][prefix_j] +
        logp[len][eos] + ctc_weight * ctc (the formula the device program
        replaced — reference recognize.py:339-406)."""
        import jax
        import jax.numpy as jnp

        from mindaudio_tpu.utils.common import add_sos_eos, pad_sequence

        inf, feats, lens = tiny_asr
        hyps, enc_out, enc_mask = inf.ctc_prefix_beam_search(feats, lens)
        hyp, score = inf.attention_rescoring(feats, lens)

        # host reference: full decoder logits for every candidate
        max_tgt = inf.max_tgt_len
        cand = [(h[:max_tgt], s) for h, s in hyps]
        hyps_in, _ = add_sos_eos(
            pad_sequence([np.array(h, np.int32) for h, _ in cand],
                         padding_value=-1, max_len=max_tgt),
            inf.sos, inf.eos)
        hyps_lens = np.array([len(h) for h, _ in cand], np.int32)
        memory = jnp.repeat(enc_out, len(cand), axis=0)
        mem_mask = jnp.repeat(enc_mask, len(cand), axis=0)
        logits = inf.model.apply(
            inf.variables, memory, mem_mask,
            jnp.asarray(hyps_in.astype(np.int32)),
            jnp.asarray(hyps_lens + 1), method=inf.model.decoder_logits)
        logp = np.asarray(jax.nn.log_softmax(
            np.asarray(logits, np.float32), axis=-1))

        best_score, best_hyp = -float("inf"), None
        for i, (prefix, ctc_score) in enumerate(cand):
            s = sum(logp[i][j][w] for j, w in enumerate(prefix))
            s += logp[i][len(prefix)][inf.eos]
            s += ctc_score * inf.ctc_weight
            if s > best_score:
                best_score, best_hyp = s, list(prefix)

        assert hyp == best_hyp
        np.testing.assert_allclose(score, best_score, rtol=1e-4, atol=1e-4)

    def test_attention_beam_batch_matches_sequential(self, tiny_asr_batch):
        inf, feats, lens = tiny_asr_batch
        results = inf.recognize_batch(feats, lens)
        assert len(results) == 3
        for b, (hyp, score) in enumerate(results):
            seq_hyp, seq_score = inf.recognize(feats[b:b + 1], lens[b:b + 1])
            assert hyp == seq_hyp
            np.testing.assert_allclose(score, seq_score, rtol=1e-4, atol=1e-4)


class TestModuleLevelDrivers:
    """Reference-convention free functions wrap ASRInference with an LRU
    cache: same results as the method API, one compile per (model, opts)."""

    def test_match_method_api_and_cache(self, tiny_asr):
        import mindaudio_tpu.utils.recognize as rec

        inf, feats, lens = tiny_asr
        model, variables = inf.model, inf.variables
        hyps_m, _ = inf.ctc_greedy_search(feats, lens)
        hyps_f, _ = rec.ctc_greedy_search(model, variables, feats, lens)
        assert hyps_f == hyps_m
        # repeated call reuses the cached ASRInference (no recompile)
        before = len(rec._inference_cache)
        rec.ctc_greedy_search(model, variables, feats, lens)
        assert len(rec._inference_cache) == before

        hyp_m, score_m = inf.recognize(feats, lens)
        hyp_f, score_f = rec.recognize(model, variables, feats, lens,
                                       beam_size=4, max_tgt_len=8)
        assert hyp_f == hyp_m and score_f == pytest.approx(score_m)

        hyp_rm, _ = inf.attention_rescoring(feats, lens)
        hyp_rf, _ = rec.attention_rescoring(model, variables, feats, lens,
                                            beam_size=4, max_tgt_len=8)
        assert hyp_rf == hyp_rm
