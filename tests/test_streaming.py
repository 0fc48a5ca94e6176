"""Streaming conformer: chunk-mask construction and chunked-encoder behavior
(reference utils/mask.py:169-271 + conformer dynamic-chunk training)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindaudio_tpu.utils.mask import (
    add_optional_chunk_mask,
    make_non_pad_mask,
    subsequent_chunk_mask,
)


class TestChunkMasks:
    def test_subsequent_chunk_mask(self):
        m = np.asarray(subsequent_chunk_mask(6, chunk_size=2))
        # frame 0,1 see chunk 0 only; frame 2,3 see chunks 0-1; etc.
        assert m.shape == (6, 6)
        assert m[0].tolist() == [True, True, False, False, False, False]
        assert m[3].tolist() == [True, True, True, True, False, False]
        assert m[5].tolist() == [True] * 6

    def test_left_chunks_limit(self):
        m = np.asarray(subsequent_chunk_mask(8, chunk_size=2, num_left_chunks=1))
        # frame 6 sees its chunk (6,7) plus 1 left chunk (4,5) only
        assert m[6].tolist() == [False] * 4 + [True] * 4

    def test_static_chunk_masking(self):
        lens = jnp.asarray([8, 6])
        pad = make_non_pad_mask(lens, 8)[:, None, :]
        chunk = add_optional_chunk_mask(
            pad, use_dynamic_chunk=False, use_dynamic_left_chunk=False,
            decoding_chunk_size=0, static_chunk_size=2, num_decoding_left_chunks=-1,
        )
        m = np.asarray(chunk[0])
        assert m.shape == (8, 8)
        assert not m[0, 2]  # first frame can't see the next chunk
        assert m[2, 0]      # later frames see earlier chunks

    def test_dynamic_chunk_needs_rng(self):
        lens = jnp.asarray([8])
        pad = make_non_pad_mask(lens, 8)[:, None, :]
        out = add_optional_chunk_mask(
            pad, use_dynamic_chunk=True, use_dynamic_left_chunk=False,
            decoding_chunk_size=0, static_chunk_size=0,
            num_decoding_left_chunks=-1, rng_key=jax.random.PRNGKey(0),
        )
        assert out.shape == (1, 8, 8)


class TestChunkedEncoder:
    def test_chunked_vs_full_context_differ_only_late(self):
        """A chunked encoder must not attend across chunk boundaries: output
        at frame 0 is independent of far-future input frames."""
        from mindaudio_tpu.models.conformer import ConformerEncoder

        enc = ConformerEncoder(
            input_dim=16, d_model=32, head_num=2, ffn_dim=64, num_layers=1,
            static_chunk_size=2, kernel_size=3,
        )
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 40, 16)).astype(np.float32)
        lens = jnp.asarray([40])
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), lens)["params"]
        out1, _ = enc.apply({"params": params}, jnp.asarray(x), lens)

        # perturb the last 8 input frames; early outputs must stay similar
        # (conv front-end has small receptive-field bleed; attention must not)
        x2 = x.copy()
        x2[:, -8:] += 10.0
        out2, _ = enc.apply({"params": params}, jnp.asarray(x2), lens)
        early1, early2 = np.asarray(out1)[:, :2], np.asarray(out2)[:, :2]
        np.testing.assert_allclose(early1, early2, atol=1e-3)

        # sanity: a full-context encoder DOES change early outputs
        full = ConformerEncoder(
            input_dim=16, d_model=32, head_num=2, ffn_dim=64, num_layers=1,
            kernel_size=3,
        )
        fparams = full.init(jax.random.PRNGKey(0), jnp.asarray(x), lens)["params"]
        f1, _ = full.apply({"params": fparams}, jnp.asarray(x), lens)
        f2, _ = full.apply({"params": fparams}, jnp.asarray(x2), lens)
        assert np.abs(np.asarray(f1)[:, :2] - np.asarray(f2)[:, :2]).max() > 1e-3


class TestForwardChunk:
    def test_streaming_matches_full_forward(self):
        """Chunk-by-chunk encoding with KV + conv caches must reproduce the
        full forward run with the same static chunk masks and causal conv."""
        from mindaudio_tpu.models.conformer import ConformerEncoder

        C = 4           # subsampled chunk size
        n_chunks = 5
        t_sub = C * n_chunks
        raw_t = 4 * t_sub + 3   # full-utterance raw frames

        enc = ConformerEncoder(
            input_dim=16, d_model=32, head_num=2, ffn_dim=64, num_layers=2,
            static_chunk_size=C, causal_conv=True, kernel_size=7,
            norm_type="layer_norm",
        )
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, raw_t, 16)).astype(np.float32)
        lens = jnp.asarray([raw_t, raw_t])
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), lens)["params"]

        full, _ = enc.apply({"params": params}, jnp.asarray(x), lens)
        full = np.asarray(full)
        assert full.shape[1] == t_sub

        att_caches = cnn_caches = None
        outs = []
        for c in range(n_chunks):
            lo = 4 * (c * C)
            hi = lo + 4 * C + 3
            chunk = jnp.asarray(x[:, lo:hi])
            ys, att_caches, cnn_caches = enc.apply(
                {"params": params}, chunk, att_caches, cnn_caches,
                method=enc.forward_chunk,
            )
            outs.append(np.asarray(ys))
        streamed = np.concatenate(outs, axis=1)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-5)


class TestStreamingGreedy:
    def test_matches_batch_greedy(self):
        """Streaming CTC greedy over chunks equals whole-utterance greedy for
        a chunk-trained (static mask + causal conv) model."""
        from mindaudio_tpu.models.asr_model import ASRModel
        from mindaudio_tpu.utils.common import add_sos_eos
        from mindaudio_tpu.utils.recognize import ASRInference

        C, n_chunks, vocab = 4, 4, 12
        t_sub = C * n_chunks
        raw_t = 4 * t_sub + 3
        model = ASRModel(
            vocab_size=vocab, input_dim=12, d_model=32, head_num=2, ffn_dim=64,
            num_encoder_layers=1, num_decoder_layers=1,
            static_chunk_size=C, causal_conv=True,
        )
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((1, raw_t, 12)).astype(np.float32)
        lens = np.asarray([raw_t], np.int32)
        labels = np.array([[1, 2]], np.int32)
        ys_in, ys_out = add_sos_eos(labels, vocab - 1, vocab - 1)
        batch = {
            "feats": jnp.asarray(feats), "feat_lens": jnp.asarray(lens),
            "labels": jnp.asarray(labels),
            "label_lens": jnp.asarray([2], jnp.int32),
            "ys_in": jnp.asarray(ys_in.astype(np.int32)),
            "ys_out": jnp.asarray(ys_out.astype(np.int32)),
            "ys_lens": jnp.asarray([3], jnp.int32),
        }
        variables = {"params": model.init(jax.random.PRNGKey(0), batch)["params"]}
        inf = ASRInference(model, variables, beam_size=2, max_tgt_len=6)

        full_hyp = inf.ctc_greedy_search(feats, lens)[0][0]
        chunks = [feats[:, 4 * c * C: 4 * c * C + 4 * C + 3] for c in range(n_chunks)]
        stream_hyp = inf.streaming_ctc_greedy(chunks)
        assert stream_hyp == full_hyp


class TestCappedStreamingCache:
    """required_cache_size bounds the attention cache (WeNet semantic)."""

    def test_cache_stays_capped_and_output_matches_windowed_attention(self):
        from mindaudio_tpu.models.conformer import ConformerEncoder

        C, n_chunks = 4, 6
        raw_t = 4 * (C * n_chunks) + 3
        cap = 2 * C  # two chunks of left context
        enc = ConformerEncoder(
            input_dim=16, d_model=32, head_num=2, ffn_dim=64, num_layers=2,
            static_chunk_size=C, causal_conv=True, kernel_size=7,
        )
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, raw_t, 16)).astype(np.float32)
        lens = jnp.asarray([raw_t])
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), lens)["params"]

        att_caches = cnn_caches = None
        for c in range(n_chunks):
            lo, hi = 4 * (c * C), 4 * (c * C) + 4 * C + 3
            ys, att_caches, cnn_caches = enc.apply(
                {"params": params}, jnp.asarray(x[:, lo:hi]),
                att_caches, cnn_caches, cap,
                method=enc.forward_chunk,
            )
            assert att_caches[0][0].shape[2] <= cap
            assert np.isfinite(np.asarray(ys)).all()
        # after warmup every call sees exactly `cap` cached frames: the jit
        # shape set is bounded
        assert att_caches[0][0].shape[2] == cap

    def test_cap_zero_means_no_left_context(self):
        from mindaudio_tpu.models.conformer import ConformerEncoder

        C = 4
        enc = ConformerEncoder(
            input_dim=16, d_model=32, head_num=2, ffn_dim=64, num_layers=1,
            static_chunk_size=C, causal_conv=True, kernel_size=7,
        )
        rng = np.random.default_rng(8)
        x = rng.standard_normal((1, 4 * C + 3, 16)).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray([4 * C + 3]))["params"]
        _, att_caches, _ = enc.apply(
            {"params": params}, jnp.asarray(x), None, None, 0,
            method=enc.forward_chunk,
        )
        assert att_caches[0][0].shape[2] == 0
