"""Weight-only int8 matmul: quantization round-trip + kernel vs reference.

The Pallas kernel runs in interpret mode on the CPU mesh (compiled mode is
exercised on the real chip by the serving bench)."""

import jax.numpy as jnp
import numpy as np

from mindaudio_tpu.ops.quant import (dequantize_int8, int8_dynamic_matmul,
                                     int8_matmul, quantize_int8)


class TestQuantizeInt8:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((256, 512)).astype(np.float32)
        vq, s = quantize_int8(w)
        assert vq.dtype == np.int8 and s.shape == (512,)
        wd = np.asarray(dequantize_int8(vq, s))
        # symmetric per-channel int8: max error = scale/2 per element
        assert np.abs(wd - w).max() <= (s.max() / 2) + 1e-6

    def test_preserves_extremes(self):
        w = np.array([[-3.0, 0.5], [1.5, -0.25]], np.float32)
        vq, s = quantize_int8(w)
        assert vq.min() >= -127 and vq.max() <= 127
        # the per-channel max hits ±127 exactly
        assert np.abs(vq).max(axis=0).tolist() == [127, 127]


class TestInt8Matmul:
    def test_matches_dequantized_reference(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((48, 256)).astype(np.float32)
        w = rng.standard_normal((256, 384)).astype(np.float32) * 0.05
        vq, s = quantize_int8(w)

        got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(vq),
                                     jnp.asarray(s), interpret=True))
        want = np.asarray(jnp.asarray(x, jnp.bfloat16)
                          @ jnp.asarray(dequantize_int8(vq, s), jnp.bfloat16))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
        # and close to the unquantized f32 product (quant + bf16 error)
        np.testing.assert_allclose(got, x @ w, rtol=0.1, atol=0.1)

    def test_training_sized_m_multi_tile(self):
        """Many M-blocks AND multiple N-tiles: the weight-resident grid
        (N outer, M inner, dequant-once scratch) must stay exact — this M
        regime used to bail to an XLA dequant fallback."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal((640, 128)).astype(np.float32)  # 5 M-blocks
        w = rng.standard_normal((128, 384)).astype(np.float32) * 0.05
        vq, s = quantize_int8(w)
        got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(vq),
                                     jnp.asarray(s), block_n=128,
                                     interpret=True))
        want = np.asarray(jnp.asarray(x, jnp.bfloat16)
                          @ jnp.asarray(dequantize_int8(vq, s), jnp.bfloat16))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    def test_leading_dims_and_padding(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 5, 128)).astype(np.float32)  # M=10, pad
        w = rng.standard_normal((128, 200)).astype(np.float32) * 0.1  # N pad
        vq, s = quantize_int8(w)
        got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(vq),
                                     jnp.asarray(s), interpret=True))
        assert got.shape == (2, 5, 200)
        want = np.asarray(jnp.asarray(x.reshape(-1, 128), jnp.bfloat16)
                          @ jnp.asarray(dequantize_int8(vq, s), jnp.bfloat16))
        np.testing.assert_allclose(got.reshape(-1, 200), want,
                                   rtol=3e-2, atol=3e-2)


class TestInt8DynamicMatmul:
    def test_w8a8_accuracy_and_shapes(self):
        """W8A8: per-row activation + per-channel weight quantization stays
        at the ~1% relative-error serving level, preserves leading dims and
        input dtype."""
        rng = np.random.default_rng(4)
        x = rng.standard_normal((3, 17, 256)).astype(np.float32)
        w = rng.standard_normal((256, 320)).astype(np.float32) * 0.05
        vq, s = quantize_int8(w)
        got = np.asarray(int8_dynamic_matmul(jnp.asarray(x), jnp.asarray(vq),
                                             jnp.asarray(s)))
        assert got.shape == (3, 17, 320)
        ref = x.reshape(-1, 256) @ w
        rel = np.abs(got.reshape(-1, 320) - ref).max() / np.abs(ref).max()
        assert rel < 0.03, rel

        out_bf16 = int8_dynamic_matmul(jnp.asarray(x, jnp.bfloat16),
                                       jnp.asarray(vq), jnp.asarray(s))
        assert out_bf16.dtype == jnp.bfloat16

    def test_zero_row_safe(self):
        """An all-zero activation row must not divide by zero."""
        x = np.zeros((4, 128), np.float32)
        w = np.eye(128, dtype=np.float32)
        vq, s = quantize_int8(w + 0.01)
        got = np.asarray(int8_dynamic_matmul(jnp.asarray(x), jnp.asarray(vq),
                                             jnp.asarray(s)))
        assert np.isfinite(got).all() and np.abs(got).max() == 0.0


class TestInt8Inference:
    def test_asr_inference_weight_quant(self):
        """End-to-end: int8-served ASRInference produces the same greedy
        hypotheses as the f32 path on a tiny model (interpret-mode kernel)."""
        import jax

        from mindaudio_tpu.models.asr_model import ASRModel
        from mindaudio_tpu.utils.common import add_sos_eos
        from mindaudio_tpu.utils.recognize import ASRInference

        vocab = 16
        model = ASRModel(vocab_size=vocab, input_dim=20, d_model=32,
                         head_num=2, ffn_dim=64, num_encoder_layers=1,
                         num_decoder_layers=1)
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((2, 32, 20)).astype(np.float32)
        feat_lens = np.array([32, 24], np.int32)
        labels = np.array([[1, 2, 3]], np.int32)
        ys_in, ys_out = add_sos_eos(labels, vocab - 1, vocab - 1)
        batch = {
            "feats": jnp.asarray(feats[:1]), "feat_lens": jnp.asarray(feat_lens[:1]),
            "labels": jnp.asarray(labels), "label_lens": jnp.asarray([3], jnp.int32),
            "ys_in": jnp.asarray(ys_in.astype(np.int32)),
            "ys_out": jnp.asarray(ys_out.astype(np.int32)),
            "ys_lens": jnp.asarray([4], jnp.int32),
        }
        variables = {"params": model.init(jax.random.PRNGKey(0), batch)["params"]}

        ref = ASRInference(model, variables, beam_size=3, max_tgt_len=6)
        q = ASRInference(model, variables, beam_size=3, max_tgt_len=6,
                         weight_quant="int8", weight_quant_min_size=512)

        h_ref, _ = ref.ctc_greedy_search(feats, feat_lens)
        h_q, _ = q.ctc_greedy_search(feats, feat_lens)
        assert h_ref == h_q  # argmax robust to ~1% quantization noise

        # rescoring runs through the quantized decoder too
        hyp_q, score_q = q.attention_rescoring(feats[:1], feat_lens[:1])
        assert np.isfinite(score_q)

        # the f32 copies of quantized kernels were stripped
        import jax.tree_util as jtu
        stripped = [l for p, l in
                    jtu.tree_flatten_with_path(q.variables["params"])[0]
                    if l.size == 0]
        assert stripped, "expected at least one stripped kernel"
