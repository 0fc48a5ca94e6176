"""Model zoo forward-pass tests (tiny configs, CPU) — coverage the reference
never had (SURVEY §4: reference tests only the data layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


class TestConformer:
    def test_encoder_forward(self, rng):
        from mindaudio_tpu.models import ConformerEncoder

        enc = ConformerEncoder(
            input_dim=80, d_model=64, head_num=2, ffn_dim=128, num_layers=2
        )
        xs = jnp.zeros((2, 64, 80))
        xs_lens = jnp.array([64, 40])
        params = enc.init(rng, xs, xs_lens)
        out, masks = enc.apply(params, xs, xs_lens)
        assert out.shape == (2, 15, 64)  # ((64-1)//2-1)//2 = 15
        assert masks.shape == (2, 1, 15)
        assert int(masks[1, 0].sum()) == ((40 - 1) // 2 - 1) // 2

    def test_decoder_forward(self, rng):
        from mindaudio_tpu.models import TransformerDecoder

        dec = TransformerDecoder(vocab_size=50, d_model=64, head_num=2, ffn_dim=128, num_layers=2)
        memory = jnp.zeros((2, 15, 64))
        memory_mask = jnp.ones((2, 1, 15), bool)
        ys = jnp.zeros((2, 7), jnp.int32)
        ys_lens = jnp.array([7, 5])
        params = dec.init(rng, memory, memory_mask, ys, ys_lens)
        logits = dec.apply(params, memory, memory_mask, ys, ys_lens)
        assert logits.shape == (2, 7, 50)

    def test_hybrid_loss(self, rng):
        from mindaudio_tpu.loss import ctc_loss, label_smoothing_loss

        logits = jax.random.normal(rng, (2, 15, 50))
        loss = ctc_loss(logits, jnp.array([15, 12]), jnp.ones((2, 5), jnp.int32),
                        jnp.array([5, 3]))
        assert np.isfinite(float(loss)) and float(loss) > 0
        att_logits = jax.random.normal(rng, (2, 6, 50))
        tgt = jnp.array([[1, 2, 3, 4, 5, -1], [1, 2, -1, -1, -1, -1]])
        ls = label_smoothing_loss(att_logits, tgt)
        assert np.isfinite(float(ls)) and float(ls) > 0


class TestLabelSmoothing:
    @staticmethod
    def _dense(logits, targets, smoothing=0.1, ignore_id=-1,
               normalize_length=False):
        """The materialized one-hot formulation (reference
        label_smoothing_loss.py:24 semantics) the gather form must equal."""
        vocab = logits.shape[-1]
        confidence = 1.0 - smoothing
        low = smoothing / (vocab - 1)
        mask = targets != ignore_id
        safe_t = jnp.where(mask, targets, 0)
        true_dist = jax.nn.one_hot(safe_t, vocab) * (confidence - low) + low
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        kl = (true_dist * (jnp.log(jnp.maximum(true_dist, 1e-10))
                           - log_probs)).sum(-1)
        kl = jnp.where(mask, kl, 0.0)
        denom = (jnp.maximum(mask.sum(), 1) if normalize_length
                 else targets.shape[0])
        return kl.sum() / denom

    def test_gather_form_equals_dense(self, rng):
        """The analytic gather form (no (B,L,V) one-hot materialized) must
        match the dense KL in value AND gradient."""
        from mindaudio_tpu.loss import label_smoothing_loss

        logits = jax.random.normal(rng, (3, 7, 101))
        tgt = jnp.array([[1, 2, 3, 4, 5, -1, -1],
                         [9, 8, -1, -1, -1, -1, -1],
                         [100, 0, 55, 7, 7, 7, 6]])
        for norm_len in (False, True):
            for smoothing in (0.1, 0.0, 0.4):
                want_v, want_g = jax.value_and_grad(
                    lambda lg: self._dense(lg, tgt, smoothing=smoothing,
                                           normalize_length=norm_len))(logits)
                got_v, got_g = jax.value_and_grad(
                    lambda lg: label_smoothing_loss(
                        lg, tgt, smoothing=smoothing,
                        normalize_length=norm_len))(logits)
                np.testing.assert_allclose(float(got_v), float(want_v),
                                           rtol=1e-5)
                np.testing.assert_allclose(np.asarray(got_g),
                                           np.asarray(want_g),
                                           rtol=1e-4, atol=1e-6)

    def test_bf16_logits(self, rng):
        from mindaudio_tpu.loss import label_smoothing_loss

        logits = jax.random.normal(rng, (2, 5, 64)).astype(jnp.bfloat16)
        tgt = jnp.array([[1, 2, 3, -1, -1], [4, 5, 6, 7, 8]])
        v = label_smoothing_loss(logits, tgt)
        assert np.isfinite(float(v)) and float(v) > 0


class TestDeepSpeech2:
    def test_forward(self, rng):
        from mindaudio_tpu.models import DeepSpeechModel

        model = DeepSpeechModel(vocab_size=29, hidden_size=64, num_rnn_layers=2)
        spect = jnp.zeros((2, 80, 161))
        lengths = jnp.array([80, 50])
        variables = model.init(rng, spect, lengths)
        (logits, out_lens), _ = model.apply(
            variables, spect, lengths, deterministic=True, mutable=["batch_stats"]
        )
        assert logits.shape[0] == 2 and logits.shape[2] == 29
        assert int(out_lens[0]) == logits.shape[1]

    def test_fused_bilstm_matches_flax_rnn_cell(self, rng):
        """BiLSTM (hoisted input projections, one scan for both directions)
        must be numerically identical to the flax
        ``RNN(OptimizedLSTMCell)`` fwd + reversed(keep_order) pair it
        replaced — same math, MXU-friendly schedule."""
        import flax.linen as nn
        import numpy as np

        from mindaudio_tpu.models.deepspeech2 import BiLSTM

        B, T, D, H = 3, 17, 12, 8
        x = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, D)),
                        jnp.float32)
        lengths = jnp.asarray([17, 9, 1], jnp.int32)

        class Ref(nn.Module):
            @nn.compact
            def __call__(self, x, lengths):
                fwd = nn.RNN(nn.OptimizedLSTMCell(H), name="fwd")(
                    x, seq_lengths=lengths)
                bwd = nn.RNN(nn.OptimizedLSTMCell(H), reverse=True,
                             keep_order=True, name="bwd")(x, seq_lengths=lengths)
                return fwd + bwd

        ref = Ref()
        ref_vars = ref.init(rng, x, lengths)
        want = ref.apply(ref_vars, x, lengths)

        # map the flax per-gate params onto the fused (2, D, 4H) blocks
        def gates(cell, name, key):
            return np.concatenate(
                [np.asarray(cell[f"{name}{g}"][key]) for g in "ifgo"], -1)

        cells = [ref_vars["params"]["OptimizedLSTMCell_0"],
                 ref_vars["params"]["OptimizedLSTMCell_1"]]
        fused_params = {"params": {
            "wx": jnp.stack([gates(c, "i", "kernel") for c in cells]),
            "wh": jnp.stack([gates(c, "h", "kernel") for c in cells]),
            "bias": jnp.stack([gates(c, "h", "bias") for c in cells]),
        }}
        got = BiLSTM(H).apply(fused_params, x, lengths=lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        # and without lengths (full-T both directions)
        want2 = ref.apply(ref_vars, x, None)
        got2 = BiLSTM(H).apply(fused_params, x, lengths=None)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=1e-5, atol=1e-5)


class TestEcapa:
    def test_embedding_and_classifier(self, rng):
        from mindaudio_tpu.models import Classifier, EcapaTDNN

        model = EcapaTDNN(channels=(32, 32, 32, 32, 96), lin_neurons=24)
        x = jax.random.normal(rng, (2, 50, 20))
        variables = model.init(rng, x)
        emb, _ = model.apply(variables, x, mutable=["batch_stats"])
        assert emb.shape == (2, 1, 24)

        clf = Classifier(out_neurons=10, lin_neurons=24)
        cvars = clf.init(rng, emb)
        cos = clf.apply(cvars, emb)
        assert cos.shape == (2, 10)
        assert float(jnp.abs(cos).max()) <= 1.0 + 1e-5

    def test_aam_loss(self, rng):
        from mindaudio_tpu.loss.aam_softmax import aam_softmax_loss

        cos = jax.random.uniform(rng, (4, 10), minval=-1, maxval=1)
        loss = aam_softmax_loss(cos, jnp.array([0, 1, 2, 3]))
        assert np.isfinite(float(loss))

    def test_aam_grad_finite_at_saturated_cosine(self):
        """bf16 MXU cosines can hit/exceed ±1; the gradient must stay finite
        (unclamped sqrt(1-cos^2) has an infinite derivative there — this
        NaN'd every param on the first chip train step)."""
        from mindaudio_tpu.loss.aam_softmax import aam_softmax_loss

        for v in (1.0, 1.0039, -1.0, -1.002):
            cos = jnp.array([[v, 0.3, -0.2]])
            g = jax.grad(lambda c: aam_softmax_loss(c, jnp.array([0])))(cos)
            assert np.isfinite(np.asarray(g)).all(), f"NaN grad at cos={v}"


class TestSeparation:
    def test_tasnet_forward(self, rng):
        from mindaudio_tpu.models import TasNet

        model = TasNet(enc_dim=32, frame_len=40, num_spk=2, hidden=32, num_layers=1)
        mix = jax.random.normal(rng, (2, 10, 40))
        params = model.init(rng, mix)
        est = model.apply(params, mix)
        assert est.shape == (2, 2, 10, 40)

    def test_conv_tasnet_forward(self, rng):
        from mindaudio_tpu.models import ConvTasNet

        model = ConvTasNet(
            enc_dim=64, win_len=16, bottleneck=16, hidden=32,
            num_blocks=2, num_repeats=1, num_spk=2,
        )
        mix = jax.random.normal(rng, (2, 800))
        params = model.init(rng, mix)
        est = model.apply(params, mix)
        assert est.shape == (2, 2, 800)

    def test_pit_si_snr(self, rng):
        from mindaudio_tpu.loss import cal_si_snr_jax, pit_si_snr_loss

        target = jax.random.normal(rng, (2, 2, 400))
        # est = permuted target → near-perfect SI-SNR after PIT
        est = target[:, ::-1, :]
        loss, perm = pit_si_snr_loss(est, target)
        assert float(loss) < -50.0  # > 50 dB
        np.testing.assert_array_equal(np.asarray(perm), [[1, 0], [1, 0]])
        snr_direct = cal_si_snr_jax(target, target)
        assert float(snr_direct.min()) > 50.0


class TestFastSpeech2:
    def test_forward_train_and_infer(self, rng):
        from mindaudio_tpu.models import FastSpeech2

        model = FastSpeech2(
            vocab_size=40, d_model=32, n_mels=20, encoder_layers=1,
            decoder_layers=1, head_num=2, conv_filter=64, max_seq_len=200,
        )
        phon = jnp.ones((2, 12), jnp.int32)
        src_lens = jnp.array([12, 8])
        dur = jnp.full((2, 12), 3, jnp.int32)
        pitch = jnp.zeros((2, 12))
        energy = jnp.zeros((2, 12))
        params = model.init(rng, phon, src_lens, 48, pitch, energy, dur)
        mel, log_d, p, e, mel_len, mel_mask = model.apply(
            params, phon, src_lens, 48, pitch, energy, dur
        )
        assert mel.shape == (2, 48, 20)
        assert int(mel_len[0]) == 36  # 12 phonemes × 3
        # inference path (predicted durations)
        out = model.apply(params, phon, src_lens, 48)
        assert out[0].shape == (2, 48, 20)

    def test_length_regulator(self, rng):
        from mindaudio_tpu.models.fastspeech2 import LengthRegulator

        lr_mod = LengthRegulator()
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
        dur = jnp.array([[2, 0, 3]])
        params = lr_mod.init(rng, x, dur, 8)
        out, mel_len = lr_mod.apply(params, x, dur, 8)
        assert int(mel_len[0]) == 5
        # frames 0-1 ← phoneme 0; frames 2-4 ← phoneme 2 (dur 0 skipped)
        np.testing.assert_allclose(np.asarray(out[0, :2, 0]), [0, 0])
        np.testing.assert_allclose(np.asarray(out[0, 2:5, 0]), [4, 4, 4])
        np.testing.assert_allclose(np.asarray(out[0, 5:]), 0.0)


class TestWaveGrad:
    def test_forward_and_diffuse(self, rng):
        from mindaudio_tpu.models import WaveGrad
        from mindaudio_tpu.models.wavegrad import diffuse

        model = WaveGrad(
            up_factors=(5, 5, 3, 2, 2), down_factors=(2, 2, 3, 5),
            down_channels=(8, 8, 16, 32), film_channels=(8, 8, 16, 32, 32),
            up_channels=(32, 32, 16, 8, 8),
        )
        mel = jax.random.normal(rng, (1, 4, 80))
        audio = jax.random.normal(rng, (1, 4 * 300))
        noise_scale = jnp.array([0.5])
        params = model.init(rng, mel, audio, noise_scale)
        eps = model.apply(params, mel, audio, noise_scale)
        assert eps.shape == (1, 1200)

        noisy, noise, scale = diffuse(rng, audio, (0.3, 0.6))
        assert noisy.shape == audio.shape
        assert 0.3 <= float(scale[0]) <= 0.6

    def test_fast_schedule_sampling(self, rng):
        """The 6-iteration fast schedule drives the same reverse_diffusion
        scan as the 1000-step default (continuous noise-level conditioning
        makes any inference schedule valid for a trained model). A bounded
        analytic predictor stands in for a trained net — an UNtrained net
        legitimately diverges over ancestral sampling, which is a property
        of random weights, not of the scan or the schedule."""
        from mindaudio_tpu.models.wavegrad import (
            fast_noise_schedule,
            reverse_diffusion,
        )

        betas = fast_noise_schedule()
        assert len(betas) == 6 and (np.diff(betas) > 0).all()
        assert 0.0 < betas[0] and betas[-1] < 1.0

        mel = jax.random.normal(rng, (1, 4, 80))

        def apply_fn(params, mel_b, audio, scale):
            return jnp.tanh(audio)  # bounded eps: sampler stays finite

        audio = reverse_diffusion({}, apply_fn, mel, rng,
                                  betas=betas, hop=300)
        assert audio.shape == (1, 1200)
        assert np.isfinite(np.asarray(audio)).all()


class TestMetrics:
    def test_wer(self):
        from mindaudio_tpu.metric import wer

        assert wer(["a", "b", "c"], ["a", "x", "c"]) == pytest.approx(1 / 3)
        assert wer([["a", "b"]], [["a", "b"]]) == 0.0

    def test_eer(self):
        from mindaudio_tpu.metric import get_eer

        rng = np.random.default_rng(0)
        pos = rng.normal(1.0, 0.3, 500)
        neg = rng.normal(-1.0, 0.3, 500)
        eer, thresh = get_eer(pos, neg)
        assert eer < 0.02

    def test_sisnr(self):
        from mindaudio_tpu.metric import cal_SISNR, cal_SISNRi

        rng = np.random.default_rng(1)
        s = rng.standard_normal(1000)
        assert cal_SISNR(s, s) > 70
        ref = np.stack([s, rng.standard_normal(1000)])
        mix = ref.sum(0)
        imp, snr = cal_SISNRi(ref, ref.copy(), mix)
        assert imp > 30


class TestSchedules:
    def test_asr_warmup(self):
        from mindaudio_tpu.scheduler import asr_warmup_lr

        sched = asr_warmup_lr(0.001, warmup_steps=100)
        peak = float(sched(jnp.asarray(100)))
        early = float(sched(jnp.asarray(10)))
        late = float(sched(jnp.asarray(10000)))
        assert early < peak and late < peak

    def test_cosine(self):
        from mindaudio_tpu.scheduler import cosine_lr

        sched = cosine_lr(1.0, 0.1, 10, 100)
        assert float(sched(jnp.asarray(100))) == pytest.approx(0.1, abs=1e-6)
        assert float(sched(jnp.asarray(10))) == pytest.approx(1.0, abs=1e-2)


class TestGreedyCTCDecoder:
    """Greedy char decoder parity (reference greedydecoder.py:78-134)."""

    def test_decode_collapses_repeats_and_blanks(self):
        import numpy as np

        from mindaudio_tpu.models import MSGreedyDecoder

        labels = ["_", "a", "b", " "]
        dec = MSGreedyDecoder(labels, blank_index=0)
        # path: a a _ b _ _ space b  -> "ab b"
        path = np.array([[1, 1, 0, 2, 0, 0, 3, 2]])
        vocab = len(labels)
        probs = np.eye(vocab)[path]  # one-hot (1, T, V)
        strings, offsets = dec.decode(probs, sizes=np.array([8]))
        assert strings[0][0] == "ab b"
        assert offsets[0][0] == [0, 3, 6, 7]

    def test_size_truncation_and_scores(self):
        import numpy as np

        from mindaudio_tpu.models import GreedyCTCDecoder

        labels = ["_", "a", "b", " "]
        dec = GreedyCTCDecoder(labels)
        path = np.array([[1, 2, 1, 2]])
        probs = np.eye(len(labels))[path]
        strings, _ = dec.decode(probs, sizes=np.array([2]))
        assert strings[0][0] == "ab"
        assert dec.wer("a b", "a c") == 1
        assert dec.cer("ab", "ab") == 0
        assert dec.cer("a b", "ab") == 0  # spaces stripped


class TestLossAliases:
    """Reference loss names must resolve (SURVEY §7.3 contract)."""

    def test_aliases_bound_to_functions(self):
        import mindaudio_tpu.loss as L

        assert L.CTC is L.ctc_loss
        assert L.LabelSmoothingLoss is L.label_smoothing_loss
        assert L.Separation_Loss is L.pit_si_snr_loss
        assert L.Convtasnet_Loss is L.pit_si_snr_loss
        assert L.AdditiveAngularMargin is L.additive_angular_margin
        assert L.FastSpeech2Loss is L.fastspeech2_loss


class TestMetricRegressions:
    def test_eer_threshold_separates_perfectly_split_scores(self):
        from mindaudio_tpu.metric import get_eer

        eer, thr = get_eer([5.0, 6.0, 7.0], [1.0, 2.0, 3.0])
        assert eer == pytest.approx(0.0, abs=1e-9)
        assert 3.0 < thr <= 5.0  # any cut in the gap; not the top score

    def test_wer_rejects_unpaired_lists(self):
        from mindaudio_tpu.metric import wer

        with pytest.raises(ValueError):
            wer([["a"], ["b"]], [["a"]])


class TestDeepSpeech2PaddingInvariance:
    def test_valid_logits_independent_of_padding(self):
        """Backward LSTM must start at each utterance's true end, not at the
        padded tail (review finding: batch composition changed eval logits)."""
        import numpy as np

        from mindaudio_tpu.models import DeepSpeechModel

        m = DeepSpeechModel(vocab_size=29, hidden_size=32, num_rnn_layers=2)
        rng = np.random.default_rng(0)
        spect = jnp.asarray(rng.standard_normal((1, 50, 161)), jnp.float32)
        var = m.init(jax.random.PRNGKey(0), spect, jnp.array([50]))
        logits_a, lens_a = m.apply(var, spect, jnp.array([50]))
        padded = jnp.pad(spect, ((0, 0), (0, 50), (0, 0)))
        logits_b, _ = m.apply(var, padded, jnp.array([50]))
        n = int(lens_a[0])
        np.testing.assert_allclose(np.asarray(logits_a[0, :n]),
                                   np.asarray(logits_b[0, :n]), atol=2e-5)


class TestSeparationTailCoverage:
    def test_tasnet_frames_cover_all_samples(self):
        import numpy as np

        from mindaudio_tpu.models import TasNet

        m = TasNet(frame_len=40)
        hop = 20
        t = 40 + 3 * hop + (hop - 1)  # worst-case tail remainder
        audio = jnp.asarray(np.arange(t, dtype=np.float32))[None]
        frames = m.frame_waveform(audio)
        k = frames.shape[1]
        assert (k - 1) * hop + 40 >= t  # last sample falls inside a frame
        assert float(frames[0, -1].max()) == t - 1  # tail content present

    def test_conv_tasnet_reconstructs_tail(self):
        import numpy as np

        from mindaudio_tpu.models import ConvTasNet

        m = ConvTasNet(enc_dim=16, win_len=40, bottleneck=8, hidden=16,
                       num_blocks=2, num_repeats=1)
        t = 40 + 3 * 20 + 19
        mix = jnp.asarray(np.random.default_rng(0).standard_normal((1, t)),
                          jnp.float32)
        var = m.init(jax.random.PRNGKey(0), mix)
        out = m.apply(var, mix)
        assert out.shape[-1] == t
        # the network sees the tail: output there is not structurally zero
        assert float(jnp.abs(out[..., -19:]).max()) > 0


class TestFastDropout:
    """Integer-threshold dropout on raw PRNG bits (models/layers.py)."""

    def test_keep_fraction_and_unbiased_scale(self):
        import numpy as np

        from mindaudio_tpu.models.layers import FastDropout

        m = FastDropout(0.1)
        x = jnp.ones((64, 1024), jnp.float32)
        y = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
        keep_prob = 1.0 - round(0.1 * 256) / 256  # exact quantized keep prob
        frac = float((y != 0).mean())
        assert abs(frac - keep_prob) < 0.01
        # kept values rescaled by exactly 1/keep_prob -> unbiased expectation
        kept = np.asarray(y)[np.asarray(y) != 0]
        np.testing.assert_allclose(kept, 1.0 / keep_prob, rtol=1e-6)
        assert abs(float(y.mean()) - 1.0) < 0.02

    def test_deterministic_and_zero_rate_identity(self):
        from mindaudio_tpu.models.layers import FastDropout

        x = jnp.arange(12.0).reshape(3, 4)
        assert (FastDropout(0.1).apply({}, x, deterministic=True) == x).all()
        # zero rate needs no rng even in training mode
        assert (FastDropout(0.0).apply({}, x, deterministic=False) == x).all()

    def test_rate_one_drops_everything(self):
        # rate >= 255.5/256 quantizes to thresh 256: must behave like
        # nn.Dropout(1.0) (all-zero output), not overflow uint8 at trace time
        from mindaudio_tpu.models.layers import FastDropout

        x = jnp.ones((4, 8), jnp.float32)
        for rate in (1.0, 0.999):
            y = FastDropout(rate).apply(
                {}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
            assert (y == 0).all(), rate
        assert (FastDropout(1.0).apply({}, x, deterministic=True) == x).all()

    def test_grad_masks_match_forward(self):
        from mindaudio_tpu.models.layers import FastDropout

        m = FastDropout(0.25)
        x = jnp.ones((8, 128), jnp.float32)

        def f(x):
            return m.apply({}, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(3)}).sum()

        g = jax.grad(f)(x)
        y = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
        # gradient is the same mask * scale as the forward
        assert ((g != 0) == (y != 0)).all()


class TestDeepSpeech2Bf16:
    def test_bf16_logits_track_f32(self):
        """bf16 compute (the TPU counterpart of the reference's fp16
        loss-scale mode, deepspeech2.yaml loss_scale:1024) must produce
        logits close to the f32 path on the same params."""
        import numpy as np

        from mindaudio_tpu.models.deepspeech2 import DeepSpeechModel

        rng = np.random.default_rng(0)
        spect = jnp.asarray(rng.standard_normal((2, 64, 161)), jnp.float32)
        lens = jnp.asarray([64, 48], jnp.int32)
        m32 = DeepSpeechModel(vocab_size=9, hidden_size=64, num_rnn_layers=2)
        m16 = DeepSpeechModel(vocab_size=9, hidden_size=64, num_rnn_layers=2,
                              dtype=jnp.bfloat16)
        v = m32.init(jax.random.PRNGKey(0), spect, lens)
        l32, ol32 = m32.apply(v, spect, lens)
        l16, ol16 = m16.apply(v, spect, lens)
        assert l16.dtype == jnp.float32  # head forced back to f32 for CTC
        assert (ol32 == ol16).all()
        # per-frame argmax agreement is the quantity decoding cares about
        agree = float((l32.argmax(-1) == l16.argmax(-1)).mean())
        assert agree > 0.97, agree
        scale = float(jnp.abs(l32).max())
        assert float(jnp.abs(l32 - l16).max()) / scale < 0.12


class TestReferenceNameCompat:
    """Reference-convention names added for migration parity: scheduler
    class aliases, mask beam-bookkeeping helpers, compute_fa_miss, common
    utility ports, module-level decode drivers."""

    def test_scheduler_aliases(self):
        import mindaudio_tpu.scheduler as sch

        assert sch.ASRWarmupLR is sch.asr_warmup_lr
        assert sch.ASRLearningRate is sch.warmup_poly_lr
        assert sch.CosineLearningRate is sch.cosine_lr

    def test_mask_finished_scores_and_preds(self):
        import numpy as np

        from mindaudio_tpu.utils.mask import (mask_finished_preds,
                                              mask_finished_scores)

        score = jnp.ones((2, 3))
        end = jnp.asarray([[True], [False]])
        out = np.asarray(mask_finished_scores(score, end))
        assert out[0, 0] == 0.0 and (out[0, 1:] < -1e8).all()
        assert (out[1] == 1.0).all()
        pred = jnp.full((2, 3), 7, jnp.int32)
        outp = np.asarray(mask_finished_preds(pred, end, eos=9))
        assert (outp[0] == 9).all() and (outp[1] == 7).all()

    def test_compute_fa_miss_matches_eer(self):
        import numpy as np

        from mindaudio_tpu.metric.eer import (compute_fa_miss, get_eer,
                                              get_eer_from_scores)

        rng = np.random.default_rng(0)
        pos = rng.normal(1.0, 1.0, 300)
        neg = rng.normal(-1.0, 1.0, 300)
        scores = np.concatenate([pos, neg])
        labels = np.concatenate([np.ones(300), np.zeros(300)])
        p_fa, p_miss, thr = compute_fa_miss(scores, labels)
        # reference convention: thresholds ascend, so P_fa falls, P_miss rises
        assert (np.diff(p_fa) <= 0).all()
        assert (np.diff(p_miss) >= 0).all()
        assert (np.diff(thr) >= 0).all()
        assert len(thr) == len(p_fa)
        # EER from the curves ~ crossing point ~ get_eer's value
        i = int(np.argmin(np.abs(p_fa - p_miss)))
        eer, _ = get_eer(pos, neg)
        assert abs(0.5 * (p_fa[i] + p_miss[i]) - eer) < 0.02

    def test_common_utility_ports(self):
        import numpy as np

        from mindaudio_tpu.utils.common import (
            get_activation,
            get_feat_extract_output_lengths,
            get_subsample,
            set_weight_decay,
        )

        assert float(get_activation("relu")(jnp.asarray(-1.0))) == 0.0
        assert float(get_activation("tanh")(jnp.asarray(0.0))) == 0.0
        assert get_subsample({"encoder_conf": {"input_layer": "conv2d"}}) == 4
        assert get_feat_extract_output_lengths(100, [41, 21], [2, 2]) == \
            ((100 - 41) // 2 + 1 - 21) // 2 + 1
        params = {"dense": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
                  "layernorm_0": {"scale": np.ones(2)}}
        mask = set_weight_decay(params)
        assert mask["dense"]["kernel"] is True
        assert mask["dense"]["bias"] is False
        assert mask["layernorm_0"]["scale"] is False

    def test_module_level_decode_drivers(self):
        import mindaudio_tpu.utils.recognize as rec

        for name in ("recognize", "ctc_greedy_search",
                     "ctc_prefix_beam_search", "attention_rescoring"):
            assert callable(getattr(rec, name)) and name in rec.__all__
