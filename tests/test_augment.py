"""Augmentation layer tests — mirrors reference tests/test_augment.py with
deterministic RNG and numeric checks."""

import numpy as np
import pytest

import mindaudio_tpu.data.augment as augment
import mindaudio_tpu.data.io as io
import mindaudio_tpu.data.spectrum as spectrum


@pytest.fixture(scope="module")
def test_data(request):
    data, sr = io.read(request.getfixturevalue("sample_wav"))
    return data, sr


class TestAugment:
    def test_frequencymasking(self, test_data):
        data, _ = test_data
        original = spectrum.spectrogram(data)
        rng = np.random.default_rng(0)
        masked = augment.frequencymasking(original, frequency_mask_param=80, rng=rng)
        assert masked.shape == original.shape
        zero_rows = (masked == 0).all(axis=-1).sum()
        assert zero_rows >= 1  # a band was masked

    def test_timemasking(self, test_data):
        data, _ = test_data
        original = spectrum.spectrogram(data)
        rng = np.random.default_rng(0)
        masked = augment.timemasking(original, frequency_mask_param=80, rng=rng)
        assert masked.shape == original.shape
        zero_cols = (masked == 0).all(axis=-2).sum()
        assert zero_cols >= 1

    def test_reverberate(self, test_data, rir_wav):
        data, _ = test_data
        samples = data[:32000]
        rirs, _ = io.read(rir_wav)
        reverbed = augment.reverberate(samples, rirs)
        assert reverbed.shape == samples.shape
        # amplitude preserved by rescale
        np.testing.assert_allclose(
            spectrum.compute_amplitude(reverbed), spectrum.compute_amplitude(samples), rtol=1e-3
        )

    def test_add_noise_1d_2d_3d(self, test_data, sample_wav):
        data, _ = test_data
        rng = np.random.default_rng(0)
        noisy1 = augment.add_noise(data, [sample_wav], 3, 30, 1.0, rng=rng)
        assert noisy1.shape == data.shape
        batch = np.stack([data[:16000], data[16000:32000]])
        noisy2 = augment.add_noise(batch, [sample_wav], 3, 30, 1.0, rng=rng)
        assert noisy2.shape == batch.shape
        x3 = rng.random((4, 1, 8000)) - 0.5
        noisy3 = augment.add_noise(x3, [sample_wav], 3, 30, 1.0, rng=rng)
        assert noisy3.shape == x3.shape

    def test_add_reverb(self, test_data, rir_wav):
        data, _ = test_data
        rng = np.random.default_rng(0)
        out1 = augment.add_reverb(data, [rir_wav], 1.0, rng=rng)
        assert out1.shape == data.shape
        batch = np.stack([data[:16000], data[16000:32000]])
        out2 = augment.add_reverb(batch, [rir_wav], 1.0, rng=rng)
        assert out2.shape == batch.shape
        x3 = rng.random((4, 1, 8000)) - 0.5
        out3 = augment.add_reverb(x3, [rir_wav], 1.0, rng=rng)
        assert out3.shape == x3.shape

    def test_add_babble(self, test_data):
        data, _ = test_data
        waveforms = np.stack([data[:16000], data[16000:32000], data[32000:48000]])
        lengths = np.array([1.0, 1.0, 1.0])
        rng = np.random.default_rng(0)
        out = augment.add_babble(waveforms, lengths, speaker_count=2, snr_low=0, snr_high=0, rng=rng)
        assert out.shape == waveforms.shape
        assert not np.allclose(out, waveforms)

    def test_drop_freq(self, test_data):
        data, _ = test_data
        rng = np.random.default_rng(0)
        out = augment.drop_freq(data, rng=rng)
        assert out.shape == data.shape

    def test_speed_perturb(self, test_data):
        data, _ = test_data
        rng = np.random.default_rng(0)
        out = augment.speed_perturb(data, orig_freq=16000, speeds=[90], rng=rng)
        assert abs(out.shape[-1] - np.ceil(data.shape[-1] * 90 / 100 / 16000 * 16000 / (90 * 160) * 160 * 100 / 100)) >= 0
        # 90% speed → ~ 10/9 times longer? (resample to 14400 Hz keeps samples/sec ratio)
        expected = int(np.ceil(data.shape[-1] * (16000 * 90 // 100) / 16000))
        assert out.shape[-1] == expected

    def test_drop_chunk(self, test_data):
        data, _ = test_data
        waveforms = np.stack([data[:16000], data[16000:32000], data[32000:48000]])
        lengths = np.array([1.0, 1.0, 1.0])
        rng = np.random.default_rng(0)
        out = augment.drop_chunk(
            waveforms, lengths, drop_start=100, drop_end=200, noise_factor=0.0, rng=rng
        )
        assert out.shape == waveforms.shape
        # samples outside [100, 200) untouched
        np.testing.assert_array_equal(out[:, 300:], waveforms[:, 300:])

    def test_time_stretch(self, test_data):
        data, _ = test_data
        x = data[:32000]
        y_fast = augment.time_stretch(x, rate=2.0)
        assert abs(y_fast.shape[-1] - x.shape[-1] // 2) <= 2

    def test_pitch_shift(self, test_data):
        data, _ = test_data
        x = data[:32000]
        shifted = augment.pitch_shift(x, sr=16000, n_steps=4)
        # reference semantics (augment.py:901): output length == stretched length
        rate = 2.0 ** (-4 / 12)
        assert shifted.shape[-1] == pytest.approx(x.shape[-1] / rate, abs=3)
        # 4 semitones up: 220 Hz fundamental moves to ~277 Hz
        spec_orig = np.abs(spectrum.stft(x, n_fft=4096)).sum(axis=-1)
        spec_shift = np.abs(spectrum.stft(shifted.astype(np.float32), n_fft=4096)).sum(axis=-1)
        f_orig = spec_orig[20:200].argmax() + 20
        f_shift = spec_shift[20:200].argmax() + 20
        ratio = f_shift / f_orig
        assert 1.15 < ratio < 1.40  # 2^(4/12) ≈ 1.26


class TestAugmentReviewRegressions:
    def test_phase_vocoder_matches_recurrence(self):
        """The vectorized vocoder must equal the Ellis per-frame recurrence
        (f64 accumulator) it replaces: interpolated magnitudes bitwise, the
        unwrapped-phase output to fp tolerance."""
        rng = np.random.default_rng(0)
        for shape, rate in [((33, 40), 0.75), ((2, 33, 37), 1.6)]:
            m = (rng.standard_normal(shape)
                 + 1j * rng.standard_normal(shape)).astype(np.complex64)
            got = augment._phase_vocoder(m, rate)

            n_fft = 2 * (m.shape[-2] - 1)
            hop = n_fft // 4
            steps = np.arange(0, m.shape[-1], rate, dtype=np.float64)
            phi = np.linspace(0, np.pi * hop, m.shape[-2])
            acc = np.angle(m[..., 0]).astype(np.float64)
            padded = np.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, 2)])
            want = np.zeros(m.shape[:-1] + (len(steps),), np.complex64)
            for t, s in enumerate(steps):
                cols = padded[..., int(s): int(s) + 2]
                a = s % 1.0
                mag = (1 - a) * np.abs(cols[..., 0]) + a * np.abs(cols[..., 1])
                want[..., t] = mag * (np.cos(acc) + 1j * np.sin(acc))
                d = np.angle(cols[..., 1]) - np.angle(cols[..., 0]) - phi
                d -= 2 * np.pi * np.round(d / (2 * np.pi))
                acc = acc + (phi + d)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.abs(got), np.abs(want),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


    def test_drop_freq_is_same_convolution(self):
        import numpy as np

        from mindaudio_tpu.data.augment import drop_freq

        x = np.zeros((1, 2000), np.float32)
        x[0, 1000] = 1.0
        y = drop_freq(x, rng=np.random.default_rng(0))
        assert y.shape == x.shape
        assert abs(int(np.abs(y[0]).argmax()) - 1000) <= 1  # no group delay

    def test_convolve1d_int_padding_same_length(self):
        import numpy as np

        from mindaudio_tpu.data.augment import convolve1d

        k = np.zeros(101, np.float32)
        k[50] = 1.0
        sig = np.random.default_rng(0).standard_normal(500).astype(np.float32)
        out_fft = convolve1d(sig, k, padding=50, use_fft=True)
        out_direct = convolve1d(sig, k, padding=50, use_fft=False)
        assert out_fft.shape == out_direct.shape == (500,)
        np.testing.assert_allclose(out_fft, sig, atol=1e-6)  # identity kernel

    def test_convolve1d_integer_waveform_keeps_float_kernel(self):
        # int16-as-stored audio through the FFT path: the |coef| < 1 filter
        # must NOT be cast to the integer waveform dtype (that truncates the
        # whole kernel to zero)
        import numpy as np

        from mindaudio_tpu.data.augment import convolve1d

        sig_f = np.random.default_rng(0).standard_normal(400).astype(np.float32)
        sig_i = (sig_f * 8192).astype(np.int16)
        k = np.full(9, 1.0 / 9.0, np.float32)  # moving average, coefs < 1
        out_i = convolve1d(sig_i, k, use_fft=True)
        out_f = convolve1d(sig_i.astype(np.float32), k, use_fft=True)
        assert np.abs(out_i).max() > 0
        np.testing.assert_allclose(out_i, out_f, rtol=1e-4, atol=1e-2)

    def test_add_noise_rejects_empty_background(self, tmp_path):
        import numpy as np

        from mindaudio_tpu.data import io
        from mindaudio_tpu.data.augment import add_noise

        empty = tmp_path / "empty.wav"
        io.write(str(empty), np.zeros(0, np.float32), 16000)
        sig = np.random.default_rng(0).standard_normal((1, 1600)).astype(np.float32)
        with pytest.raises(ValueError, match="0 samples"):
            add_noise(sig, [str(empty)], 10, 10)
