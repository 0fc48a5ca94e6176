"""Host spectrum layer tests — mirrors reference tests/test_spectrum.py but with
real numeric assertions instead of shape prints."""

import numpy as np
import pytest

import mindaudio_tpu.data.io as io
import mindaudio_tpu.data.spectrum as spectrum


@pytest.fixture(scope="module")
def test_data(request):
    sample_wav = request.getfixturevalue("sample_wav")
    data, sr = io.read(sample_wav)
    return data, sr


class TestSpectrum:
    def test_amplitude_to_dB(self):
        waveforms = np.random.random([1, 400 // 2 + 1, 30])
        out = spectrum.amplitude_to_dB(waveforms)
        assert out.shape == waveforms.shape
        # top_db floor honored
        assert out.min() >= out.max() - 80.0 - 1e-6

    def test_dB_to_amplitude_roundtrip(self):
        x = np.random.random([5, 7]) + 0.1
        db = spectrum.amplitude_to_dB(x, stype="power", top_db=None)
        back = spectrum.dB_to_amplitude(db, 1.0, 1.0)
        np.testing.assert_allclose(back, x, rtol=1e-6)

    def test_stft_shape(self, test_data):
        data, _ = test_data
        matrix = spectrum.stft(data)
        assert matrix.shape[0] == 257
        assert matrix.dtype == np.complex64
        # frames: centered ⇒ 1 + len // hop
        assert matrix.shape[1] == 1 + len(data) // 128

    def test_stft_matches_naive_dft(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(2048).astype(np.float64)
        n_fft, hop = 256, 64
        S = spectrum.stft(x, n_fft=n_fft, hop_length=hop, center=False)
        from scipy.signal import get_window

        w = get_window("hann", n_fft, fftbins=True)
        # third frame starts at 2*hop
        ref = np.fft.rfft(x[2 * hop : 2 * hop + n_fft] * w)
        np.testing.assert_allclose(S[:, 2], ref, rtol=1e-4, atol=1e-5)

    def test_istft_roundtrip(self, test_data):
        data, _ = test_data
        matrix = spectrum.stft(data)
        res = spectrum.istft(matrix)
        assert np.allclose(data[: res.shape[0]], res, atol=1e-5)

    def test_istft_length(self, test_data):
        data, _ = test_data
        matrix = spectrum.stft(data)
        res = spectrum.istft(matrix, length=len(data))
        assert res.shape[0] == len(data)
        np.testing.assert_allclose(res[1000:-1000], data[1000:-1000], atol=1e-5)

    def test_stft_batched(self, test_data):
        data, _ = test_data
        batch = np.stack([data[:16000], data[16000:32000]])
        S = spectrum.stft(batch)
        single = spectrum.stft(data[:16000])
        assert S.shape == (2, 257, single.shape[-1])
        np.testing.assert_allclose(S[0], single, atol=1e-6)

    def test_compute_amplitude(self, test_data):
        data, _ = test_data
        amp_avg = spectrum.compute_amplitude(data, lengths=data.shape[0], amp_type="avg")
        amp_peak = spectrum.compute_amplitude(data, lengths=data.shape[0], amp_type="peak")
        amp_db = spectrum.compute_amplitude(data, lengths=data.shape[0], amp_type="peak", dB=True)
        assert amp_avg.item() <= amp_peak.item()
        np.testing.assert_allclose(amp_db, 20 * np.log10(amp_peak), atol=1e-6)

    def test_spectrogram(self, test_data):
        data, _ = test_data
        spec = spectrum.spectrogram(data)
        assert spec.shape[0] == 201  # 400 // 2 + 1
        assert (spec >= 0).all()
        # Parseval-ish sanity: energy concentrated at the 220/440/880 Hz bins
        peak_bin = spec.sum(axis=1).argmax()
        assert 3 <= peak_bin <= 30

    def test_melspectrogram(self, test_data):
        data, _ = test_data
        mel = spectrum.melspectrogram(data)
        assert mel.shape[0] == 128
        assert (mel >= 0).all()

    def test_magphase_complex(self, test_data):
        data, _ = test_data
        D = spectrum.stft(data)
        magnitude, phase = spectrum.magphase(D, power=2.0, iscomplex=True)
        np.testing.assert_allclose(np.abs(phase), 1.0, atol=1e-3)
        np.testing.assert_allclose(
            np.sqrt(magnitude) * phase, D, atol=2e-2 * np.abs(D).max()
        )

    def test_magphase_real(self, test_data):
        data, _ = test_data
        D = spectrum.stft(data, return_complex=False)
        mag, phase = spectrum.magphase(D, power=1.0, iscomplex=False)
        np.testing.assert_allclose(mag, np.abs(spectrum.stft(data)), atol=1e-3)
        assert phase.shape == mag.shape

    def test_melscale(self, test_data):
        data, _ = test_data
        spec = spectrum.spectrogram(data, n_fft=1024)
        melspec = spectrum.melscale(spec, n_stft=1024 // 2 + 1)
        assert melspec.shape[0] == 128
        assert melspec.shape[1] == spec.shape[1]

    def test_resynthesize(self, test_data):
        data, _ = test_data
        x = data[:16000][None, :]
        D = spectrum.stft(x, return_complex=False)
        mag, _ = spectrum.magphase(D, power=1.0, iscomplex=False)
        wav = spectrum.resynthesize(mag, x, normalize_wavs=False)
        # unmodified magnitude + original phase ≈ identity (up to edges)
        ref = x[0, 256 : wav.shape[-1] - 256]
        got = wav[0, 256 : wav.shape[-1] - 256]
        assert np.corrcoef(ref, got)[0, 1] > 0.99

    def test_frame(self):
        x = np.arange(100.0)
        f = spectrum.frame(x, frame_length=10, hop_length=5)
        assert f.shape == (10, 19)
        np.testing.assert_allclose(f[:, 1], np.arange(5.0, 15.0))


class TestShortSignalCenteredStft:
    def test_short_clip_with_center_padding_succeeds(self):
        import numpy as np

        from mindaudio_tpu.data.spectrum import stft

        x = np.random.default_rng(0).standard_normal(300).astype(np.float32)
        S = stft(x, n_fft=512)  # center=True pads to a full frame
        assert S.shape[0] == 257 and np.isfinite(S).all()

    def test_uncentered_short_clip_still_rejected(self):
        import numpy as np

        from mindaudio_tpu.data.spectrum import stft

        x = np.zeros(300, np.float32)
        with pytest.raises(ValueError, match="too large"):
            stft(x, n_fft=512, center=False)
