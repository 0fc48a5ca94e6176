"""Feature layer tests — mirrors reference tests/test_features.py with numeric checks."""

import numpy as np
import pytest

import mindaudio_tpu.data.features as features
import mindaudio_tpu.data.io as io
import mindaudio_tpu.data.spectrum as spectrum


@pytest.fixture(scope="module")
def test_data(request):
    data, sr = io.read(request.getfixturevalue("sample_wav"))
    return data, sr


class TestFeatures:
    def test_spectral_centroid(self, test_data):
        data, sr = test_data
        centroid = features.spectral_centroid(data, sr)
        assert centroid.ndim == 1
        # dominated by 220-880 Hz harmonics → centroid well below Nyquist
        assert 100 < np.nanmedian(centroid) < 4000

    def test_context_window_shapes(self):
        arrs = [
            np.random.randn(10, 101, 60).astype(np.float32),
            np.random.randn(10, 3, 101, 60).astype(np.float32),
        ]
        for left, right in [(3, 5), (4, 4), (5, 3), (0, 0)]:
            ctx = left + right + 1
            for arr in arrs:
                out = features.context_window(arr, left, right)
                assert out.shape[:-2] == arr.shape[:-2]
                assert out.shape[-2] == arr.shape[-2] * ctx
                assert out.shape[-1] == arr.shape[-1]

    def test_context_window_values(self):
        x = np.arange(12, dtype=np.float32).reshape(1, 12)  # 1 freq, 12 frames
        out = features.context_window(x, left_frames=1, right_frames=1)
        # row 0 = x shifted right (past), row 1 = x, row 2 = x shifted left
        np.testing.assert_allclose(out[1], x[0])
        np.testing.assert_allclose(out[0][1:], x[0][:-1])
        assert out[0][0] == 0
        np.testing.assert_allclose(out[2][:-1], x[0][1:])
        assert out[2][-1] == 0

    def test_compute_deltas(self):
        spec = np.random.random([1, 201, 1000])
        deltas = features.compute_deltas(spec)
        assert deltas.shape == spec.shape
        # delta of a linear ramp is constant
        ramp = np.arange(100, dtype=np.float64).reshape(1, 1, 100)
        d = features.compute_deltas(ramp)
        np.testing.assert_allclose(d[0, 0, 5:-5], 1.0, atol=1e-5)

    def test_fbank(self):
        inputs = np.random.random([10, 16000])
        feats = features.fbank(inputs)
        assert feats.shape == (10, 40, 81)

    def test_fbank_deltas_context(self):
        inputs = np.random.random([2, 8000])
        feats = features.fbank(inputs, deltas=True, context=True)
        assert feats.shape[1] == 40 * 3 * 11

    def test_mfcc(self):
        inputs = np.random.random([10, 16000])
        feats = features.mfcc(inputs)
        assert feats.shape == (10, 20 * 3 * 11, 81)

    def test_complex_norm_and_angle(self, test_data):
        data, _ = test_data
        arr = spectrum.stft(data, return_complex=False)
        norm = features.complex_norm(arr)
        ang = features.angle(arr)
        ref = spectrum.stft(data)
        np.testing.assert_allclose(norm, np.abs(ref), atol=1e-3)
        np.testing.assert_allclose(ang, np.angle(ref), atol=1e-3)

    def test_harmonic(self, test_data):
        data, _ = test_data
        x = data[:32000]
        harm = features.harmonic(x)
        assert harm.shape == x.shape
        # harmonic part of a harmonic signal keeps most of the energy
        assert np.sum(harm**2) > 0.4 * np.sum(x**2)
