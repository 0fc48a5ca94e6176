"""Processing layer tests — mirrors reference tests/test_processing.py."""

import numpy as np

import mindaudio_tpu.data.processing as processing
import mindaudio_tpu.data.spectrum as spectrum


def test_normalize():
    waveforms = np.vander(np.arange(-2.0, 2.0))
    out = processing.normalize(waveforms, axis=1)
    assert np.abs(out).max() <= 1.0 + 1e-9
    out2 = processing.normalize(waveforms, norm="l2", axis=1)
    np.testing.assert_allclose(np.linalg.norm(out2, axis=1), 1.0, atol=1e-9)


def test_unitarize():
    x = np.random.randn(2, 1000) * 0.3
    out = processing.unitarize(x)
    amp = spectrum.compute_amplitude(out)
    np.testing.assert_allclose(amp, 1.0, atol=1e-3)


def test_resample():
    waveform = np.random.random([1, 441000])
    y_16k = processing.resample(waveform, orig_freq=44100, new_freq=16000)
    assert y_16k.shape == (1, 160000)


def test_resample_kaiser_tone():
    sr, new_sr = 16000, 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t)
    y = processing.resample(x[None], sr, new_sr, res_type="kaiser")
    assert y.shape[-1] == new_sr
    t2 = np.arange(new_sr) / new_sr
    ref = np.sin(2 * np.pi * 440 * t2)
    assert np.corrcoef(y[0][100:-100], ref[100:-100])[0, 1] > 0.999


def test_rescale():
    x = np.random.randn(3000)
    out = processing.rescale(x, target_lvl=2, amp_type="avg")
    np.testing.assert_allclose(spectrum.compute_amplitude(out), 2.0, atol=1e-3)


def test_stereo_to_mono():
    y = processing.stereo_to_mono(np.array([[1, 2], [0.5, 0.1]]))
    np.testing.assert_allclose(y, [1.5, 0.3])


def test_trim():
    waveforms = np.array([0.01] * 1000 + [0.6] * 1000 + [-0.6] * 1000)
    wav_trimmed, index = processing.trim(waveforms, top_db=10)
    assert index[0] <= 1024
    assert index[1] >= 2048
    assert wav_trimmed.shape[0] == min(index[1], len(waveforms)) - index[0]


def test_split():
    waveforms = np.array([0.01] * 2048 + [0.6] * 2048 + [-0.01] * 2048 + [0.5] * 2048)
    indices = processing.split(waveforms, top_db=10)
    assert indices.shape == (2, 2)
    assert indices[0][0] < 2048 + 1024
    assert indices[1][1] == 8192


def test_sliding_window_cmn():
    x = np.random.random([1, 20, 10]).astype(np.float32)
    out = processing.sliding_window_cmn(x, 500, 200)
    assert out.shape == x.shape
    # window spans everything ⇒ equals global mean subtraction
    np.testing.assert_allclose(out, x - x.mean(axis=1, keepdims=True), atol=1e-5)


def test_invert_channels():
    w = np.array([[1, 2, 3], [2, 3, 4]])
    out = processing.invert_channels(w.copy())
    np.testing.assert_array_equal(out, [[3, 2, 1], [4, 3, 2]])
    mono = processing.invert_channels(np.array([1, 2, 3]))
    np.testing.assert_array_equal(mono, [1, 2, 3])


def test_loop():
    out = processing.loop(np.array([1, 2, 3]), 3)
    np.testing.assert_array_equal(out, [1, 2, 3, 1, 2, 3, 1, 2, 3])
    out2 = processing.loop(np.array([[1, 2, 3], [2, 3, 4]]), 2)
    assert out2.shape == (4, 3)


def test_clip():
    w = np.arange(1, 11)
    out = processing.clip(w, 0.1, 0.3)
    np.testing.assert_array_equal(out, [2, 3, 4])


def test_insert_in_background():
    w = np.arange(1, 11)
    bg = np.array([0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0])
    out = processing.insert_in_background(w, 0.2, bg)
    np.testing.assert_array_equal(out, np.hstack([bg[:2], w, bg[:2]]))
    # stereo signal + mono background
    w2 = np.stack([np.arange(1, 11), np.arange(2, 12)]).T
    out2 = processing.insert_in_background(w2, 0.2, bg)
    assert out2.shape == (14, 2)


def test_overlap_add():
    sig = np.random.randn(3, 3, 40).astype(np.float32)
    out = processing.overlap_and_add(sig, 40)
    assert out.shape == (3, 120)
    np.testing.assert_allclose(out, sig.reshape(3, 120), atol=1e-6)
    # half overlap
    ones = np.ones((2, 4, 8), dtype=np.float32)
    ov = processing.overlap_and_add(ones, 4)
    assert ov.shape == (2, 3 * 4 + 8)
    np.testing.assert_allclose(ov[0, 4:12], 2.0)


class TestDataReviewRegressions:
    def test_unitarize_preserves_1d_shape(self):
        import numpy as np

        from mindaudio_tpu.data.processing import unitarize

        x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
        out = unitarize(x)
        assert out.shape == (1000,)

    def test_rescale_max_aliases_peak(self):
        import numpy as np

        from mindaudio_tpu.data.processing import rescale

        x = np.random.default_rng(0).standard_normal(512).astype(np.float32)
        out = rescale(x, 0.5, amp_type="max")
        assert abs(float(np.max(np.abs(out))) - 0.5) < 1e-5

    def test_trim_all_silent_returns_empty(self):
        import numpy as np

        from mindaudio_tpu.data.processing import trim

        quiet = (np.random.default_rng(0).standard_normal(8192) * 1e-6).astype(np.float32)
        trimmed, idx = trim(quiet, reference=1.0)
        assert trimmed.size == 0 and idx.tolist() == [0, 0]

    def test_sliding_window_cmn_matches_loop_oracle(self):
        import numpy as np

        from mindaudio_tpu.data.processing import sliding_window_cmn

        rng = np.random.default_rng(1)
        x = rng.standard_normal((700, 13)).astype(np.float32)
        out = sliding_window_cmn(x, cmn_window=100, center=True, norm_vars=True)
        # oracle at one probe frame: window [t-50, t+50)
        t = 300
        win = x[250:350].astype(np.float64)
        mean, var = win.mean(0), (win.astype(np.float64) ** 2).mean(0) - win.mean(0) ** 2
        expect = (x[t] - mean) / np.sqrt(np.maximum(var, 1e-10))
        np.testing.assert_allclose(out[t], expect, atol=1e-5)
