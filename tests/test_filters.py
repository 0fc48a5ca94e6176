"""Filter layer tests — mirrors reference tests/test_filters.py plus
frequency-response checks for the biquads."""

import numpy as np
import pytest

import mindaudio_tpu.data.filters as filters
import mindaudio_tpu.data.io as io
from mindaudio_tpu.data.augment import convolve1d


@pytest.fixture(scope="module")
def waveform(request):
    data, sr = io.read(request.getfixturevalue("sample_wav"))
    return data, sr


def _tone(freq, sr=16000, n=16000):
    return np.sin(2 * np.pi * freq * np.arange(n) / sr)


def test_notch_filter(waveform):
    data, _ = waveform
    kernel = filters.notch_filter(0.25)
    assert kernel.shape == (1, 101, 1)
    notched = convolve1d(data, kernel)
    assert notched.shape[-1] == data.shape[-1]
    # the notch centers at (0.25 + notch_width) * nyquist = 2.4 kHz; 220 Hz passes
    sr = 16000
    t_notch = convolve1d(_tone(2400, sr), kernel)
    t220 = convolve1d(_tone(220, sr), kernel)
    assert np.std(t_notch[200:-200]) < 0.15 * np.std(t220[200:-200])


def test_low_pass_filter(waveform):
    data, sr = waveform
    out = filters.low_pass_filter(data, sr, 1500)
    assert out.shape == data.shape
    hi = filters.low_pass_filter(_tone(6000), 16000, 1500)
    lo = filters.low_pass_filter(_tone(300), 16000, 1500)
    assert np.std(hi[1000:]) < 0.2 * np.std(lo[1000:])


def test_peaking_equalizer(waveform):
    data, sr = waveform
    out = filters.peaking_equalizer(data, sr, 1500, gain=3.0, q=0.707)
    assert out.shape == data.shape
    # positive gain boosts the center frequency
    boosted = filters.peaking_equalizer(_tone(1500) * 0.1, 16000, 1500, gain=10.0)
    assert np.std(boosted[1000:]) > 1.2 * np.std(_tone(1500)[1000:] * 0.1)


def test_contrast(waveform):
    data, _ = waveform
    out = filters.contrast(data)
    assert out.shape == data.shape
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_riaa_biquad():
    x = _tone(1000, 44100, 44100) * 0.1
    out = filters.riaa_biquad(x, 44100)
    # unity gain at 1 kHz by construction
    assert np.abs(np.std(out[5000:]) / np.std(x[5000:]) - 1.0) < 0.05


def test_treble_biquad():
    x = _tone(8000, 44100, 44100) * 0.1
    boosted = filters.treble_biquad(x, 44100, gain=10.0)
    assert np.std(boosted[5000:]) > 1.5 * np.std(x[5000:])


def test_dcshift():
    x = np.zeros(1000, dtype=np.float32)
    out = filters.dcshift(x, shift=0.5, limiter_gain=0.02)
    np.testing.assert_allclose(out, 0.5, atol=1e-6)
    clipped = filters.dcshift(np.full(10, 0.9, np.float32), shift=0.5, limiter_gain=None)
    assert clipped.max() <= 1.0


def test_filtfilt(waveform):
    data, _ = waveform
    out = filters.filtfilt(data, N=8, Wn=0.02, btype="highpass")
    assert out.shape == data.shape
    # highpass kills DC
    assert abs(out.mean()) < abs(data.mean()) + 1e-3


def test_mel_filterbank():
    fb = filters.mel(16000, 512, n_mels=40)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # every mel filter has positive area; DC bin is empty
    assert (fb.sum(axis=1) > 0).all()
    assert fb[:, 0].sum() == 0


def test_hz_mel_roundtrip():
    freqs = np.array([0.0, 110.0, 440.0, 1000.0, 4000.0, 7600.0])
    for htk in (False, True):
        np.testing.assert_allclose(
            filters.mel_to_hz(filters.hz_to_mel(freqs, htk), htk), freqs, rtol=1e-10
        )
