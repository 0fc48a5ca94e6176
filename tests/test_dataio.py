"""WAV I/O tests — mirrors reference tests/test_dataio.py (scipy round-trips)."""

import os

import numpy as np
import scipy.io
from scipy.io import wavfile

from mindaudio_tpu.data.io import read, write


def _scipy_wav(name):
    data_dir = os.path.join(os.path.dirname(scipy.io.__file__), "tests", "data")
    return os.path.join(data_dir, name)


def test_read_2channel():
    audio, sr = read(_scipy_wav("test-44100Hz-2ch-32bit-float-be.wav"))
    assert audio.shape[1] == 2
    assert audio.shape[0] / sr == 0.01


def test_read_write(tmp_path):
    fname = _scipy_wav("test-44100Hz-2ch-32bit-float-be.wav")
    samplerate, data = wavfile.read(fname)
    y, sr = read(fname)
    assert isinstance(y, np.ndarray)
    assert sr == samplerate
    assert np.allclose(data, y)

    out = str(tmp_path / "test_wav")
    write(out, y, sr)
    y2, sr2 = read(out)
    assert np.allclose(y2, y)
    assert sr2 == sr


def test_int16_normalized(tmp_path):
    x = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
    out = str(tmp_path / "i16.wav")
    write(out, x, 8000)
    y, sr = read(out)
    assert sr == 8000
    assert np.issubdtype(y.dtype, np.floating)
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-7)
    assert np.abs(y).max() <= 1.0


def test_offset_duration(tmp_path):
    x = np.arange(16000, dtype=np.float32) / 16000
    out = str(tmp_path / "f32.wav")
    write(out, x, 16000)
    y, sr = read(out, offset=0.5, duration=0.25)
    assert y.shape[0] == 4000
    np.testing.assert_allclose(y, x[8000:12000])
