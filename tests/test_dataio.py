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


def test_24bit_roundtrip(tmp_path):
    # documented range: -2147483648 .. +2147483392, low byte zero
    # (reference io.py:585-587)
    rng = np.random.default_rng(0)
    x = (rng.integers(-(2**23), 2**23, size=500) << 8).astype(np.int32)
    out = str(tmp_path / "i24.wav")
    write(out, x, 16000, bits=24)
    # cross-check with scipy's independent 24-bit reader
    sr_s, y_scipy = wavfile.read(out)
    assert sr_s == 16000
    np.testing.assert_array_equal(y_scipy, x)
    y, sr = read(out)
    np.testing.assert_allclose(y, x / 2147483648.0, atol=1e-9)


def test_24bit_stereo_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.integers(-(2**23), 2**23, size=(300, 2)) << 8).astype(np.int32)
    out = str(tmp_path / "i24st.wav")
    write(out, x, 44100, bits=24)
    y, sr = read(out)
    assert y.shape == (300, 2) and sr == 44100
    np.testing.assert_allclose(y, x / 2147483648.0, atol=1e-9)


def test_rifx_write_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
    out = str(tmp_path / "rifx.wav")
    write(out, x, 8000, big_endian=True)
    with open(out, "rb") as f:
        assert f.read(4) == b"RIFX"
    y, sr = read(out)
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-7)
    # scipy also understands RIFX — cross-check
    sr_s, y_scipy = wavfile.read(out)
    np.testing.assert_array_equal(y_scipy, x)


def test_rifx_float_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 20, 777)).astype(np.float32)
    out = str(tmp_path / "rifxf.wav")
    write(out, x, 22050, big_endian=True)
    y, sr = read(out)
    assert y.dtype == np.float32 and sr == 22050
    np.testing.assert_array_equal(y, x)


def test_seek_partial_read_matches_slice(tmp_path):
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((32000, 2)) * 10000).astype(np.int16)
    out = str(tmp_path / "long.wav")
    write(out, x, 16000)
    full, _ = read(out)
    part, _ = read(out, offset=0.75, duration=0.5)
    assert part.shape == (8000, 2)
    np.testing.assert_array_equal(part, full[12000:20000])
    # offset past EOF yields empty
    empty, _ = read(out, offset=10.0)
    assert empty.shape[0] == 0


def test_uint8_and_int64(tmp_path):
    x8 = np.arange(256, dtype=np.uint8)
    p8 = str(tmp_path / "u8.wav")
    write(p8, x8, 8000)
    y8, _ = read(p8)
    np.testing.assert_array_equal(y8, x8)

    x64 = (np.arange(100) * (2**40)).astype(np.int64)
    p64 = str(tmp_path / "i64.wav")
    write(p64, x64, 8000)
    y64, _ = read(p64)
    assert y64.dtype == np.int64
    np.testing.assert_array_equal(y64, x64)


def test_scipy_cross_read(tmp_path):
    # files written by scipy must read identically through our parser
    rng = np.random.default_rng(3)
    for dt, scale in ((np.int16, 30000), (np.int32, 2**30), (np.float32, 1.0)):
        x = (rng.standard_normal(1234) * scale).astype(dt)
        p = str(tmp_path / f"sc_{np.dtype(dt).name}.wav")
        wavfile.write(p, 16000, x)
        y, sr = read(p)
        assert sr == 16000
        if dt == np.int16:
            np.testing.assert_allclose(y, x / 32768.0, atol=1e-9)
        elif dt == np.int32:
            np.testing.assert_allclose(y, x / 2147483648.0, atol=1e-12)
        else:
            np.testing.assert_array_equal(y, x)
