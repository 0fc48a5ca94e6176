"""Native wav batch loader vs the NumPy io path (bit parity + error flags)."""

import numpy as np
import pytest

from mindaudio_tpu.data import io


@pytest.fixture(scope="module")
def native():
    from mindaudio_tpu import _native

    if not _native.available():
        pytest.skip("g++ build unavailable")
    return _native


class TestNativeWavLoader:
    def test_parity_int16(self, native, tmp_path):
        rng = np.random.default_rng(0)
        paths = []
        refs = []
        for i in range(6):
            x = (rng.standard_normal(4000 + 321 * i) * 0.3).astype(np.float32)
            p = str(tmp_path / f"a{i}.wav")
            io.write(p, (x * 32767).astype(np.int16), 16000)
            paths.append(p)
            refs.append(io.read(p)[0])

        batch, lens, rates = native.wav_read_batch(paths, max_len=8000)
        assert batch.shape == (6, 8000)
        for i, ref in enumerate(refs):
            assert rates[i] == 16000
            assert lens[i] == len(ref)
            np.testing.assert_allclose(batch[i, : lens[i]], ref, atol=1e-6)
            assert (batch[i, lens[i]:] == 0).all()

    def test_parity_float32_and_24bit_clamp(self, native, tmp_path):
        x = (np.sin(np.arange(5000) / 30.0) * 0.5).astype(np.float32)
        p = str(tmp_path / "f32.wav")
        io.write(p, x, 22050)
        batch, lens, rates = native.wav_read_batch([p], max_len=3000)
        assert rates[0] == 22050 and lens[0] == 3000  # clamped to max_len
        np.testing.assert_allclose(batch[0], x[:3000], atol=1e-7)

    def test_bad_file_flagged(self, native, tmp_path):
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"not a wav file at all")
        good = tmp_path / "good.wav"
        io.write(str(good), np.zeros(100, np.float32), 8000)
        batch, lens, rates = native.wav_read_batch([str(bad), str(good)], 200)
        assert rates[0] == 0 and rates[1] == 8000
        assert lens[1] == 100

    def test_crafted_chunk_size_does_not_hang(self, native, tmp_path):
        # a chunk whose declared size is near UINT32_MAX used to wrap the
        # 32-bit chunk-walk advance to 0 and spin the decode loop forever
        import struct

        evil = tmp_path / "evil.wav"
        body = b"JUNK" + struct.pack("<I", 0xFFFFFFF8) + b"\x00" * 32
        evil.write_bytes(b"RIFF" + struct.pack("<I", 36 + len(body)) +
                         b"WAVE" + body)
        batch, lens, rates = native.wav_read_batch([str(evil)], 100)
        assert rates[0] == 0  # flagged as error, batch not deadlocked

    def test_undersized_fmt_chunk_rejected(self, native, tmp_path):
        # fmt chunk declaring size 4 must not read channels/rate/bits from
        # the following chunk's bytes
        import struct

        p = tmp_path / "shortfmt.wav"
        fmt = b"fmt " + struct.pack("<I", 4) + struct.pack("<HH", 1, 1)
        data = b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        blob = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(data)) + b"WAVE" + fmt + data
        p.write_bytes(blob)
        batch, lens, rates = native.wav_read_batch([str(p)], 100)
        assert rates[0] == 0


class TestNativeCtcBeam:
    def test_matches_python_dp(self):
        """Native C++ prefix beam == the Python reference DP, prefixes and
        scores, across valid lengths (including a 1-frame edge)."""
        from mindaudio_tpu import _native
        from mindaudio_tpu.utils.recognize import ctc_prefix_beam_dp

        if not _native.beam_available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(0)
        B, T, V, K, BEAM = 4, 40, 24, 8, 8
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        idx = np.argsort(-logp, -1)[..., :K].astype(np.int32)
        top = np.take_along_axis(logp, idx, -1).astype(np.float32)
        valid = np.asarray([40, 25, 13, 1], np.int32)

        native = _native.ctc_prefix_beam_batch(top, idx, valid, BEAM)
        for b in range(B):
            ref = ctc_prefix_beam_dp(top[b], idx[b], int(valid[b]), BEAM)
            assert [p for p, _ in native[b]] == [p for p, _ in ref]
            np.testing.assert_allclose(
                [s for _, s in native[b]], [s for _, s in ref],
                rtol=1e-5, atol=1e-5)
