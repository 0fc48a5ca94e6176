"""Golden-value tests on real audio (reference CI fixtures).

The committed ``tests/goldens/dsp_goldens.npz`` (regenerate with
``python tests/make_goldens.py``) holds DSP outputs recorded from real
AISHELL / LibriSpeech speech and an Aachen room impulse response — the same
fixtures the reference's CI uses (reference tests/test_spectrum.py:12-17).
Both the host NumPy layer and the device ops (HIGHEST matmul precision) are
asserted against the recorded values: host drift, device drift, and
host-vs-device divergence all fail here.
"""

import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_PATH = os.path.join(HERE, "goldens", "dsp_goldens.npz")

CLIPS = ("libri", "aishell", "rir")


@pytest.fixture(scope="module")
def g():
    assert os.path.exists(GOLDEN_PATH), (
        "goldens missing — run: python tests/make_goldens.py")
    return np.load(GOLDEN_PATH)


class TestHostGolden:
    """The NumPy parity layer must reproduce the recorded values (tight)."""

    @pytest.mark.parametrize("clip", CLIPS)
    def test_stft_mag(self, g, clip):
        from mindaudio_tpu.data import spectrum

        x = g[f"{clip}/wav"]
        S = spectrum.stft(x, n_fft=512, hop_length=160)
        np.testing.assert_allclose(
            np.abs(S), g[f"{clip}/stft_mag"], rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("clip", CLIPS)
    def test_istft_roundtrip(self, g, clip):
        from mindaudio_tpu.data import spectrum

        x = g[f"{clip}/wav"]
        S = spectrum.stft(x, n_fft=512, hop_length=160)
        y = spectrum.istft(S, n_fft=512, hop_length=160, length=len(x))
        err = np.max(np.abs(y - x))
        # recorded round-trip error is ~1e-7; a regression to 1e-5 is real
        assert err <= max(5.0 * float(g[f"{clip}/istft_err"]), 1e-6), err

    @pytest.mark.parametrize("clip", CLIPS)
    def test_fbank(self, g, clip):
        from mindaudio_tpu.data import features

        x, sr = g[f"{clip}/wav"], int(g[f"{clip}/sr"])
        fb = features.fbank(x[None].astype(np.float32), n_mels=40,
                            n_fft=400, sample_rate=sr)[0]
        np.testing.assert_allclose(fb, g[f"{clip}/fbank"],
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("clip", CLIPS)
    def test_mfcc(self, g, clip):
        from mindaudio_tpu.data import features

        x, sr = g[f"{clip}/wav"], int(g[f"{clip}/sr"])
        mf = features.mfcc(x[None].astype(np.float32), deltas=False,
                           context=False, n_mels=23, n_mfcc=20,
                           sample_rate=sr)[0]
        np.testing.assert_allclose(mf, g[f"{clip}/mfcc"],
                                   rtol=1e-4, atol=1e-3)

    @pytest.mark.parametrize("clip", CLIPS)
    def test_resample(self, g, clip):
        from mindaudio_tpu.data import processing

        x, sr = g[f"{clip}/wav"], int(g[f"{clip}/sr"])
        y = processing.resample(x, orig_freq=sr, new_freq=8000)
        np.testing.assert_allclose(y, g[f"{clip}/resample_8k"],
                                   rtol=1e-5, atol=1e-6)

    def test_sliding_window_cmn(self, g):
        from mindaudio_tpu.data import processing

        fb = g["libri/fbank"].T
        cmn = processing.sliding_window_cmn(
            fb[None], cmn_window=100, min_cmn_window=50)[0]
        np.testing.assert_allclose(cmn, g["libri/cmn"], rtol=1e-5, atol=1e-5)


class TestDeviceGolden:
    """Device ops at HIGHEST precision must match the recorded host values."""

    @pytest.mark.parametrize("clip", CLIPS)
    def test_stft_mag(self, g, clip):
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        x = g[f"{clip}/wav"]
        ri = np.asarray(dsp.stft(jnp.asarray(x), n_fft=512, hop_length=160,
                                 precision="highest"))
        mag = np.hypot(ri[..., 0], ri[..., 1])
        np.testing.assert_allclose(mag, g[f"{clip}/stft_mag"],
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("clip", CLIPS)
    def test_fbank(self, g, clip):
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        x, sr = g[f"{clip}/wav"], int(g[f"{clip}/sr"])
        fb = np.asarray(dsp.fbank(jnp.asarray(x[None]), n_mels=40, n_fft=400,
                                  sample_rate=sr, precision="highest")[0])
        np.testing.assert_allclose(fb, g[f"{clip}/fbank"],
                                   rtol=1e-4, atol=2e-3)

    @pytest.mark.parametrize("clip", CLIPS)
    def test_mfcc(self, g, clip):
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        x, sr = g[f"{clip}/wav"], int(g[f"{clip}/sr"])
        mf = np.asarray(dsp.mfcc(jnp.asarray(x[None]), deltas=False,
                                 context=False, n_mels=23, n_mfcc=20,
                                 sample_rate=sr, precision="highest")[0])
        np.testing.assert_allclose(mf, g[f"{clip}/mfcc"],
                                   rtol=1e-3, atol=1e-2)

    def test_kaldi_fbank(self, g):
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        x, sr = g["aishell/wav"], int(g["aishell/sr"])
        kf = np.asarray(dsp.kaldi_fbank(jnp.asarray(x[None]),
                                        num_mel_bins=80, sample_rate=sr,
                                        precision="highest")[0])
        np.testing.assert_allclose(kf, g["aishell/kaldi_fbank"],
                                   rtol=1e-4, atol=2e-3)

    def test_sliding_window_cmn(self, g):
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        fb = g["libri/fbank"].T
        cmn = np.asarray(dsp.sliding_window_cmn(
            jnp.asarray(fb[None]), cmn_window=100, min_cmn_window=50)[0])
        np.testing.assert_allclose(cmn, g["libri/cmn"], rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("clip", CLIPS)
    def test_istft_roundtrip(self, g, clip):
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        x = g[f"{clip}/wav"]
        S = dsp.stft(jnp.asarray(x), n_fft=512, hop_length=160,
                     precision="highest")
        y = np.asarray(dsp.istft(S, n_fft=512, hop_length=160, length=len(x),
                                 precision="highest"))
        assert np.max(np.abs(y - x)) < 1e-4


class TestReferenceDerivedGolden:
    """Assertions against values computed by the REFERENCE's own NumPy code
    (executed from /root/reference by tests/make_goldens.py — keys
    ``*/ref_*``). Unlike the self-recorded goldens above, these prove
    equality with the reference's math, not just freedom from drift.

    (Reference ``features.fbank``/``mfcc`` delegate to mindspore's C++
    dataset kernels, so reference-produced goldens are only obtainable for
    its pure-NumPy functions: the spectrum stft and the conformer recipe's
    hand-rolled fbank.)
    """

    @pytest.mark.parametrize("clip", CLIPS)
    def test_host_stft_equals_reference_stft(self, g, clip):
        """reference mindaudio/data/spectrum.py:125 stft — bit-for-bit."""
        from mindaudio_tpu.data import spectrum

        x = g[f"{clip}/wav"]
        S = spectrum.stft(x, n_fft=512, hop_length=160)
        np.testing.assert_allclose(np.abs(S), g[f"{clip}/ref_stft_mag"],
                                   rtol=1e-6, atol=1e-7)

    def test_device_kaldi_fbank_matches_reference_recipe_fbank(self, g):
        """reference examples/conformer/dataset.py:159 compute_fbank_feats.

        Two documented convention deltas between the kaldi-style device op
        and the recipe's hand-rolled NumPy: (1) kaldi scales float input to
        int16 range — a constant ``2*log(32768)`` log-mel offset (absorbed
        by CMVN in training); (2) the recipe subtracts a single global mean
        over windowed frames where kaldi removes per-frame DC — compared
        with ``remove_dc=False``. Residual = the per-frame vs whole-signal
        preemphasis boundary sample: < 0.2 absolute on a ~21 log-mel scale.
        """
        import jax.numpy as jnp

        from mindaudio_tpu.ops import spectral as dsp

        x, sr = g["aishell/wav"], int(g["aishell/sr"])
        kf = np.asarray(dsp.kaldi_fbank(jnp.asarray(x[None]),
                                        num_mel_bins=80, sample_rate=sr,
                                        remove_dc=False,
                                        precision="highest")[0])
        kf = kf - 2.0 * np.log(32768.0)
        ref = g["aishell/ref_recipe_fbank"]
        assert kf.shape == ref.shape
        err = np.abs(kf - ref)
        assert err.max() < 0.25, err.max()
        assert err.mean() < 0.005, err.mean()
