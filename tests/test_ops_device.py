"""Device (JAX) DSP ops vs the host NumPy layer — golden parity tests.

Runs on the CPU backend (conftest forces JAX_PLATFORMS=cpu) but the same code
path compiles for TPU.
"""

import numpy as np
import pytest

import mindaudio_tpu.data.features as hfeat
import mindaudio_tpu.data.processing as hproc
import mindaudio_tpu.data.spectrum as hspec
from mindaudio_tpu import ops


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((4, 16000)) * 0.3).astype(np.float32)


def _rel_err(dev, host):
    """Max abs error normalized by the host's dynamic range (f32 matmul-DFT
    vs float64 FFT can't bit-match; scale-relative error is the right bar)."""
    return np.abs(dev - host).max() / (np.abs(host).max() + 1e-12)


class TestDeviceSpectral:
    def test_stft_matches_host(self, batch):
        dev = np.asarray(ops.stft(batch, n_fft=512))
        host = hspec.stft(batch, n_fft=512)
        assert _rel_err(dev[..., 0], host.real) < 2e-3
        assert _rel_err(dev[..., 1], host.imag) < 2e-3

    def test_spectrogram_matches_host(self, batch):
        dev = np.asarray(ops.spectrogram(batch))
        host = hspec.spectrogram(batch)
        assert dev.shape == host.shape
        assert _rel_err(dev, host) < 2e-3

    def test_melspectrogram_matches_host(self, batch):
        dev = np.asarray(ops.melspectrogram(batch, n_mels=80))
        host = hspec.melspectrogram(batch, n_mels=80)
        assert dev.shape == host.shape
        assert _rel_err(dev, host) < 2e-3

    def test_fbank_matches_host(self, batch):
        dev = np.asarray(ops.fbank(batch, n_mels=40))
        host = hfeat.fbank(batch, n_mels=40)
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, rtol=1e-3, atol=2e-2)

    def test_fbank_deltas_context(self, batch):
        dev = np.asarray(ops.fbank(batch[:2], deltas=True, context=True, n_mels=40))
        host = hfeat.fbank(batch[:2], deltas=True, context=True, n_mels=40)
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, rtol=1e-3, atol=2e-2)

    def test_mfcc_matches_host(self, batch):
        dev = np.asarray(ops.mfcc(batch[:2]))
        host = hfeat.mfcc(batch[:2])
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, rtol=1e-2, atol=5e-2)

    def test_compute_deltas_matches_host(self):
        x = np.random.default_rng(1).random((2, 40, 100)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(ops.compute_deltas(x)), hfeat.compute_deltas(x), atol=1e-5
        )

    def test_overlap_and_add_matches_host(self):
        sig = np.random.default_rng(2).standard_normal((3, 10, 64)).astype(np.float32)
        for step in (16, 32, 40, 64):
            dev = np.asarray(ops.overlap_and_add(sig, step))
            host = hproc.overlap_and_add(sig, step)
            np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_kaldi_fbank_shape(self, batch):
        out = np.asarray(ops.kaldi_fbank(batch, num_mel_bins=80))
        # snip-edges: 1 + (16000 - 400) // 160 = 98 frames
        assert out.shape == (4, 98, 80)
        assert np.isfinite(out).all()


class TestSpecAugment:
    def test_spec_augment_masks(self, batch):
        import jax

        feats = ops.fbank(batch, n_mels=40)  # (B, freq, time)
        out = np.asarray(
            ops.spec_augment(
                jax.random.PRNGKey(0), np.swapaxes(np.asarray(feats), -1, -2),
                num_t_mask=2, num_f_mask=2, max_t=20, max_f=10,
            )
        )
        assert out.shape == (4, feats.shape[2], 40)
        # masked entries are zero and each sample differs
        assert (out == 0).sum() > 0

    def test_mask_iid_per_sample(self, batch):
        import jax

        spec = np.ones((4, 32, 64), np.float32)
        out = np.asarray(ops.mask_along_axis(jax.random.PRNGKey(3), spec, 16, axis=2))
        # different samples get different masks (with overwhelming probability)
        patterns = {tuple(np.flatnonzero(out[i][0] == 0)) for i in range(4)}
        assert len(patterns) > 1


class TestPallasMel:
    def test_fused_logmel_matches_reference(self, batch):
        out = np.asarray(ops.fused_logmel(batch, n_mels=80, block_frames=64))
        ref = np.asarray(ops.pallas_mel.fused_logmel_reference(batch, n_mels=80))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)

    def test_fused_logmel_odd_lengths(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 12345)).astype(np.float32)
        out = np.asarray(ops.fused_logmel(x, n_mels=40, block_frames=64))
        ref = np.asarray(ops.pallas_mel.fused_logmel_reference(x, n_mels=40))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


class TestDeviceResample:
    def test_bandlimited_exact(self):
        """Kaiser polyphase resample reproduces analytic bandlimited signals
        (replaces reference msaudio.Resample [native-in-dep], SURVEY §2.1)."""
        import jax.numpy as jnp

        from mindaudio_tpu.ops.resample import resample

        for of, nf, tol in ((16000, 8000, 1e-3), (8000, 16000, 1e-3),
                            (22050, 16000, 1e-5), (16000, 22050, 1e-5)):
            t = np.arange(of) / of
            freqs = [200, 443, 997, 1501]
            x = sum(np.sin(2 * np.pi * f * t + 0.1 * i)
                    for i, f in enumerate(freqs)).astype(np.float32)[None]
            out = np.asarray(resample(jnp.asarray(x), of, nf))
            t2 = np.arange(out.shape[-1]) / nf
            ref = sum(np.sin(2 * np.pi * f * t2 + 0.1 * i)
                      for i, f in enumerate(freqs))[None]
            n = out.shape[-1] - 200
            assert np.abs(out[:, 100:n] - ref[:, 100:n]).max() < tol

    def test_identity_and_length(self):
        import jax.numpy as jnp

        from mindaudio_tpu.ops.resample import resample

        x = jnp.ones((3, 1000), jnp.float32)
        np.testing.assert_array_equal(np.asarray(resample(x, 16000, 16000)),
                                      np.asarray(x))
        y = resample(x, 16000, 24000)
        assert y.shape == (3, 1500)


class TestDeviceSlidingCMN:
    def test_matches_host(self):
        import jax.numpy as jnp

        from mindaudio_tpu.data.processing import sliding_window_cmn as host_cmn
        from mindaudio_tpu.ops.spectral import sliding_window_cmn as dev_cmn

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 180, 13)).astype(np.float32)
        for kwargs in ({}, {"center": True}, {"norm_vars": True},
                       {"cmn_window": 50, "min_cmn_window": 20}):
            a = np.asarray(dev_cmn(jnp.asarray(x), **kwargs))
            b = host_cmn(x, **kwargs)
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestDeviceISTFT:
    def test_roundtrip(self, batch):
        y = np.asarray(ops.istft(ops.stft(batch, n_fft=512), n_fft=512,
                                 length=batch.shape[-1]))
        np.testing.assert_allclose(y, batch, atol=2e-6)

    def test_roundtrip_hop_and_window(self, batch):
        S = ops.stft(batch, n_fft=400, hop_length=100, window="hann")
        y = np.asarray(ops.istft(S, n_fft=400, hop_length=100, window="hann",
                                 length=batch.shape[-1]))
        np.testing.assert_allclose(y, batch, atol=2e-6)


class TestHostDeviceParityFixes:
    """Regression locks for review-found divergences."""

    def test_kaiser_resample_host_matches_device(self):
        import jax.numpy as jnp

        from mindaudio_tpu.data.processing import resample as host_resample
        from mindaudio_tpu.ops.resample import resample as dev_resample

        t = np.arange(16000) / 16000
        x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
        h = host_resample(x, 16000, 8000, res_type="kaiser")
        d = np.asarray(dev_resample(jnp.asarray(x), 16000, 8000))
        n = min(h.shape[-1], d.shape[-1]) - 200
        np.testing.assert_allclose(h[:, 100:n], d[:, 100:n], atol=1e-5)

    def test_istft_default_length_matches_host(self):
        from mindaudio_tpu.data import spectrum

        x = np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)
        yd = np.asarray(ops.istft(ops.stft(x, n_fft=512), n_fft=512))
        yh = spectrum.istft(spectrum.stft(x, n_fft=512), n_fft=512)
        assert yd.shape == yh.shape
        np.testing.assert_allclose(yd, yh, atol=1e-5)

    def test_convolve1d_is_cross_correlation(self):
        from mindaudio_tpu.data.augment import convolve1d

        x = np.array([0.0, 0, 1, 0, 0], np.float32)
        k = np.array([[[1.0, 2, 3]]], np.float32)
        out = convolve1d(x, k, use_fft=False)
        np.testing.assert_allclose(out, [3.0, 2.0, 1.0])


class TestKaldiParityRegressions:
    """Round-1 review: povey window symmetry + mel-domain kaldi banks."""

    def test_povey_window_is_symmetric_hanning_pow(self):
        from mindaudio_tpu.ops.filterbanks import povey_window

        w = povey_window(400)
        ref = np.power(np.hanning(400), 0.85)  # reference dataset.py:126
        np.testing.assert_allclose(w, ref, atol=1e-12)
        assert w[0] == 0.0 and abs(w[-1]) < 1e-12  # symmetric endpoints

    def test_kaldi_mel_banks_triangles_in_mel_domain(self):
        from mindaudio_tpu.ops.filterbanks import kaldi_mel_banks

        def mel(f):
            return 1127.0 * np.log(1.0 + f / 700.0)

        n_fft, sr, nb = 512, 16000, 8
        bin_mel = mel(sr / n_fft * np.arange(n_fft // 2))
        edges = np.linspace(mel(20.0), mel(8000.0), nb + 2)
        ref = np.zeros((n_fft // 2, nb))
        for m in range(nb):
            lo, c, hi = edges[m], edges[m + 1], edges[m + 2]
            up = (bin_mel - lo) / (c - lo)
            dn = (hi - bin_mel) / (hi - c)
            ref[:, m] = np.clip(np.minimum(up, dn), 0, None)
        ours = kaldi_mel_banks(nb, n_fft, sr)
        assert ours.shape == (n_fft // 2 + 1, nb)
        np.testing.assert_allclose(ours[: n_fft // 2], ref, atol=1e-6)
        assert np.all(ours[-1] == 0)  # nyquist column

    def test_melscale_fbanks_rejects_unknown_norm(self):
        import pytest

        from mindaudio_tpu.ops.filterbanks import melscale_fbanks

        with pytest.raises(ValueError):
            melscale_fbanks(201, 0.0, 8000.0, 80, 16000, norm="ortho")


class TestKaldiFbankInt16:
    def test_int16_matches_float_input(self):
        """The collate ships raw int16 PCM (half the H2D bytes); device fbank
        must produce the same features as the normalized-float path."""
        import jax.numpy as jnp

        from mindaudio_tpu.ops.spectral import kaldi_fbank

        rng = np.random.default_rng(0)
        pcm = rng.integers(-20000, 20000, (2, 8000)).astype(np.int16)
        f_int = np.asarray(kaldi_fbank(jnp.asarray(pcm), num_mel_bins=23))
        f_flt = np.asarray(kaldi_fbank(
            jnp.asarray(pcm.astype(np.float32) / 32768.0), num_mel_bins=23))
        np.testing.assert_allclose(f_int, f_flt, rtol=1e-4, atol=1e-4)
