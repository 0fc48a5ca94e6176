"""Headline benchmark: fused log-mel feature extraction throughput on TPU.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

The metric is mel-spectrogram frames/sec/chip through the Pallas fused
framing+DFT+power+mel+log kernel (ops/pallas_mel.py) — the on-device
replacement for the reference's host hot loop (mp.Pool(8) NumPy fbank per
batch, reference examples/conformer/dataset.py:456-492). ``vs_baseline`` is
the speedup over the same feature computed on host CPU by the NumPy parity
layer (librosa isn't in the image; the NumPy path is the same math librosa
runs). North star (BASELINE.json): >=5x host-CPU mel throughput per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

N_FFT = 400
HOP = 160
N_MELS = 80
BATCH = 128
SECONDS = 10
SR = 16000


def _host_baseline_frames_per_sec(x: np.ndarray) -> float:
    """Host-CPU log-mel throughput on one clip batch slice (NumPy parity layer)."""
    from mindaudio_tpu.data import spectrum

    clip = x[:4]  # keep host run short; per-frame cost is size-independent
    t0 = time.perf_counter()
    mel = spectrum.melspectrogram(
        clip, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, sample_rate=SR,
        pad_mode="constant",
    )
    np.log(np.maximum(mel, 1e-10))
    dt = time.perf_counter() - t0
    n_frames = clip.shape[0] * mel.shape[-1]
    return n_frames / dt


def main():
    import jax
    import jax.numpy as jnp

    from mindaudio_tpu.ops.pallas_mel import fused_logmel

    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, SECONDS * SR)).astype(np.float32)

    host_fps = _host_baseline_frames_per_sec(x)

    xd = jax.device_put(jnp.asarray(x))

    def run():
        return fused_logmel(
            xd, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, sample_rate=SR
        )

    # warm-up covers compile AND the remote-tunnel cold path (first timed
    # loops are otherwise 10-100x off)
    for _ in range(10):
        out = run()
        float(jnp.sum(out))

    # best-of-3 trials: the remote tunnel has multi-second stalls that would
    # otherwise dominate the mean
    n_iter = 10
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n_iter):
            out = run()
            acc = acc + jnp.sum(out)
        float(acc)  # device sync through a data dependency
        best_dt = min(best_dt, time.perf_counter() - t0)

    frames = out.shape[0] * out.shape[1] * n_iter
    fps = frames / best_dt
    print(json.dumps({
        "metric": "fused_logmel_throughput",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / host_fps, 2),
    }))


if __name__ == "__main__":
    main()
