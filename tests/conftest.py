"""Test bootstrap: force JAX onto a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharded code paths are validated on
a fake 8-device CPU platform exactly as the reference validates its data layer
on CPU-only CI (reference .github/workflows/ut_test.yaml runs MindSpore CPU).

The environment pre-imports jax at interpreter startup (axon sitecustomize)
and pins ``jax_platforms='axon,cpu'``, so env vars set here are too late for
the *config* but not for *backend creation*: XLA_FLAGS is read when the first
backend initializes, and ``jax.config.update`` still wins if no backend has
been created yet. Both are done below, before any test touches a device.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402  (already imported by sitecustomize — cheap)

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # backend already initialized; tests fall back to jax.devices('cpu')
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    # Fail fast if we are about to run the suite against the remote TPU chip:
    # compile round-trips make the model tests ~20x slower there.
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh; got "
        f"{jax.devices()[0].platform}"
    )
    assert jax.device_count() == 8


@pytest.fixture(scope="session")
def sample_wav(tmp_path_factory):
    """Synthetic 16 kHz speech-like test clip (sum of harmonics + noise), ~4 s."""
    sr = 16000
    t = np.arange(4 * sr) / sr
    rng = np.random.default_rng(0)
    x = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t + 0.3)
        + 0.1 * np.sin(2 * np.pi * 880 * t + 0.1)
        + 0.02 * rng.standard_normal(len(t))
    )
    # amplitude envelope with silent head/tail so trim/split have work to do
    env = np.clip(np.sin(np.pi * t / t[-1]) * 1.2, 0, 1)
    x = (x * env).astype(np.float32)
    path = tmp_path_factory.mktemp("samples") / "test_16k.wav"
    from mindaudio_tpu.data import io

    io.write(str(path), (x * 32767).astype(np.int16), sr)
    return str(path)


@pytest.fixture(scope="session")
def rir_wav(tmp_path_factory):
    """Synthetic exponentially-decaying room impulse response, 0.25 s @ 16 kHz."""
    sr = 16000
    rng = np.random.default_rng(1)
    n = sr // 4
    rir = rng.standard_normal(n) * np.exp(-np.arange(n) / (0.05 * sr))
    rir[: sr // 100] = 0.0
    rir[sr // 100] = 1.0  # direct path
    path = tmp_path_factory.mktemp("rir") / "rir_16k.wav"
    from mindaudio_tpu.data import io

    io.write(str(path), rir.astype(np.float32), sr)
    return str(path)
