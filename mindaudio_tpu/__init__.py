"""mindaudio_tpu: a TPU-native (JAX/XLA/Pallas/pjit) audio framework.

Rebuild of the capabilities of mindspore-lab/mindaudio with a TPU-first
architecture:

- ``mindaudio_tpu.data``   — host (NumPy) DSP layer, API-compatible with
  ``mindaudio.data`` (reference ``mindaudio/__init__.py:1-7`` re-export style).
- ``mindaudio_tpu.ops``    — fused on-device DSP (jit + Pallas kernels).
- ``mindaudio_tpu.models`` — Flax model zoo (Conformer, DeepSpeech2,
  ECAPA-TDNN, TasNet/Conv-TasNet, FastSpeech2, WaveGrad).
- ``mindaudio_tpu.loss`` / ``metric`` / ``scheduler`` — training objectives,
  eval metrics, LR schedules.
- ``mindaudio_tpu.train``  — train step, checkpointing, config, logging.
- ``mindaudio_tpu.parallel`` — mesh / sharding utilities (DP/TP/SP axes).
"""

from .data import *  # noqa: F401,F403
from .data import augment, features, filters, io, processing, spectrum  # noqa: F401
from .version import __version__  # noqa: F401
