"""Host-side data layer: WAV I/O, spectral analysis, features, processing,
filters, augmentation, and dataset preparation.

API parity with reference ``mindaudio/data/__init__.py:1-9`` (star re-export of
every submodule so ``mindaudio_tpu.read``, ``mindaudio_tpu.stft`` etc. resolve).
"""

from . import aishell, augment, features, filters, io, librispeech, processing, spectrum, voxceleb
from .aishell import prepare_aishell  # noqa: F401
from .augment import *  # noqa: F401,F403
from .librispeech import prepare_librispeech  # noqa: F401
from .voxceleb import prepare_voxceleb  # noqa: F401
from .features import *  # noqa: F401,F403
from .filters import *  # noqa: F401,F403
from .io import *  # noqa: F401,F403
from .processing import *  # noqa: F401,F403
from .spectrum import *  # noqa: F401,F403

__all__ = (
    list(io.__all__)
    + list(spectrum.__all__)
    + list(features.__all__)
    + list(processing.__all__)
    + list(augment.__all__)
    + list(filters.__all__)
    + ["prepare_aishell", "prepare_librispeech", "prepare_voxceleb"]
)
