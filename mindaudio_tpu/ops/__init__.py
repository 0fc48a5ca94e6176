"""On-device (JAX/XLA/Pallas) DSP ops — the TPU fast path of the data layer."""

from . import filterbanks, pallas_mel, resample as _resample_mod, spectral, specaugment  # noqa: F401
from .pallas_mel import fused_logmel  # noqa: F401
from .resample import resample  # noqa: F401
from .specaugment import mask_along_axis, spec_augment  # noqa: F401
from .spectral import (  # noqa: F401
    amplitude_to_db,
    compute_deltas,
    fbank,
    global_cmvn,
    istft,
    kaldi_fbank,
    melscale,
    melspectrogram,
    mfcc,
    overlap_and_add,
    sliding_window_cmn,
    spectrogram,
    stft,
)
