"""Training objectives (reference ``mindaudio/loss/``)."""

from .aam_softmax import aam_softmax_loss, additive_angular_margin  # noqa: F401
from .ctc_loss import ctc_loss  # noqa: F401
from .fastspeech2_loss import fastspeech2_loss  # noqa: F401
from .label_smoothing_loss import label_smoothing_loss  # noqa: F401
from .separation_loss import cal_si_snr_jax, pit_si_snr_loss  # noqa: F401
