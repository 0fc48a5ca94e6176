"""Training objectives (reference ``mindaudio/loss/``)."""

from .aam_softmax import aam_softmax_loss, additive_angular_margin  # noqa: F401
from .ctc_loss import ctc_loss  # noqa: F401
from .fastspeech2_loss import fastspeech2_loss  # noqa: F401
from .label_smoothing_loss import label_smoothing_loss  # noqa: F401
from .separation_loss import cal_si_snr_jax, pit_si_snr_loss  # noqa: F401

# Reference-name compatibility aliases (SURVEY §7.3 API contract). The
# reference exposes nn.Cell classes (mindaudio/loss/ctc_loss.py:10,
# label_smoothing_loss.py:24, separation_loss.py:13,133,
# AdditiveAngularMargin.py:8, models/fastspeech2/loss.py:6); this framework is
# functional JAX, so each name binds to the equivalent pure loss function.
CTC = ctc_loss
LabelSmoothingLoss = label_smoothing_loss
Separation_Loss = pit_si_snr_loss
Convtasnet_Loss = pit_si_snr_loss
AdditiveAngularMargin = additive_angular_margin
FastSpeech2Loss = fastspeech2_loss
