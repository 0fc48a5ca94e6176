"""Evaluation metrics (reference ``mindaudio/metric/``)."""

from .eer import get_eer, get_eer_from_scores  # noqa: F401
from .snr import bss_eval_sources, cal_SDRi, cal_SISNR, cal_SISNRi  # noqa: F401
from .wer import cer, wer  # noqa: F401
