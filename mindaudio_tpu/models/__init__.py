"""Flax model zoo — TPU-native re-implementations of the reference model
families (reference models/__init__.py:1-6 public names plus EcapaTDNN /
ConvTasNet, which the reference examples import directly).
"""

from .asr_model import ASRModel  # noqa: F401
from .conformer import ConformerEncoder, TransformerDecoder  # noqa: F401
from .conv_tasnet import ConvTasNet  # noqa: F401
from .deepspeech2 import DeepSpeechModel  # noqa: F401
from .ecapa_tdnn import Classifier, EcapaTDNN  # noqa: F401
from .fastspeech2 import FastSpeech2, FastSpeech2WithLoss  # noqa: F401
from .greedy_decoder import GreedyCTCDecoder, MSGreedyDecoder  # noqa: F401
from .tasnet import TasNet  # noqa: F401
from .wavegrad import WaveGrad, WaveGradWithLoss  # noqa: F401
