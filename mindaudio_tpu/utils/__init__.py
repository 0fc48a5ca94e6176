"""Training-infrastructure utilities (masks, batching helpers, decoding,
tokenization, CMVN stats)."""

from . import cmvn, common, mask, recognize, tokenizer  # noqa: F401
from .common import (  # noqa: F401
    IGNORE_ID,
    add_sos_eos,
    pad_sequence,
    remove_duplicates_and_blank,
)
from .recognize import ASRInference  # noqa: F401
from .tokenizer import CharTokenizer  # noqa: F401
