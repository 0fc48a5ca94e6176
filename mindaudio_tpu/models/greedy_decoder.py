"""Greedy CTC character decoder with per-utterance WER/CER helpers.

Behavioural parity with the reference's greedy char decoder
(mindaudio/models/decoders/greedydecoder.py: ``Decoder``:6,
``GreedyDecoder``:78, ``MSGreedyDecoder``:98): argmax over character
probabilities, CTC repeat-collapse, blank removal, space handling, and
Levenshtein-style WER/CER on the decoded strings.

TPU-native notes: the argmax itself belongs on device inside the jitted eval
program (see examples/deepspeech2/eval.py); this class is the host-side
string-assembly and scoring tail, so it accepts plain ``np.ndarray`` token
matrices (anything with ``np.asarray`` semantics, including JAX arrays).
The reference's ``python-Levenshtein`` dependency is replaced by our own
edit-distance DP (mindaudio_tpu/metric/wer.py).
"""

from __future__ import annotations

import numpy as np

from ..metric.wer import _edit_distance

__all__ = ["GreedyCTCDecoder", "MSGreedyDecoder"]


class GreedyCTCDecoder:
    """Decode argmax token paths to strings and score them.

    Args:
        labels: mapping from integer ids to characters (list of 1-char str).
        blank_index: id of the CTC blank. Defaults to 0.
    """

    def __init__(self, labels, blank_index: int = 0):
        self.labels = list(labels)
        self.int_to_char = dict(enumerate(self.labels))
        self.blank_index = blank_index
        # Out-of-bounds sentinel when the label set has no explicit space,
        # mirroring the reference's guard (greedydecoder.py:20-25).
        self.space_index = (
            self.labels.index(" ") if " " in self.labels else len(self.labels)
        )

    # -- scoring ---------------------------------------------------------
    def wer(self, s1: str, s2: str) -> int:
        """Word-level edit distance between two space-separated sentences."""
        return _edit_distance(s1.split(), s2.split())

    def cer(self, s1: str, s2: str) -> int:
        """Character-level edit distance (spaces stripped)."""
        return _edit_distance(list(s1.replace(" ", "")), list(s2.replace(" ", "")))

    # -- decoding --------------------------------------------------------
    def process_string(self, sequence, size, remove_repetitions: bool = False):
        """Collapse one id path of length ``size`` into a string.

        Returns ``(string, offsets)`` where offsets are the frame indices of
        emitted characters.
        """
        chars = []
        offsets = []
        seq = np.asarray(sequence)
        for i in range(int(size)):
            idx = int(seq[i])
            if idx == self.blank_index:
                continue
            if remove_repetitions and i != 0 and idx == int(seq[i - 1]):
                continue
            chars.append(" " if idx == self.space_index else self.int_to_char[idx])
            offsets.append(i)
        return "".join(chars), offsets

    def convert_to_strings(
        self, sequences, sizes=None, remove_repetitions=False, return_offsets=False
    ):
        """Vector form of :meth:`process_string` over a batch of id paths."""
        strings, offsets = [], []
        for b, seq in enumerate(sequences):
            size = sizes[b] if sizes is not None else len(seq)
            s, off = self.process_string(seq, size, remove_repetitions)
            strings.append([s])  # single best path per utterance
            offsets.append([off])
        if return_offsets:
            return strings, offsets
        return strings

    def decode(self, probs, sizes=None):
        """Greedy-decode a batch.

        Args:
            probs: ``(batch, time, vocab)`` character probabilities or logits.
            sizes: ``(batch,)`` valid frame counts.

        Returns:
            ``(strings, offsets)`` — per-utterance best-path strings and the
            frame offsets of each emitted character.
        """
        probs = np.asarray(probs)
        best = np.argmax(probs, axis=-1)
        sizes = None if sizes is None else np.asarray(sizes)
        return self.convert_to_strings(
            best, sizes, remove_repetitions=True, return_offsets=True
        )


# Reference-name compatibility alias (models/__init__.py:1-6 exports
# ``MSGreedyDecoder``); the implementation above is framework-agnostic.
MSGreedyDecoder = GreedyCTCDecoder
