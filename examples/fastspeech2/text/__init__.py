"""Text front-end: cleaners + symbol set + text→id sequences.

Counterpart of reference ``examples/fastspeech2/text/`` (cleaners, cmudict,
numbers; ~600 LoC). Phone mode uses ARPAbet via a CMUdict file when one is
provided (``load_cmudict``); otherwise character mode — the same model
trains on either unit.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from . import cleaners

_PAD = "_"
_PUNC = "!'(),.:;? "
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_ARPABET = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG", "OW",
    "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W", "Y", "Z", "ZH",
]

# id 0 is padding; characters and @-prefixed ARPAbet phones share one table
symbols: List[str] = [_PAD] + list(_PUNC) + list(_LETTERS) + [f"@{p}" for p in _ARPABET]
_symbol_to_id: Dict[str, int] = {s: i for i, s in enumerate(symbols)}

_stress_re = re.compile(r"([A-Z]+)[0-9]?")


def load_cmudict(path: str) -> Dict[str, List[str]]:
    """Parse a cmudict-format file: WORD  P H O N E S (stress digits dropped)."""
    table = {}
    with open(path, encoding="latin-1") as f:
        for line in f:
            if not line or line.startswith(";;;"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            word = parts[0].split("(")[0].lower()
            phones = [_stress_re.sub(r"\1", p) for p in parts[1:]]
            if word not in table and all(p in _ARPABET for p in phones):
                table[word] = phones
    return table


def clean_text(text: str, cleaner: str = "english_cleaners") -> str:
    return getattr(cleaners, cleaner)(text)


def text_to_sequence(
    text: str,
    cleaner: str = "english_cleaners",
    cmudict: Optional[Dict[str, List[str]]] = None,
) -> List[int]:
    """Cleaned text → symbol ids; with ``cmudict`` words become phones."""
    text = clean_text(text, cleaner)
    seq: List[int] = []
    if cmudict:
        for word in text.split(" "):
            bare = re.sub(r"[^a-z']", "", word)
            if bare in cmudict:
                seq.extend(_symbol_to_id[f"@{p}"] for p in cmudict[bare])
            else:
                seq.extend(_symbol_to_id[c] for c in word if c in _symbol_to_id)
            seq.append(_symbol_to_id[" "])
        if seq:
            seq.pop()
    else:
        seq = [_symbol_to_id[c] for c in text if c in _symbol_to_id]
    return seq


def vocab_size() -> int:
    return len(symbols)
