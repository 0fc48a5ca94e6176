"""Character tokenizer + vocab building (AISHELL-style CJK char modeling).

Counterpart of reference ``mindaudio/utils/text2token.py`` (CJK char / BPE
tokenization CLI, main:129) and the conformer recipe's ``lang_char.txt``
convention: id 0 = <blank> (CTC), id 1 = <unk>, last id = <sos/eos>.
"""

from __future__ import annotations

from typing import Dict, Iterable, List

__all__ = ["CharTokenizer", "build_char_vocab"]


def build_char_vocab(transcripts: Iterable[str]) -> List[str]:
    """Sorted unique characters (whitespace stripped) from transcripts."""
    chars = set()
    for text in transcripts:
        for ch in text:
            if not ch.isspace():
                chars.add(ch)
    return sorted(chars)


class CharTokenizer:
    """``<blank>=0, <unk>=1, chars..., <sos/eos>=vocab-1`` char-level mapping."""

    def __init__(self, chars: List[str]):
        self.symbols = ["<blank>", "<unk>"] + list(chars) + ["<sos/eos>"]
        self.char2id: Dict[str, int] = {c: i for i, c in enumerate(self.symbols)}
        self.vocab_size = len(self.symbols)
        self.blank_id = 0
        self.unk_id = 1
        self.sos = self.eos = self.vocab_size - 1

    @classmethod
    def from_transcripts(cls, transcripts: Iterable[str]) -> "CharTokenizer":
        return cls(build_char_vocab(transcripts))

    @classmethod
    def from_file(cls, path: str) -> "CharTokenizer":
        """Load a ``lang_char.txt`` (symbol [id] per line, ids implicit by order)."""
        symbols = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if parts:
                    symbols.append(parts[0])
        tok = cls.__new__(cls)
        tok.symbols = symbols
        tok.char2id = {c: i for i, c in enumerate(symbols)}
        tok.vocab_size = len(symbols)
        tok.blank_id = 0
        tok.unk_id = symbols.index("<unk>") if "<unk>" in symbols else 1
        tok.sos = tok.eos = tok.vocab_size - 1
        return tok

    def save(self, path: str):
        with open(path, "w", encoding="utf-8") as f:
            for i, s in enumerate(self.symbols):
                f.write(f"{s} {i}\n")

    def encode(self, text: str) -> List[int]:
        return [
            self.char2id.get(ch, self.unk_id)
            for ch in text
            if not ch.isspace()
        ]

    def decode(self, ids: Iterable[int]) -> str:
        return "".join(
            self.symbols[i] for i in ids
            if 0 < i < self.vocab_size - 1 and self.symbols[i] != "<unk>"
        )


def _main():
    """CLI: build a lang_char.txt from transcripts (reference text2token.py:129).

    Usage: python -m mindaudio_tpu.utils.tokenizer --input train.csv|trans.txt
           --output lang_char.txt [--column transcript]
    """
    import argparse
    import csv

    parser = argparse.ArgumentParser(description="build char vocab")
    parser.add_argument("--input", required=True,
                        help="CSV manifest with a transcript column, or a "
                             "plain text file (one transcript per line)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--column", default="transcript")
    args = parser.parse_args()

    texts = []
    with open(args.input, encoding="utf-8") as f:
        # CSV iff csv.DictReader actually finds the transcript column in the
        # header; a plain-text transcript whose first line contains a comma
        # (or the column word) must not be parsed as CSV
        reader = csv.DictReader(f)
        if reader.fieldnames and args.column in reader.fieldnames:
            texts = [row[args.column] for row in reader if row.get(args.column)]
        else:
            f.seek(0)
            texts = [line.strip() for line in f if line.strip()]
    tok = CharTokenizer.from_transcripts(texts)
    tok.save(args.output)
    print(f"{args.output}: {tok.vocab_size} symbols")


if __name__ == "__main__":
    _main()
