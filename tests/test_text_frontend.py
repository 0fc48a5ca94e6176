"""FastSpeech2 text front-end: cleaners, cmudict phones, Mandarin pinyin.

Guards the recipe-level G2P layer (reference examples/fastspeech2/text/:
cleaners.py, cmudict.py, numbers.py, pinyin.py, symbols.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples", "fastspeech2"))

import text  # noqa: E402
from text import pinyin  # noqa: E402


class TestEnglish:
    def test_cleaner_numbers_and_case(self):
        out = text.clean_text("Dr. Smith paid $3.50 on May 2nd, 1999!")
        assert out == "doctor smith paid three dollars, fifty cents on may second, nineteen ninety nine!"

    def test_char_sequence_roundtrip_ids(self):
        seq = text.text_to_sequence("hi!")
        assert len(seq) == 3 and len(set(seq)) == 3

    def test_cmudict_phone_path(self, tmp_path):
        d = tmp_path / "cmudict"
        d.write_text("HELLO  HH AH0 L OW1\nWORLD  W ER1 L D\n", encoding="latin-1")
        table = text.load_cmudict(str(d))
        assert table["hello"] == ["HH", "AH", "L", "OW"]
        seq = text.text_to_sequence("hello world", cmudict=table)
        # 4 + 4 phones + 1 space
        assert len(seq) == 9


class TestPinyin:
    @pytest.mark.parametrize(
        "syl,want",
        [
            ("zhong1", ["zh", "ong1"]),
            ("shi4", ["sh", "iii4"]),
            ("zi3", ["z", "ii3"]),
            ("lv4", ["l", "v4"]),
            ("lü4", ["l", "v4"]),
            ("er2", ["er2"]),
            ("yu3", ["y", "v3"]),
            ("wen2", ["w", "uen2"]),
            ("liu2", ["l", "iou2"]),
            ("hui4", ["h", "uei4"]),
            ("jun1", ["j", "vn1"]),
            ("huar1", ["h", "ua1", "rr"]),
            ("ma", ["m", "a5"]),  # missing tone -> neutral
        ],
    )
    def test_split_syllable(self, syl, want):
        assert pinyin.split_syllable(syl) == want

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            pinyin.split_syllable("xyz9q")

    def test_all_split_outputs_in_inventory(self):
        for syl in ["ni3", "hao3", "zhong1", "guo2", "ren2", "min2", "yin1", "yue4"]:
            for sym in pinyin.split_syllable(syl):
                assert sym in pinyin.valid_symbols

    def test_sequence_with_silence_and_punct(self):
        ids = text.pinyin_to_sequence("ni3 hao3 sp zhong1 guo2 .")
        assert len(ids) == 10
        assert all(0 < i < text.vocab_size() for i in ids)

    def test_lue_nue_keyboard_orthography(self):
        assert pinyin.split_syllable("lue4") == ["l", "ve4"]
        assert pinyin.split_syllable("nue4") == ["n", "ve4"]

    def test_fallback_chars_use_letter_table_not_phones(self):
        # 'h'/'k'/'l' in a non-pinyin token must resolve to letter ids,
        # never to the same-named Mandarin initial phone ids.
        with pytest.warns(UserWarning):
            ids = text.pinyin_to_sequence("ok")
        letter_ids = [text.symbols.index("o"), text.symbols.index("k")]
        assert ids == letter_ids

    def test_typo_warns_and_degrades_to_chars(self):
        with pytest.warns(UserWarning):
            ids = text.pinyin_to_sequence("ni3hao3")
        # digits are dropped (not in the table); letters map to the char table
        assert ids == [text.symbols.index(c) for c in "nihao"]

    def test_symbol_table_prefix_stable(self):
        # English ids must not shift when the pinyin block is appended.
        assert text.symbols[0] == "_"
        eng = text.text_to_sequence("abc")
        assert max(eng) < text.symbols.index("@" + pinyin.valid_symbols[0])
