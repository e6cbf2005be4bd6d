"""Text frontend: normalizers, symbol sets, tokenization round trips."""
import numpy as np
import pytest

from radmmm_tpu.text.numwords import number_to_words, ordinal, cardinal
from radmmm_tpu.text.norm import (normalize_numbers, normalize_currency,
                                  normalize_datestime,
                                  normalize_letters_and_numbers, to_ascii)
from radmmm_tpu.text.cleaners import Cleaner
from radmmm_tpu.text.symbols import get_symbols
from radmmm_tpu.text.processing import TextProcessing
from radmmm_tpu.text.dictionary import Grapheme2PhonemeDictionary


def test_number_words():
    assert cardinal(0) == "zero"
    assert cardinal(17) == "seventeen"
    assert cardinal(42) == "forty-two"
    assert cardinal(105) == "one hundred and five"
    assert cardinal(1000) == "one thousand"
    assert number_to_words("3.14") == "three point one four"
    assert ordinal("21st") == "twenty-first"
    assert ordinal("3rd") == "third"
    assert ordinal("12th") == "twelfth"
    assert ordinal("30th") == "thirtieth"


def test_normalize_numbers():
    assert "five" in normalize_numbers("5 cats")
    assert normalize_numbers("the 2nd time") == "the second time"
    assert "point" in normalize_numbers("1.5 liters")
    assert "by" in normalize_numbers("a 3x5 card")


def test_normalize_currency():
    out = normalize_currency("$5")
    assert out == "five dollars"
    assert normalize_currency("$1") == "one dollar"
    out = normalize_currency("$2.50")
    assert "two dollars" in out and "fifty cents" in out
    assert "million euros" in normalize_currency("€3 million ")


def test_normalize_datestime():
    assert normalize_datestime("at 10:30pm") == "at 10 30 p.m."
    assert normalize_datestime("9am sharp") == "9 a.m. sharp"


def test_letters_and_numbers():
    assert "gigabyte" in normalize_letters_and_numbers("a 50GB disk")
    out = normalize_letters_and_numbers("AK47")
    assert out == "AK 47"


def test_to_ascii():
    assert to_ascii("café naïve søster") == "cafe naive soster"


def test_cleaner_radtts_pipeline():
    c = Cleaner(["radtts_cleaners"])
    out = c("I paid $5 at 10:30pm on June 3rd, 1984!")
    assert "$" not in out and ":" not in out
    assert "five dollars" in out
    assert "third" in out
    assert "{" not in out
    # phoneme spans are protected from *word-level* normalizers (reference
    # semantics, cleaners.py:111-115; sequence-level fns still see them)
    c2 = Cleaner(["english_cleaners"])
    out2 = c2("hello {HH AH0 L OW1} world")
    assert "{hh ah0 l ow1}" in out2


@pytest.mark.parametrize("name,min_count", [
    ("english_basic", 80), ("radtts", 100), ("radmmm", 300),
    ("radmmm_phonemizer_marker_segregated", 300),
])
def test_symbol_sets(name, min_count):
    symbols, markers, placeholders, diphthongs = get_symbols(name)
    assert len(symbols) >= min_count
    assert len(symbols) == len(set(symbols))
    if name.startswith("radmmm_phonemizer"):
        assert placeholders and markers and diphthongs
        assert " " in symbols


def test_text_processing_arpabet_roundtrip(tmp_path):
    tp = TextProcessing("english_basic", ["english_cleaners"],
                        g2p_type="none")
    ids = tp.encode_text("Hello world.")
    assert len(ids) > 0
    text = tp.sequence_to_text(ids)
    assert "hello world." in text


def test_text_processing_phonemizer_dict(tmp_path):
    # build a tiny per-language G2P dict
    dict_path = tmp_path / "en.tsv"
    dict_path.write_text("hello\thəˈloʊ\nworld\twɜrld\n", encoding="utf-8")
    tp = TextProcessing(
        "radmmm_phonemizer_marker_segregated", ["radtts_cleaners"],
        g2p_type="phonemizer", phonemizer_cfg={"en_US": str(dict_path)},
        prepend_space_to_text=True, append_space_to_text=True)
    ids = tp.encode_text("hello world", language="en_US")
    assert len(ids) > 4
    # leading/trailing space tokens
    assert ids[0] == tp.symbol_to_id[" "] and ids[-1] == tp.symbol_to_id[" "]
    decoded = tp.sequence_to_text(ids)
    assert "l" in decoded  # phonemes made it through


def test_parse_phonemized_text_markers():
    tp = TextProcessing("radmmm_phonemizer_marker_segregated",
                        ["basic_cleaners"], g2p_type="none")
    # stress marker is an 'other' placeholder: stands alone
    tokens = tp.parse_phonemized_text("ˈhaʊ")
    assert tokens[0] == "ˈ"
    assert "aʊ" in tokens  # diphthong stays fused
    # length marker binds left
    tokens = tp.parse_phonemized_text("aː")
    assert tokens == ["aː"]


def test_g2p_dictionary(tmp_path):
    p = tmp_path / "d.tsv"
    p.write_text("read\tR EH1 D\nread\tR IY1 D\ncat\tK AE1 T\n")
    d = Grapheme2PhonemeDictionary(str(p), encoding="utf-8")
    assert d.lookup("cat") == ["K AE1 T"]
    assert len(d.lookup("READ")) == 2
    assert d.lookup("dog") is None
