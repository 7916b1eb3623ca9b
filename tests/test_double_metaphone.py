"""Golden vectors for the faithful Double Metaphone port.

Expected values follow the published algorithm (Philips 2000) with the
``metaphone``-package contract the reference consumes
(``/root/reference/ftm_columnstore/phonetic.py:9,46-47``): untruncated
codes, secondary ``""`` when identical to primary.
"""

import pytest

from ftm_columnstore_spark.functions.double_metaphone import double_metaphone

VECTORS = [
    # (word, primary, secondary)
    ("", "", ""),
    ("A", "A", ""),
    ("Smith", "SM0", "XMT"),
    ("Schmidt", "XMT", "SMT"),
    ("Snider", "SNTR", "XNTR"),
    ("Schneider", "XNTR", "SNTR"),
    ("Jose", "HS", ""),
    ("San Jacinto", "SNHSNT", ""),
    ("Xavier", "SF", "SFR"),
    ("Michael", "MKL", "MXL"),
    ("Katherine", "K0RN", "KTRN"),
    ("Catherine", "K0RN", "KTRN"),
    ("Richard", "RXRT", "RKRT"),
    ("Aubrey", "APR", ""),
    ("Maurice", "MRS", ""),
    ("Cabrillo", "KPRL", "KPR"),
    ("Ghiradelli", "JRTL", ""),
    ("Ghislane", "JLN", ""),
    ("Accident", "AKSTNT", ""),
    ("Accede", "AKST", ""),
    ("Knight", "NT", ""),
    ("Wright", "RT", ""),
    ("Gnome", "NM", ""),
    ("Pneumatic", "NMTK", ""),
    ("Psalm", "SLM", ""),
    ("Zhao", "J", ""),
    ("Thomas", "TMS", ""),
    ("Thames", "TMS", ""),
    ("Thumb", "0M", "TM"),
    ("Dumb", "TM", ""),
    ("School", "SKL", ""),
    ("Wasserman", "ASRMN", "FSRMN"),
    ("Vasserman", "FSRMN", ""),
    ("Filipowicz", "FLPTS", "FLPFX"),
    ("Otto", "AT", ""),
    ("Edge", "AJ", ""),
    ("Edgar", "ATKR", ""),
    ("Sugar", "XKR", "SKR"),
    ("Island", "ALNT", ""),
    ("Isle", "AL", ""),
    ("Jones", "JNS", "ANS"),
    ("Danger", "TNJR", "TNKR"),
    ("Ranger", "RNJR", "RNKR"),
    ("Caesar", "SSR", ""),
    ("Chianti", "KNT", ""),
    ("Chemistry", "KMSTR", ""),
    ("Chorus", "KRS", ""),
    ("Architect", "ARKTKT", ""),
    ("Arch", "ARX", "ARK"),
    ("Orchestra", "ARKSTR", ""),
    ("Orchid", "ARKT", ""),
    ("McHugh", "MK", ""),
    ("Czerny", "SRN", "XRN"),
    ("Focaccia", "FKX", ""),
    ("Bacci", "PX", ""),
    ("Bacchus", "PKS", ""),
    ("McClellan", "MKLLN", ""),
    ("Tagliaro", "TKLR", "TLR"),
    ("Biaggi", "PJ", "PK"),
    ("Hugh", "H", ""),
    ("Laugh", "LF", ""),
    ("Cough", "KF", ""),
    ("Rough", "RF", ""),
    ("Cagney", "KKN", ""),
    ("Campbell", "KMPL", ""),
    ("Raspberry", "RSPR", ""),
    ("Tchibo", "XP", ""),
    ("Holding", "HLTNK", ""),
    ("Yankelovich", "ANKLFX", "ANKLFK"),
    ("Bajador", "PJTR", "PHTR"),
    ("Cambrillo", "KMPRL", "KMPR"),
    ("Gallegos", "KLKS", "KKS"),
    ("Uomo", "AM", ""),
    ("Womo", "AM", "FM"),
    ("Arnow", "ARN", "ARNF"),
    ("Wewski", "ASK", "FFSK"),
]


@pytest.mark.parametrize("word,primary,secondary", VECTORS)
def test_vector(word, primary, secondary):
    assert double_metaphone(word) == (primary, secondary)


def test_secondary_blank_iff_equal():
    # the package contract: secondary is "" exactly when it would repeat
    for word in ("otto", "aubrey", "maurice", "gnome", "thomas"):
        pri, sec = double_metaphone(word)
        assert sec == ""
        assert pri != ""


def test_case_and_whitespace_insensitive():
    assert double_metaphone("  smith ") == double_metaphone("SMITH")


# --- robustness fuzz ------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_never_raises_and_code_alphabet(s):
    pri, sec = double_metaphone(s)
    # codes draw from the double-metaphone output alphabet only
    alphabet = set("AFHJKLMNPRSTX0")
    assert set(pri) <= alphabet
    assert set(sec) <= alphabet
    # contract: secondary is "" when it would equal primary
    assert sec != pri or pri == ""


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=30))
def test_deterministic(s):
    assert double_metaphone(s) == double_metaphone(s)
