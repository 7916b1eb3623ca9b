"""Indic-aware soundex: cross-script equivalence + classic Latin codes."""

from ftm_columnstore_spark.functions.indic_soundex import indic_soundex


def test_latin_matches_classic_soundex():
    # classic soundex golden values (incl. the h/w non-reset rule)
    assert indic_soundex("Robert") == "R163"
    assert indic_soundex("Rupert") == "R163"
    assert indic_soundex("Tymczak") == "T522"
    assert indic_soundex("Pfister") == "P236"
    assert indic_soundex("Ashcraft") == "A261"
    assert indic_soundex("") == ""


def test_cross_script_equivalence():
    # "vasudeva" in Devanagari and Kannada encode identically
    deva = "वसुदेव"  # वसुदेव
    kann = "ವಸುದೇವ"  # ವಸುದೇವ
    assert indic_soundex(deva) == indic_soundex(kann)
    assert indic_soundex(deva).startswith("I")
    # different name → different code
    rama = "राम"  # राम
    assert indic_soundex(deva) != indic_soundex(rama)


def test_matras_and_virama_skipped():
    # क (ka) vs का (kaa): the matra must not change the code
    assert indic_soundex("क") == indic_soundex("का")


def test_spark_dispatcher(spark):
    from pyspark.sql import functions as F

    from ftm_columnstore_spark.functions.phonetics import phonetics_col

    df = spark.createDataFrame(
        [("वसुदेव राम",), ("Robert",)], ["v"]
    )
    out = {tuple(r["keys"]) for r in df.select(
        phonetics_col("v", "soundex_indic").alias("keys")
    ).collect()}
    flat = {k for keys in out for k in keys}
    assert any(k.startswith("I") for k in flat)
    assert "R163" in flat


# --- robustness fuzz ------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=40))
def test_fuzz_never_raises(s):
    out = indic_soundex(s)
    assert isinstance(out, str)
    assert indic_soundex(s) == out
