"""Phonetics + name normalization (SURVEY §2.9 X1-X5).

Golden anchor from the reference (tests/test_store.py:50-56):
fingerprint("Tchibo Holding AG") == "ag holding tchibo".
"""

import pytest
from pyspark.sql import functions as F

from ftm_columnstore_spark.functions.phonetics import (
    fingerprint_col,
    metaphone_udf,
    soundex_col,
    tokenize_col,
)


def one(spark, value, col):
    return (
        spark.createDataFrame([(value,)], ["v"])
        .select(col("v").alias("out"))
        .collect()[0]["out"]
    )


def test_fingerprint_reference_golden(spark):
    assert one(spark, "Tchibo Holding AG", fingerprint_col) == "ag holding tchibo"


def test_fingerprint_sorts_tokens(spark):
    assert one(spark, "Tchibo Zentrale Berlin", fingerprint_col) == "berlin tchibo zentrale"


def test_fingerprint_deaccents_and_strips_punct(spark):
    assert one(spark, "Müller & Söhne!", fingerprint_col) == "muller sohne"


def test_fingerprint_optional_legal_form_stripping(spark):
    got = one(
        spark,
        "ACME Holding AG",
        lambda c: fingerprint_col(c, strip_legal_forms=True),
    )
    assert got == "acme"


def test_fingerprint_dedups_tokens(spark):
    assert one(spark, "data data data", fingerprint_col) == "data"


def test_tokenize(spark):
    out = one(spark, "Deutsche Telekom Stiftung", tokenize_col)
    assert "deutsche stiftung telekom" in out
    assert "deutsche" in out and "telekom" in out and "stiftung" in out
    # short tokens are not emitted alone
    out2 = one(spark, "Big Data AG", tokenize_col)
    assert out2 == ["ag big data"]


def test_soundex(spark):
    assert one(spark, "Robert", soundex_col) == "R163"


def test_metaphone_stable(spark):
    # faithful double metaphone: Schmidt and Schmitt block together
    a = one(spark, "Schmidt", metaphone_udf)
    b = one(spark, "Schmitt", metaphone_udf)
    assert a == b == "XMT"
    assert one(spark, "", metaphone_udf) == ""
    assert one(spark, "Peter Maier", metaphone_udf).count(" ") == 1


def test_metaphone_secondary(spark):
    from ftm_columnstore_spark.functions.phonetics import metaphone2_udf

    # Schmidt: primary XMT (germanic), secondary SMT (anglicized)
    assert one(spark, "Schmidt", metaphone2_udf) == "SMT"


def test_phonetics_dispatcher(spark):
    from ftm_columnstore_spark.functions.phonetics import phonetics_col
    import pytest

    out = one(spark, "Deutsche Telekom", lambda c: phonetics_col(c, "fingerprint"))
    assert "deutsche telekom" in out
    assert one(spark, "Robert", lambda c: phonetics_col(c, "soundex")) == ["R163"]
    assert one(spark, "Robert", lambda c: phonetics_col(c, "metaphone1")) == ["RPRT"]
    assert one(spark, "Schmidt", lambda c: phonetics_col(c, "metaphone2")) == ["SMT"]
    with pytest.raises(ValueError):
        phonetics_col("v", "nope")


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_x5_golden_map_covers_testdata_vocabulary(spark, sf):
    """The x5 oracle LEFT-joins the distinct part/region names to the
    hardcoded golden map ``_X5_GOLDEN``; a regenerated testdata
    vocabulary would otherwise surface as a NULL-hash oracle-diff
    puzzle. This makes the failure a named assertion instead: every
    distinct name at every driver SF must have a golden entry."""
    import os

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    sf_dir = f"/root/testdata/{sf}"
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_name").alias("name")
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        F.col("r_name").alias("name")
    )
    names = {r["name"] for r in part.unionByName(region).distinct().collect()}
    missing = sorted(names - set(entry_mod._X5_GOLDEN))
    assert not missing, (
        f"_X5_GOLDEN is missing {len(missing)} names present in {sf}: "
        f"{missing[:10]} — regenerate the golden map (see its comment)"
    )
