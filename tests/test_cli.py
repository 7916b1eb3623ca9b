"""CLI round-trip (reference tests/test_cli.py:20-44 analogue)."""

import json

from ftm_columnstore_spark.cli import main


def test_cli_write_iterate_roundtrip(spark, tmp_path, capsys):
    src = tmp_path / "in.ijson"
    entities = [
        {"id": f"e{i}", "schema": "Company",
         "properties": {"name": [f"Firm {i}"]},
         "datasets": ["cli_ds"], "referents": []}
        for i in range(4)
    ]
    src.write_text("\n".join(json.dumps(e) for e in entities))
    store = str(tmp_path / "store")

    assert main(["--store", store, "init"]) == 0
    assert main(["--store", store, "write", str(src), "--dataset", "cli_ds"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "iterate", "--dataset", "cli_ds"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 4
    parsed = sorted(json.loads(line)["id"] for line in out)
    assert parsed == ["e0", "e1", "e2", "e3"]
    # double write + optimize keeps counts stable
    assert main(["--store", store, "write", str(src), "--dataset", "cli_ds"]) == 0
    assert main(["--store", store, "optimize"]) == 0
    capsys.readouterr()
    assert main(["--store", store, "iterate"]) == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 4


def test_cli_clean_and_shard(spark, tmp_path, capsys):
    import json as _json

    from ftm_columnstore_spark.cli import main

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some words repeated words {i % 3}")
         for i in range(40)] + [(100, "document number 0 with some words "
                                      "repeated words 0")],  # near-exact noise
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)

    out = str(tmp_path / "cleaned")
    assert main(["clean", src, "-o", out, "--min-tokens", "3",
                 "--substring-k", "8", "--splits", "train=0.9,val=0.1"]) == 0
    got = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["in"] == 41 and 0 < got["kept"] <= 41
    back = spark.read.parquet(out)
    assert set(back.columns) >= {"doc_id", "text", "split"}

    shards = str(tmp_path / "shards")
    assert main(["clean", src, "-o", shards, "--shards", "4"]) == 0
    lines = [_json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    # doc 100 is an exact text duplicate of doc 0 -> always-on exact
    # dedup keeps 40 of the 41 inputs
    assert sum(r["n_rows"] for r in lines) == 40


def test_cli_profile(tmp_path, capsys, spark):
    import json as _json

    from ftm_columnstore_spark.cli import main

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "a", "y")], "i int, k string, v string"
    )
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    assert main(["profile", path, "--columns", "k,v"]) in (0, None)
    out = capsys.readouterr().out.strip().splitlines()
    rows = {r["column"]: r for r in map(_json.loads, out)}
    assert rows["k"]["n_values"] == 3 and rows["k"]["n_nulls"] == 0
    assert rows["v"]["n_values"] == 2 and rows["v"]["n_nulls"] == 1
    assert rows["k"]["n_distinct_est"] == 2
