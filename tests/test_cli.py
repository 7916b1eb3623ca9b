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
