"""Self-check: run every __spark_entry__ query against its DuckDB oracle
(the driver's t2 gate, approximated). Usage:

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir]

Compares row count, sorted column names, and order-insensitive values
(floats to 1e-9 relative). Exits non-zero on any mismatch.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount {len(spark_pdf)} != {len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
        )
        return problems
    dtype_mism = [
        f"{c}: {spark_pdf[c].dtype} != {oracle_pdf[c].dtype}"
        for c in spark_pdf.columns
        if str(spark_pdf[c].dtype) != str(oracle_pdf[c].dtype)
    ]
    if dtype_mism:
        problems.append("dtypes " + "; ".join(dtype_mism))
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = pd.to_numeric(a[c], errors="coerce")
            bv = pd.to_numeric(b[c], errors="coerce")
            bad = ~(
                (av.isna() & bv.isna())
                | ((av - bv).abs() <= 1e-9 + 1e-9 * bv.abs())
            )
        else:
            bad = a[c].astype(str) != b[c].astype(str)
        if bad.any():
            i = bad.idxmax()
            problems.append(
                f"value mismatch col={c} row={i}: {a[c][i]!r} != {b[c][i]!r}"
            )
            break
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from ftm_columnstore_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match")
    print(f"\n{len(queries) - failures}/{len(queries)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
