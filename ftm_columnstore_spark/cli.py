"""CLI (SURVEY §3 entry 3): the reference exposes ``ftmcs init|optimize``
plus ingest/iterate via the ftmq CLI (reference cli.py:23-47,
tests/test_cli.py:25-44). One spark-submit-able driver with the same verbs:

    python -m ftm_columnstore_spark.cli init   --store /path
    python -m ftm_columnstore_spark.cli write  --store /path --dataset d in.ijson
    python -m ftm_columnstore_spark.cli iterate --store /path [--dataset d] -o out/
    python -m ftm_columnstore_spark.cli optimize --store /path
    python -m ftm_columnstore_spark.cli stats  --store /path
    python -m ftm_columnstore_spark.cli sql    --store /path "select ..."
"""

from __future__ import annotations

import argparse
import json
import sys

from ftm_columnstore_spark.session import get_spark
from ftm_columnstore_spark.store import Store


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ftmcs-spark")
    p.add_argument("--store", required=True, help="store directory (parquet)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("init")
    sub.add_parser("optimize")
    sub.add_parser("stats")

    w = sub.add_parser("write")
    w.add_argument("path", help="FtM entity JSON-lines file/dir")
    w.add_argument("--dataset", default="default")

    it = sub.add_parser("iterate")
    it.add_argument("--dataset", default=None)
    it.add_argument("-o", "--output", default=None, help="output dir (JSON); stdout if omitted")

    sq = sub.add_parser("sql")
    sq.add_argument("query", help="SQL over the `statements` view")

    args = p.parse_args(argv)
    spark = get_spark("ftmcs-cli")
    store = Store(spark, args.store)

    if args.cmd == "init":
        store.ensure()
        print(f"initialized store at {args.store}")
    elif args.cmd == "optimize":
        store.optimize()
        print("compacted")
    elif args.cmd == "stats":
        from ftm_columnstore_spark.operators.aggregations import dataset_stats

        for row in dataset_stats(store.statements()).collect():
            print(json.dumps(row.asDict()))
    elif args.cmd == "write":
        from ftm_columnstore_spark.sources.ftm_json import read_entities

        store.ensure()
        entities = read_entities(spark, args.path, dataset=args.dataset)
        store.write_entities(entities, dataset=args.dataset)
        print(f"wrote {args.path} into {args.store}")
    elif args.cmd == "iterate":
        from ftm_columnstore_spark.operators.assembly import assemble_entities
        from ftm_columnstore_spark.sources.ftm_json import write_entities

        entities = assemble_entities(store.statements(dataset=args.dataset))
        if args.output:
            write_entities(entities, args.output)
        else:
            from pyspark.sql import functions as F

            for row in entities.select(
                F.to_json(F.struct(*entities.columns)).alias("j")
            ).toLocalIterator():
                sys.stdout.write(row["j"] + "\n")
    elif args.cmd == "sql":
        store.statements().createOrReplaceTempView("statements")
        spark.sql(args.query).show(100, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
