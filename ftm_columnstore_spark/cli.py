"""CLI (SURVEY §3 entry 3): the reference exposes ``ftmcs init|optimize``
plus ingest/iterate via the ftmq CLI (reference cli.py:23-47,
tests/test_cli.py:25-44). One spark-submit-able driver with the same verbs:

    python -m ftm_columnstore_spark.cli init   --store /path
    python -m ftm_columnstore_spark.cli write  --store /path --dataset d in.ijson
    python -m ftm_columnstore_spark.cli iterate --store /path [--dataset d] -o out/
    python -m ftm_columnstore_spark.cli optimize --store /path
    python -m ftm_columnstore_spark.cli stats  --store /path
    python -m ftm_columnstore_spark.cli sql    --store /path "select ..."

Extension verb for the training-data side (documents parquet in,
cleaned parquet or hash shards out):

    python -m ftm_columnstore_spark.cli clean docs.parquet -o out/ \
        [--min-tokens N] [--substring-k K] [--near-dedup] \
        [--splits train=0.9,val=0.1] [--shards N]
"""

from __future__ import annotations

import argparse
import json
import sys

from ftm_columnstore_spark.session import get_spark
from ftm_columnstore_spark.store import Store


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ftmcs-spark")
    p.add_argument("--store", default=None,
                   help="store directory (parquet); required for store verbs")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("init")
    op = sub.add_parser("optimize")
    op.add_argument("--dataset", action="append", default=None,
                    help="compact only this dataset partition (repeatable); "
                         "partial runs keep dedup-on-read active")
    op.add_argument("--slices", type=int, default=1,
                    help="hash-of-canonical_id slices per dataset rewrite "
                         "(bounds shuffle scratch; result is identical)")
    sub.add_parser("stats")

    w = sub.add_parser("write")
    w.add_argument("path", help="FtM entity JSON-lines file/dir")
    w.add_argument("--dataset", default="default")

    it = sub.add_parser("iterate")
    it.add_argument("--dataset", default=None)
    it.add_argument("-o", "--output", default=None, help="output dir (JSON); stdout if omitted")

    sq = sub.add_parser("sql")
    sq.add_argument("query", help="SQL over the `statements` view")

    pr = sub.add_parser("profile")
    pr.add_argument("input", help="parquet file/dir to profile")
    pr.add_argument("--columns", default=None,
                    help="comma list (default: every column)")
    pr.add_argument("-p", type=int, default=8,
                    help="HLL precision (2^p registers; default 8)")

    cl = sub.add_parser("clean")
    cl.add_argument("input", help="documents parquet (id + text columns)")
    cl.add_argument("-o", "--output", required=True)
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--min-tokens", type=int, default=None,
                    help="enable the quality gate at this token floor")
    cl.add_argument("--substring-k", type=int, default=None,
                    help="enable ExactSubstr span cutting at this k "
                         "(cuts spans out of the original text; "
                         "untouched documents are preserved verbatim)")
    cl.add_argument("--near-dedup", action="store_true",
                    help="enable MinHash near-dedup (defaults)")
    cl.add_argument("--splits", default=None,
                    help="comma list name=weight (adds a split column)")
    cl.add_argument("--shards", type=int, default=None,
                    help="write N hash shards instead of plain parquet")

    args = p.parse_args(argv)
    if args.cmd not in ("clean", "profile") and not args.store:
        p.error(f"--store is required for the {args.cmd} verb")
    spark = get_spark("ftmcs-cli")
    store = Store(spark, args.store) if args.store else None

    if args.cmd == "init":
        store.ensure()
        print(f"initialized store at {args.store}")
    elif args.cmd == "optimize":
        store.optimize(datasets=args.dataset, slices=args.slices)
        print("compacted" if args.dataset is None
              else f"compacted datasets: {', '.join(args.dataset)}")
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
    elif args.cmd == "profile":
        from ftm_columnstore_spark.operators.sketches import profile_columns

        pdf = spark.read.parquet(args.input)
        cols = args.columns.split(",") if args.columns else None
        for row in (
            profile_columns(pdf, cols, p=args.p).orderBy("column").collect()
        ):
            print(json.dumps(row.asDict()))
    elif args.cmd == "clean":
        from ftm_columnstore_spark.operators.pipeline import (
            prepare_training_data,
        )

        docs = spark.read.parquet(args.input)
        splits = None
        if args.splits:
            splits = {
                k: float(v)
                for k, v in (p.split("=") for p in args.splits.split(","))
            }
        cleaned = prepare_training_data(
            docs,
            text_col=args.text_col,
            id_col=args.id_col,
            quality=(
                # neutralize every OTHER gate rule: the flag promises a
                # token floor, not the full English-tuned Gopher config
                # (alnum/word-length defaults would drop non-Latin docs)
                {"min_tokens": args.min_tokens, "max_tokens": 10**12,
                 "min_stopwords": 0, "min_mean_word_len": 0.0,
                 "max_mean_word_len": 1e9, "min_alnum_ratio": 0.0}
                if args.min_tokens is not None
                else None
            ),
            line_dedup_sep=None,
            substring_dedup=(
                {"k": args.substring_k}
                if args.substring_k is not None
                else None
            ),
            near_dedup={} if args.near_dedup else None,
            splits=splits,
        )
        if args.shards:
            from ftm_columnstore_spark.operators.sampling import (
                write_training_shards,
            )

            manifest = write_training_shards(
                cleaned, args.output, args.shards,
                id_col=args.id_col, text_col=args.text_col,
            )
            for row in manifest.collect():
                print(json.dumps(row.asDict()))
        else:
            cleaned.write.mode("overwrite").parquet(args.output)
            # count the WRITTEN files — recounting `cleaned` would
            # re-execute the whole pipeline
            kept = spark.read.parquet(args.output).count()
            print(
                json.dumps(
                    {"in": docs.count(), "kept": kept, "out": args.output}
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
