"""sf1-scale soak of the CORE statement-store spine (VERDICT r5 items 1+2).

Every prior soak replicated documents/events; this one measures the path a
real ftm-columnstore user hits first, at ~1M entities / ~40M statements:

    synth entities -> explode (S2) -> parquet write (S3) -> fingerprint
    side-write (S5) -> dedup-on-read (U2) -> entity assembly (e1) ->
    query DSL (e3/o1) -> stats (m1) -> fpx frequencies (m2) ->
    upsert re-write (u2) -> hot-canonical-id skew probe

The corpus is generated COLUMNAR (spark.range + expressions — no driver
loop, no collected rows): ~39 property values per entity across 8 props +
the synthetic id statement = 40 statements/entity. Value cardinality mixes
unique-per-entity (phone/email/idNumber/alias), shared pools (name parts,
addresses, countries) and text (notes) to mirror FtM reality.

The skew probe isolates the assembly straggler question: the SAME 2M
statements assembled (a) spread over 50k canonical ids and (b) collapsed
onto ONE hot canonical id (the post-resolution mega-entity), with a
duplicate-heavy value profile (what aggressive resolution actually
produces) — partial collect_set should collapse duplicates map-side, so
(b) ought to stay within a small factor of (a). A third variant (c) makes
the hot entity's values UNIQUE per source row — the irreducible case where
the output row itself is ~2M values.

Usage:
    PYTHONPATH=/root/repo python tools/soak_spine.py [n_entities]
(default 1_000_000; use 20_000 for a smoke run)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNTRIES = "de fr at ch pl cz nl be it es pt dk se no fi ee lv lt gb ie".split()


def synth_entities(spark: SparkSession, n: int) -> DataFrame:
    """Columnar FtM corpus: ~39 prop values/entity, Person/Company mix."""
    i = F.col("i")

    def seq(k: int):
        return F.sequence(F.lit(1), F.lit(k))

    def arr(k: int, mk):
        return F.transform(seq(k), mk)

    first = F.concat(F.lit("Fn"), F.pmod(i * 7919, F.lit(50_000)))
    last = F.concat(F.lit("Ln"), F.pmod(i * 104729, F.lit(70_000)))
    name = F.concat_ws(" ", first, last)
    country_pool = F.array(*[F.lit(c) for c in COUNTRIES])

    props = F.map_from_entries(
        F.array(
            F.struct(
                F.lit("name").alias("k"),
                F.array(name, F.concat(last, F.lit(", "), first)).alias("v"),
            ),
            F.struct(
                F.lit("alias").alias("k"),
                arr(6, lambda j: F.concat(F.lit("aka-"), i, F.lit("-"), j)).alias("v"),
            ),
            F.struct(
                F.lit("address").alias("k"),
                arr(
                    6,
                    lambda j: F.concat(
                        F.lit("Street "),
                        F.pmod(i * 13 + j * 7, F.lit(200_000)),
                        F.lit(", Town "),
                        F.pmod(i + j, F.lit(5_000)),
                    ),
                ).alias("v"),
            ),
            F.struct(
                F.lit("country").alias("k"),
                F.array_distinct(
                    F.array(
                        F.element_at(country_pool, (F.pmod(i, F.lit(20)) + 1).cast("int")),
                        F.element_at(country_pool, (F.pmod(i * 3 + 1, F.lit(20)) + 1).cast("int")),
                    )
                ).alias("v"),
            ),
            F.struct(
                F.lit("phone").alias("k"),
                arr(6, lambda j: F.concat(F.lit("+49"), i * 17 + j)).alias("v"),
            ),
            F.struct(
                F.lit("email").alias("k"),
                arr(
                    6,
                    lambda j: F.concat(
                        F.lit("u"), i, F.lit("."), j, F.lit("@example.org")
                    ),
                ).alias("v"),
            ),
            F.struct(
                F.lit("idNumber").alias("k"),
                arr(3, lambda j: F.concat(F.lit("ID-"), i * 31 + j)).alias("v"),
            ),
            F.struct(
                F.lit("notes").alias("k"),
                arr(
                    8,
                    lambda j: F.concat(
                        F.lit("Registered filing number "),
                        i * 7 + j,
                        F.lit(" with supporting documents on record."),
                    ),
                ).alias("v"),
            ),
        )
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "i")
        .select(
            F.concat(F.lit("ent-"), i).alias("id"),
            F.lit(None).cast("string").alias("caption"),
            F.when(F.pmod(i, F.lit(3)) < 2, F.lit("Person"))
            .otherwise(F.lit("Company"))
            .alias("schema"),
            props.alias("properties"),
            F.array(F.concat(F.lit("ds"), F.pmod(i, F.lit(4)))).alias(
                "datasets"
            ),
            F.array().cast("array<string>").alias("referents"),
        )
    )


def hot_statements(
    spark: SparkSession, n_source: int, per_source: int, unique_values: bool,
    canonical: str | None,
) -> DataFrame:
    """2M-ish statements: n_source source entities x per_source values of
    one multi-valued prop, canonicalized onto ONE id when ``canonical``
    is set. unique_values=False mirrors post-resolution reality (heavy
    duplication across merged records); True is the irreducible
    all-distinct worst case."""
    i, j = F.col("i"), F.col("j")
    value = (
        F.concat(F.lit("Street "), i * F.lit(per_source) + j)
        if unique_values
        else F.concat(F.lit("Street "), F.pmod(i * 37 + j * 11, F.lit(10_000)))
    )
    rows = (
        spark.range(n_source)
        .withColumnRenamed("id", "i")
        .select(i, F.explode(F.sequence(F.lit(0), F.lit(per_source - 1))).alias("j"))
    )
    eid = F.concat(F.lit("src-"), i)
    canon = F.lit(canonical) if canonical else eid
    ts = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    return rows.select(
        F.sha1(F.concat_ws(".", F.lit("hot"), eid, F.lit("address"), value)).alias("id"),
        eid.alias("entity_id"),
        canon.alias("canonical_id"),
        F.lit("address").alias("prop"),
        F.lit("address").alias("prop_type"),
        F.lit("Person").alias("schema"),
        value.alias("value"),
        F.lit(None).cast("string").alias("original_value"),
        F.lit("hot").alias("dataset"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(False).alias("target"),
        F.lit(False).alias("external"),
        ts.alias("first_seen"),
        ts.alias("last_seen"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.store import Store
    from ftm_columnstore_spark.operators.assembly import assemble_entities
    from ftm_columnstore_spark.operators.blocking import (
        derive_fingerprints,
        fingerprint_frequencies,
    )
    from ftm_columnstore_spark.operators.aggregations import stats
    from ftm_columnstore_spark.plans.compiler import compile_entities
    from ftm_columnstore_spark.plans.query import Q

    spark = get_spark("soak-spine")
    root = tempfile.mkdtemp(prefix="spine-")
    store = Store(spark, os.path.join(root, "store"))
    out: dict[str, float] = {"n_entities": n}
    t0 = time.time()

    def phase(name: str, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        print(f"[{time.time() - t0:7.1f}s] {name}: {out[name]}s -> {r}")
        return r

    ents = synth_entities(spark, n)

    # S2+S3: explode + clustered parquet write
    phase("write_statements", lambda: store.write_entities(ents))
    # S5: fingerprint side-write, measured separately, fed from disk
    raw = store.statements(deduped=False)
    fpx_path = os.path.join(store.uri, "fpx")
    phase(
        "fingerprint_side_write",
        lambda: derive_fingerprints(raw)
        .repartition("dataset")
        .write.mode("append")
        .partitionBy("dataset")
        .parquet(fpx_path),
    )
    # U2: dedup-on-read
    n_stmts = phase("dedup_read_count", lambda: store.statements().count())
    out["n_statements"] = n_stmts

    # e1: full entity assembly materialized to parquet (the export path —
    # count() would let Catalyst prune the properties map)
    ent_out = os.path.join(root, "entities")
    phase(
        "assembly_e1_export",
        lambda: assemble_entities(store.statements())
        .write.mode("overwrite")
        .parquet(ent_out),
    )

    # e3: query DSL with schema filter + prop comparator, entity-level
    phase(
        "query_e3",
        lambda: compile_entities(
            store.statements(),
            Q().where(schema="Person").where(country="de"),
        ).count(),
    )
    # o1: order by numeric-coerced prop, top-10 slice
    phase(
        "query_o1_topk",
        lambda: len(
            compile_entities(
                store.statements(), Q().order_by("idNumber", ascending=False)[0:10]
            ).collect()
        ),
    )
    # m1: stats report (driver-side bounded dict)
    phase("stats_m1", lambda: stats(store.statements())["entity_count"])
    # m2: fingerprint frequencies
    phase(
        "fpx_freq_m2",
        lambda: fingerprint_frequencies(store.fingerprints()).count(),
    )

    # u2: upsert — re-write 10% of entities (same values, later last_seen),
    # dedup-on-read count must be unchanged
    resel = synth_entities(spark, n // 10)
    phase(
        "upsert_rewrite",
        lambda: store.write_entities(resel, last_seen="2030-01-01 00:00:00"),
    )
    n2 = phase("upsert_reread_count", lambda: store.statements().count())
    assert n2 == n_stmts, f"upsert changed count: {n_stmts} -> {n2}"

    # P5: compaction, then the SAME reads again — the marker lets every
    # post-compaction read skip the corpus-wide dedup shuffle entirely
    phase("optimize_compaction", store.optimize)
    assert store.is_compacted()
    phase("post_compact_read_count", lambda: store.statements().count())
    phase(
        "post_compact_query_e3",
        lambda: compile_entities(
            store.statements(),
            Q().where(schema="Person").where(country="de"),
        ).count(),
    )
    phase(
        "post_compact_assembly_e1",
        lambda: assemble_entities(store.statements())
        .write.mode("overwrite")
        .parquet(ent_out),
    )

    # --- skew probe: same 2M statements, spread vs one hot canonical id ---
    hot_root = os.path.join(root, "hotstore")
    hstore = Store(spark, hot_root)
    for tag, n_source, canonical, uniq in (
        ("spread", 50_000, None, False),
        ("hot_dup", 50_000, "mega-entity-1", False),
        ("hot_unique", 50_000, "mega-entity-1", True),
        # 10M all-distinct values on ONE canonical id: the irreducible
        # worst case (the output row itself is ~10M strings). Last so a
        # blow-up here cannot cost the earlier numbers.
        ("hot_unique_10m", 250_000, "mega-entity-1", True),
    ):
        hstore.drop()
        hstore.write_statements(
            hot_statements(spark, n_source, 40, uniq, canonical)
        )
        probe_out = os.path.join(root, f"probe-{tag}")
        try:
            phase(
                f"skew_assembly_{tag}",
                lambda: assemble_entities(hstore.statements())
                .write.mode("overwrite")
                .parquet(probe_out),
            )
        except Exception as exc:  # noqa: BLE001
            out[f"skew_assembly_{tag}"] = f"FAILED: {exc}"
            print(f"skew_assembly_{tag} FAILED: {exc}")

    out["total"] = round(time.time() - t0, 2)
    print("RESULT " + json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
