"""Streaming-cleanup throughput soak (VERDICT r6 item 5; §2.11).

streaming/clean.py composes the full ingest-time pipeline (Gopher gate
-> reference-LM screen -> corpus near-dup drop -> ExactSubstr span cut)
behind one foreachBatch stream; it is correctness-tested but was never
RATE-measured. This gives it the same treatment the statement-ingest
soak got:

- a 1M-doc backfill drained availableNow in bounded micro-batches,
  recording end-to-end docs/sec, per-batch wall (first vs steady), and
  survivor counts per stage boundary (gate kills, LM kills, near-dup
  kills, span cuts — measured once post-hoc from the outputs);
- the corpus-index build (LM counts + gram index + banded signatures
  over a 50k-doc reference corpus, persisted at stream start) timed
  separately — the amortization story: the build is paid ONCE, each
  micro-batch then joins against the cached relations;
- per-stage standalone batch timings over one batch-sized slice, so
  the stream's per-batch wall decomposes into attributable stage costs.

State: this stream has no Spark stateful operator — its "state" is the
persisted reference artifacts, whose row counts (constant across
batches, independent of stream length) are recorded.

Corpus = soak_pipeline.expand's 10x salted replication of the sf0.1
documents table (50k docs). The STREAM must be mostly NOVEL relative
to the corpus (a replica-only stream is ~all near-dups and the drop
stage empties the pipeline — measured in the first smoke run), so each
stream doc is the CONCATENATION of two different base docs (Jaccard to
either half ~0.5, below the 0.8 drop line -> survives near-dup, but
every half is a corpus 8-gram run -> the span cut does real work),
with every 10th replica a pure salted copy (true near-dup minority
that the drop stage must catch). 1M docs = 50 JSON files -> 5
files/micro-batch = ~100k docs/batch.

Run: PYTHONPATH=/root/repo python tools/soak_clean_stream.py [factor=200]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("n_chars", IntegerType()),
    ]
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 50
FILES_PER_TRIGGER = 5
CLEAN_CONF = dict(
    quality=dict(min_tokens=5, min_stopwords=0, min_alnum_ratio=0.5),
    max_bits_per_bigram=18.0,
    near_dedup=dict(num_hashes=32, num_bands=8, shingle_k=3,
                    min_jaccard_est=0.8),
    substring_k=8,
)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from soak_pipeline import expand
    from ftm_columnstore_spark.session import get_spark
    from ftm_columnstore_spark.streaming.clean import (
        stream_clean_against_corpus,
    )

    spark = get_spark("soak-clean-stream")
    root = tempfile.mkdtemp(prefix="cleanstream-")
    out: dict = {}
    t0 = time.time()

    def phase(name: str, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        print(f"[{time.time() - t0:7.1f}s] {name}: {out[name]}s", flush=True)
        return r

    corpus_path = phase("build_corpus_50k", lambda: expand(spark, 10))
    corpus = spark.read.parquet(corpus_path).select(
        "doc_id", "text", "lang", "n_chars"
    )
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_base = base.count()
    src = os.path.join(root, "src")

    def build_stream():
        reps = spark.range(factor).select(F.col("id").alias("rep"))
        partner = base.select(
            F.col("doc_id").alias("p_id"), F.col("text").alias("p_text")
        )
        mixed = (
            base.crossJoin(reps)
            .withColumn(
                "p_id", (F.col("doc_id") + F.col("rep") + 1) % n_base
            )
            .join(partner, on="p_id")  # 5k-row side: AQE broadcasts
            .select(
                (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
                F.when(
                    F.col("rep") % 10 == 0,
                    F.concat_ws(
                        " ", "text", F.concat(F.lit("rep"), F.col("rep"))
                    ),
                )
                .otherwise(
                    F.concat_ws(
                        " ", "text", "p_text",
                        F.concat(F.lit("mix"), F.col("rep")),
                    )
                )
                .alias("text"),
                "lang",
            )
            .withColumn("n_chars", F.length("text").cast("int"))
        )
        mixed.repartition(N_FILES).write.json(src)

    phase(f"build_stream_{factor}x_json", build_stream)
    n_stream = spark.read.schema(DOC_SCHEMA).json(src).count()
    out["n_stream_docs"] = n_stream

    # --- index-build amortization: the stream_clean call itself builds +
    # persists LM counts, gram index and banded signatures before
    # .start() returns (each persist is count()-forced at build time)
    sink = os.path.join(root, "clean_out")
    t_build = time.time()
    q = stream_clean_against_corpus(
        spark,
        src,
        corpus,
        sink,
        os.path.join(root, "ckpt"),
        DOC_SCHEMA,
        available_now=True,
        max_files_per_trigger=FILES_PER_TRIGGER,
        **CLEAN_CONF,
    )
    out["index_build_s"] = round(time.time() - t_build, 2)
    print(f"index build (LM+grams+signatures): {out['index_build_s']}s",
          flush=True)

    batch_walls: list[float] = []
    seen: set = set()
    t1 = time.time()
    while q.isActive:
        p = q.lastProgress
        if p and p["batchId"] not in seen and p.get("batchDuration"):
            seen.add(p["batchId"])
            batch_walls.append(round(p["batchDuration"] / 1000.0, 2))
        time.sleep(0.5)
    q.awaitTermination()
    drain = round(time.time() - t1, 2)
    survivors = spark.read.parquet(sink)
    n_out = survivors.count()
    out.update(
        drain_s=drain,
        docs_per_sec=int(n_stream / drain),
        n_batches=len(batch_walls),
        batch_walls_s=batch_walls,
        n_survivors=n_out,
        survivor_frac=round(n_out / n_stream, 4),
        n_cut_docs=survivors.filter(
            F.length("text") < F.col("n_chars")
        ).count(),
    )
    print(json.dumps({k: out[k] for k in
                      ("drain_s", "docs_per_sec", "n_batches",
                       "n_survivors", "survivor_frac")}), flush=True)

    # --- per-stage standalone attribution over ONE batch-sized slice ----
    batch = (
        spark.read.schema(DOC_SCHEMA).json(src)
        .sample(fraction=FILES_PER_TRIGGER / N_FILES, seed=7)
        .persist()
    )
    n_batch = batch.count()
    out["attribution_slice_docs"] = n_batch

    from ftm_columnstore_spark.operators.dedup import (
        _band_relation,
        corpus_gram_index,
        cross_pairs_from_banded,
        exact_substring_dedup_cross,
        minhash_signature,
        rewrite_cut_text,
    )
    from ftm_columnstore_spark.operators.text import (
        quality_gate,
        score_with_bigram_lm,
        train_bigram_lm,
    )

    c2, c1, vocab = train_bigram_lm(corpus)
    c2, c1 = c2.persist(), c1.persist()
    grams = corpus_gram_index(corpus, "text", "doc_id", 8).persist()
    banded = _band_relation(
        minhash_signature(corpus, "text", "doc_id", 32, 3), 8
    ).persist()
    out["index_rows"] = {
        "lm_bigrams": c2.count(),
        "lm_unigrams": c1.count(),
        "gram_index": grams.count(),
        "banded_signatures": banded.count(),
    }

    phase(
        "stage_quality_gate",
        lambda: quality_gate(batch, **CLEAN_CONF["quality"])
        .where(F.col("keep")).count(),
    )
    phase(
        "stage_lm_screen",
        lambda: score_with_bigram_lm(batch, (c2, c1, vocab))
        .where(F.col("bits_per_bigram") > CLEAN_CONF["max_bits_per_bigram"])
        .count(),
    )
    nd = CLEAN_CONF["near_dedup"]
    phase(
        "stage_near_dup",
        lambda: cross_pairs_from_banded(
            _band_relation(
                minhash_signature(batch, "text", "doc_id",
                                  nd["num_hashes"], nd["shingle_k"]),
                nd["num_bands"],
            ),
            banded,
            nd["min_jaccard_est"],
        ).select("new_id").distinct().count(),
    )
    phase(
        "stage_span_cut",
        lambda: rewrite_cut_text(
            batch,
            exact_substring_dedup_cross(
                batch, corpus_grams=grams, k=8, within_batch=False
            ),
            "text",
            "doc_id",
        ).count(),
    )
    out["total_s"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree("/tmp/soak_docs_10", ignore_errors=True)


if __name__ == "__main__":
    main()
