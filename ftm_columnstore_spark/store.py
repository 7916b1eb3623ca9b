"""Parquet-backed statement store (SURVEY §2.1 S3-S11, §1.4, §4 P1/P5).

Replaces the reference's ClickHouse ``ReplacingMergeTree`` table
(``engine.py:129-155``) with:

- **append-only parquet writes**, hive-partitioned by ``dataset`` (the
  reference's scoping unit, engine.py:140) so dataset filters become
  partition pruning, sorted within partitions by ``canonical_id`` so
  parquet row-group min/max stats skip on entity lookups — the Spark
  analogue of the reference's clustered primary key (engine.py:153-154);
- **dedup-on-read**: the ReplacingMergeTree(last_seen) upsert contract
  (equal sort key → keep max last_seen, engine.py:152) as a deterministic
  window — no "eventual" semantics, no 5s sleeps (tests/test_store.py:83);
- **compaction** (``optimize()``): the ``OPTIMIZE TABLE … FINAL DEDUPLICATE``
  analogue (engine.py:114-125) — rewrites the store with the same window so
  subsequent reads skip the dedup shuffle.

At 100TB: appends are embarrassingly parallel; the dedup window shuffles on
``canonical_id`` which is also the write-sort key, and AQE handles skewed
entities. Readers that don't touch re-written entities pay nothing after
compaction.
"""

from __future__ import annotations

import os
import shutil
from functools import cache

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ftm_columnstore_spark import settings
from ftm_columnstore_spark.model.schemas import (
    STATEMENT_COLUMNS,
    STATEMENT_KEY,
    STATEMENT_SCHEMA,
)
from ftm_columnstore_spark.sources.statements import entities_to_statements


def dedup_statements(df: DataFrame) -> DataFrame:
    """ReplacingMergeTree semantics (SURVEY §1.4, §2.8 U2): rows equal on
    the statement key collapse to the max ``last_seen``.

    Implemented as groupBy + max(struct(last_seen, other_cols)) — a hash
    aggregate with map-side partial combine — rather than a row_number
    window: no per-partition sort, measured ~2× faster on doubled sf0.1
    lineitem and strictly better at scale (partial aggregation collapses
    duplicates before the shuffle; a window must shuffle every row)."""
    others = [c for c in df.columns if c not in STATEMENT_KEY]
    winner = F.max(
        F.struct(F.col("last_seen").alias("__v"), *[F.col(c) for c in others])
    ).alias("__m")
    return (
        df.groupBy(*STATEMENT_KEY)
        .agg(winner)
        .select(*STATEMENT_KEY, *[F.col(f"__m.{c}").alias(c) for c in others])
        .select(*df.columns)
    )


class Store:
    """A statement store rooted at a parquet directory."""

    def __init__(self, spark: SparkSession, uri: str | None = None):
        self.spark = spark
        self.uri = uri or settings.STORE_URI
        self._path = os.path.join(self.uri, "statements")
        self._marker = os.path.join(self.uri, "_compacted")
        self._canonical: DataFrame | None = None

    # --- compaction marker ---------------------------------------------------
    # After optimize() the on-disk rows are unique on STATEMENT_KEY, so
    # the dedup-on-read groupBy collapses nothing — yet it still costs a
    # full corpus shuffle on EVERY read (measured: the sf1 spine soak's
    # e3 query paid the 40M-row dedup twice). The marker records "store
    # is dedup-clean"; any append invalidates it (cleared BEFORE the
    # append commits, so a crash mid-write can only cost an extra dedup,
    # never a silently-skipped one). The fast path applies ONLY when no
    # resolver is installed: the content-hash ``id`` excludes
    # canonical_id, so two on-disk rows distinct only in canonical_id
    # (written at different resolution states) share an id — a resolver
    # remap CAN merge them into equal keys, and that read must dedup
    # (round-8 self-review finding, regression-tested).
    def _set_compacted(self) -> None:
        with open(self._marker, "w") as fh:
            fh.write("1")

    def _clear_compacted(self) -> None:
        if os.path.exists(self._marker):
            os.remove(self._marker)

    def is_compacted(self) -> bool:
        """True iff the compaction marker exists AND no file under the
        statement path is newer than it — any out-of-band append (a
        streaming sink writing into ``statements/`` directly, another
        process's writer) invalidates the fast path even if it never
        touched the marker. The walk is driver-side local-fs metadata
        (~ms for thousands of files), paid once per DataFrame build,
        not per row."""
        if not os.path.exists(self._marker):
            return False
        try:
            marker_mtime = os.path.getmtime(self._marker)
            for dirpath, _dirs, files in os.walk(self._path):
                for fn in files:
                    if (
                        os.path.getmtime(os.path.join(dirpath, fn))
                        > marker_mtime
                    ):
                        return False
        except OSError:
            # a file vanished mid-walk: a writer is active — not clean
            return False
        return True

    # --- DDL (S8, S9) -------------------------------------------------------
    def ensure(self) -> None:
        os.makedirs(self.uri, exist_ok=True)

    def drop(self) -> None:
        shutil.rmtree(self._path, ignore_errors=True)
        self._clear_compacted()

    def exists(self) -> bool:
        return os.path.exists(self._path)

    # --- write path (S2-S5) -------------------------------------------------
    def write_statements(
        self, df: DataFrame, mode: str = "append", cluster: bool = True
    ) -> None:
        """Append statements, partitioned by dataset, entity-clustered.

        ``cluster=False`` skips the repartition+sort and appends the
        incoming partitioning as-is — the streaming ingest path uses
        it because a per-micro-batch shuffle+sort costs ~3.5× drain
        throughput (measured: 860k → 243k statements/s at sf1) for
        clustering that the next ``optimize()`` rebuilds anyway;
        until then, unclustered appends only weaken row-group
        min/max pruning on the NEW files, never correctness."""
        out = df.select(*STATEMENT_COLUMNS)
        # an append may re-write existing statement keys — reads must
        # dedup again until the next optimize(); cleared FIRST so a
        # crash between the job commit and the marker update fails safe
        self._clear_compacted()
        if cluster:
            out = out.repartition("dataset", "canonical_id").sortWithinPartitions(
                "canonical_id", "entity_id", "prop", "value"
            )
        out.write.mode(mode).partitionBy("dataset").parquet(self._path)

    def write_entities(
        self,
        entities: DataFrame,
        dataset: str = "default",
        last_seen: str | None = None,
        with_fingerprints: bool = False,
    ) -> None:
        """S2+S5: explode entities to statements; optionally derive the
        phonetic fingerprint side table in the same job (the reference
        writes fpx rows with every batch, store.py:59-60)."""
        stmts = entities_to_statements(
            entities, default_dataset=dataset, last_seen=last_seen
        )
        if with_fingerprints:
            stmts = stmts.persist()
        self.write_statements(stmts)
        if with_fingerprints:
            from ftm_columnstore_spark.operators.blocking import (
                derive_fingerprints,
            )

            (
                derive_fingerprints(stmts)
                .repartition("dataset")
                .write.mode("append")
                .partitionBy("dataset")
                .parquet(os.path.join(self.uri, "fpx"))
            )
            stmts.unpersist()

    def fingerprints(self) -> DataFrame:
        """The fpx side table (empty frame if never written)."""
        from ftm_columnstore_spark.model.schemas import FPX_SCHEMA

        path = os.path.join(self.uri, "fpx")
        if not os.path.exists(path):
            return self.spark.createDataFrame([], FPX_SCHEMA)
        # fpx rows carry no version column; re-written batches dedup on
        # read by full-row distinct (cheap: dictionary-encoded columns).
        return self.spark.read.schema(FPX_SCHEMA).parquet(path).distinct()

    # --- read path (S6, F1) ---------------------------------------------------
    def statements(
        self,
        dataset: str | list[str] | None = None,
        deduped: bool = True,
        as_of: str | None = None,
    ) -> DataFrame:
        """The statement table. ``dataset`` may be one name or a catalog
        (list) of names — either way the predicate prunes the hive
        partitions, so a catalog view only scans its member datasets
        (reference: store over a catalog, tests/test_store.py:72-75).

        ``as_of`` time-travels the upsert log: the append-only layout
        plus dedup-on-read means "state at time T" is just the same
        max-``last_seen`` reduction restricted to versions written by T —
        a pushed-down min/max-prunable predicate, no snapshot copies
        (the ReplacingMergeTree analogue keeps only the latest row, so
        the reference cannot answer this at all).

        History horizon: ``optimize()`` physically destroys superseded
        versions (like OPTIMIZE FINAL), so a post-compaction
        ``as_of=T`` read returns the compacted SURVIVORS filtered by
        ``last_seen <= T`` — not the historical state at T. Rows stay
        unique and the result is a consistent subset, but versions
        overwritten before the compaction are gone; keep compaction
        cadence coarser than the oldest ``as_of`` you need
        (test_store pins this semantic).

        The compacted fast path is decided once at DataFrame BUILD
        time (lazy plans keep it even if an append lands before an
        action runs), and the marker check is not atomic against
        concurrent writers in other processes — consistent with the
        store's single-writer design."""
        if not self.exists():
            return self.spark.createDataFrame([], STATEMENT_SCHEMA)
        df = self.spark.read.schema(STATEMENT_SCHEMA).parquet(self._path)
        if isinstance(dataset, str):
            df = df.filter(F.col("dataset") == dataset)
        elif dataset is not None:
            df = df.filter(F.col("dataset").isin(list(dataset)))
        if as_of is not None:
            df = df.filter(
                F.col("last_seen") <= F.to_timestamp(F.lit(as_of))
            )
        df = self._apply_canonical(df)
        if deduped and self._canonical is None and self.is_compacted():
            # compacted store, no resolver: rows already unique on
            # STATEMENT_KEY — skip the corpus-wide dedup shuffle (the
            # compaction payoff). With a resolver installed the remap
            # can merge rows distinct only in canonical_id (shared
            # content-hash id), so that read takes the dedup path.
            return df
        return dedup_statements(df) if deduped else df

    def view(self, dataset: str | None = None):
        """Reference-parity accessor: ``store.view()`` → query facade."""
        from ftm_columnstore_spark.view import View

        return View(self, dataset)

    def writer(self) -> "Store":
        """Reference-parity alias (the store itself is the writer)."""
        return self

    # --- canonicalization (J3, D5) -------------------------------------------
    def set_resolver(self, canonical_map: DataFrame | None) -> None:
        """Install an entity_id → canonical_id mapping (nomenklatura
        Resolver analogue, store.py:25-28). Broadcast-joined at read."""
        if canonical_map is not None:
            canonical_map = canonical_map.select("entity_id", "canonical_id")
        self._canonical = canonical_map

    def _apply_canonical(self, df: DataFrame) -> DataFrame:
        if self._canonical is None:
            return df
        # resolver maps scale with the resolved-entity count; AQE
        # broadcasts small ones and falls back to sort-merge on the
        # clustered key for big ones (matches README scale posture)
        cmap = self._canonical.withColumnRenamed("canonical_id", "__canon")
        return (
            df.drop("canonical_id")
            .join(cmap, on="entity_id", how="left")
            .withColumn("canonical_id", F.coalesce("__canon", "entity_id"))
            .drop("__canon")
            .select(*STATEMENT_COLUMNS)
        )

    def to_bucketed_table(
        self, table: str = "statements_bucketed", buckets: int = 64
    ) -> None:
        """P1/P2 at cluster scale: materialize the (deduped) statement
        table as a managed table bucketed+sorted on ``canonical_id``.
        Every downstream groupBy/join keyed on canonical_id (entity
        assembly, dedup window, point lookups, canonical-map joins) then
        plans with ZERO Exchange — the bucketed scan already satisfies the
        clustered distribution. Size ``buckets`` ≈ table_size / 128MB."""
        (
            self.statements()
            .write.mode("overwrite")
            .bucketBy(buckets, "canonical_id")
            .sortBy("canonical_id")
            .saveAsTable(table)
        )

    def bucketed_statements(self, table: str = "statements_bucketed") -> DataFrame:
        return self.spark.table(table)

    def build_value_index(self) -> None:
        """P2: the ONE reference projection worth materializing (the
        reference keeps a value-sorted projection for reverse lookups,
        engine.py:236-262; the other 11 are redundant under Catalyst).
        The main table is clustered by canonical_id, so a reverse lookup
        (``value = X``) must scan every row group; this second copy holds
        only entity-reference statements, range-partitioned and sorted by
        ``value`` — a point lookup prunes to one file via parquet
        min/max, independent of corpus size. Derived artifact: rebuild
        after bulk writes or resolver changes (like the reference's
        OPTIMIZE, staleness is operational, not a correctness risk —
        readers fall back to the main table when absent)."""
        path = os.path.join(self.uri, "value_index")
        tmp = path + ".build"
        (
            self.statements()
            .filter(F.col("prop_type") == "entity")
            .repartitionByRange(F.col("value"))
            .sortWithinPartitions("value")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # same rename-aside discipline as _promote (derived artifact, so
        # a crash here is harmless either way — readers fall back to the
        # main table when the index is absent)
        old = path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def value_index(self) -> DataFrame | None:
        """The value-clustered reverse-lookup copy, or None if not built."""
        path = os.path.join(self.uri, "value_index")
        if not os.path.exists(path):
            return None
        return self.spark.read.schema(STATEMENT_SCHEMA).parquet(path)

    def entity_refs(self) -> DataFrame:
        """Entity-reference statements (``prop_type='entity'``), served
        from the value index when built (file-pruned point lookups),
        falling back to a filtered scan of the main table."""
        idx = self.value_index()
        if idx is not None:
            return idx
        return self.statements().filter(F.col("prop_type") == "entity")

    def register_views(self, prefix: str = "") -> None:
        """Expose the store to ``spark.sql``: ``<prefix>statements`` (deduped)
        and ``<prefix>entities`` (assembled) temp views."""
        from ftm_columnstore_spark.operators.assembly import assemble_entities

        stmts = self.statements()
        stmts.createOrReplaceTempView(f"{prefix}statements")
        assemble_entities(stmts).createOrReplaceTempView(f"{prefix}entities")

    # --- maintenance (P5) -----------------------------------------------------
    def _promote(self, tmp: str) -> None:
        """Swap a fully-written rewrite into place. Old dir is renamed
        ASIDE first (two cheap renames), then removed — a crash leaves
        either the old store live or both ``tmp`` and ``.old`` intact
        for manual recovery; data is never inside an in-progress
        ``rmtree``. Single-writer assumption: rewrites are not atomic
        for concurrent readers in OTHER processes (same-process reads
        re-list files per action and are fine after the swap)."""
        old = self._path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self._path, old)
        os.rename(tmp, self._path)
        shutil.rmtree(old)

    def optimize(self) -> None:
        """Compaction: rewrite the store deduplicated (OPTIMIZE FINAL).

        Destroys superseded versions — see ``statements()`` for the
        ``as_of`` history-horizon consequence. Single-writer: no other
        process may write (or hold mid-job reads) during the swap."""
        if not self.exists():
            return
        tmp = self._path + ".compact"
        deduped = dedup_statements(
            self.spark.read.schema(STATEMENT_SCHEMA).parquet(self._path)
        )
        (
            deduped.repartition("dataset", "canonical_id")
            .sortWithinPartitions("canonical_id", "entity_id", "prop", "value")
            .write.mode("overwrite")
            .partitionBy("dataset")
            .parquet(tmp)
        )
        self._promote(tmp)
        self._set_compacted()

    def changed_statements(self, since: str) -> DataFrame:
        """Delta read: statements (re)written after ``since`` — the
        change-feed primitive for incremental downstream refresh."""
        return self.statements().filter(F.col("last_seen") > F.to_timestamp(F.lit(since)))

    def changed_entities(self, since: str) -> DataFrame:
        """Whole entities touched after ``since`` (changed statements →
        semi-join back to all statements → assemble)."""
        from ftm_columnstore_spark.operators.assembly import assemble_entities

        ids = self.changed_statements(since).select("canonical_id").distinct()
        # ids is the incremental change set — usually tiny (AQE
        # broadcasts it) but unbounded after a full rewrite
        scoped = self.statements().join(
            ids, on="canonical_id", how="left_semi"
        )
        return assemble_entities(scoped)

    def pop(self, entity_id: str) -> list:
        """S11: return an entity's statements and rewrite the store without
        them (the reference's ``writer.pop`` has DELETE commented out for
        lack of GRANTs, store.py:63-71; a parquet rewrite needs none)."""
        popped = self.statements().filter(
            (F.col("entity_id") == entity_id)
            | (F.col("canonical_id") == entity_id)
        ).collect()
        if not popped:
            return []
        kept = dedup_statements(
            self.spark.read.schema(STATEMENT_SCHEMA).parquet(self._path)
        ).filter(
            (F.col("entity_id") != entity_id)
            & (F.col("canonical_id") != entity_id)
        )
        tmp = self._path + ".pop"
        (
            kept.repartition("dataset", "canonical_id")
            .sortWithinPartitions("canonical_id", "entity_id", "prop", "value")
            .write.mode("overwrite")
            .partitionBy("dataset")
            .parquet(tmp)
        )
        self._promote(tmp)
        # the pop rewrite runs through dedup_statements — the survivor
        # set is clean on STATEMENT_KEY
        self._set_compacted()
        return popped

    # --- iteration (S6, S7) ----------------------------------------------------
    def iterate_statements(self, dataset: str | None = None):
        yield from self.statements(dataset).sort("canonical_id").toLocalIterator()


@cache
def get_store(uri: str | None = None) -> Store:
    from ftm_columnstore_spark.session import get_spark

    store = Store(get_spark(), uri)
    store.ensure()
    return store
