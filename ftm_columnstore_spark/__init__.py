"""ftm-columnstore-spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``investigativedata/ftm-columnstore``.

The reference (read-only at ``/root/reference/``) pushes all computation into
a ClickHouse server via generated SQL. This engine expresses the same
semantics as native Spark DataFrame programs over columnar Parquet:

- one statement DataFrame is the source of truth (FIXTURES.md A.3 schema,
  mirrors ``/root/reference/ftm_columnstore/engine.py:129-155``);
- entities, stats, fingerprints and matches are derived DataFrames;
- upsert/dedup is a deterministic dedup-on-read window plus an explicit
  compaction job (vs. the reference's eventual ReplacingMergeTree merges,
  ``engine.py:152``);
- the Query DSL compiles straight to DataFrame expressions — no SQL strings,
  Catalyst is the only optimizer.
"""

from ftm_columnstore_spark.plans.query import Q, Query
from ftm_columnstore_spark.session import get_spark
from ftm_columnstore_spark.store import Store, get_store
from ftm_columnstore_spark.view import View

__version__ = "0.1.0"

__all__ = [
    "Q",
    "Query",
    "Store",
    "View",
    "get_spark",
    "get_store",
    "__version__",
]
