"""Release persisted reference artifacts when a stream terminates.

The corpus-index streams (streaming/clean.py, streaming/dedup.py)
persist reference relations — LM counts, gram indexes, banded
signatures — for the life of the StreamingQuery. Without cleanup those
stay cached for the life of the SESSION once the query stops, leaking
executor storage every time a stream is restarted with a refreshed
index. This registers a StreamingQueryListener scoped to one query id
that unpersists the artifacts on termination (normal stop or failure)
and then deregisters itself.

The cached list also stays reachable on ``query._cached_intermediates``
for callers that want to release earlier by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.listener import StreamingQueryListener


def unpersist_on_termination(
    spark: SparkSession, query: StreamingQuery, cached: list[DataFrame]
) -> StreamingQuery:
    """Unpersist ``cached`` when ``query`` terminates; returns the query
    with ``_cached_intermediates`` attached."""
    query._cached_intermediates = cached
    if not cached:
        return query
    qid = str(query.id)

    class _Release(StreamingQueryListener):
        def onQueryStarted(self, event) -> None:
            pass

        def onQueryProgress(self, event) -> None:
            pass

        def onQueryIdle(self, event) -> None:
            pass

        def onQueryTerminated(self, event) -> None:
            if str(event.id) != qid:
                return
            for df in cached:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 — releasing best-effort
                    pass
            try:
                spark.streams.removeListener(self)
            except Exception:  # noqa: BLE001
                pass

    spark.streams.addListener(_Release())
    return query
