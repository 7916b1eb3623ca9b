"""Streaming xref: incremental candidate-pair generation over a stream of
fingerprint rows (SURVEY §2.10 D2/J5 as a continuous operator).

Batch blocking (``operators/blocking.py:blocking_candidates`` →
``candidate_pairs``; reference ``tests/test_fingerprints.py:4-14``,
``engine.py:176-199``) recomputes all within-block pairs from scratch. Here
the block membership lives in ``applyInPandasWithState`` state keyed by
(algorithm, value): each arriving fingerprint pairs the new entity against
the members already seen, so every micro-batch emits exactly the NEW pairs
— the stream's running union equals the batch result (see
``tests/test_streaming.py::test_streaming_xref_pairs``).

Thresholds mirror the batch operator:

- ``min_entities``: pairs are withheld until a block reaches the floor;
  the batch that crosses it emits all pent-up pairs at once.
- ``max_entities``: a block that grows past the cap is tombstoned (state
  keeps only the count) and emits nothing further. Divergence from batch,
  inherent to no-retraction streaming: pairs emitted while the block was
  still under the cap stay emitted, whereas a batch run over the same
  final data would drop the whole block as a stop-word key.

State is bounded: ≤ ``max_entities`` ids per live key, one count per
tombstoned key — hot stop-word blocks (the 100 TB skew risk) cost O(1).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAIR_SCHEMA = (
    "algorithm string, value string, left_id string, right_id string"
)
STATE_SCHEMA = "ids array<string>, n long"


def _emit_pairs(
    min_entities: int, max_entities: int
) -> "callable":
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ids, n = state.get if state.exists else ([], 0)
        ids = list(ids)
        dead = n > max_entities
        incoming: list[str] = []
        for pdf in pdfs:
            incoming.extend(pdf["entity_id"].tolist())
        new = sorted(set(incoming) - set(ids))
        if not new:
            return
        total_n = n + len(new)
        if dead or total_n > max_entities:
            state.update(([], total_n))
            return
        old_emitted = len(ids) >= min_entities
        total = sorted(set(ids) | set(new))
        rows = []
        if len(total) >= min_entities:
            algorithm, value = key
            for i, a in enumerate(total):
                for b in total[i + 1 :]:
                    # skip pairs already emitted among the old members
                    if old_emitted and a in ids and b in ids:
                        continue
                    rows.append((algorithm, value, a, b))
        state.update((total, total_n))
        if rows:
            yield pd.DataFrame(
                rows, columns=["algorithm", "value", "left_id", "right_id"]
            )

    return update


def streaming_xref_pairs(
    fingerprints: DataFrame,
    min_entities: int = 3,
    max_entities: int = 100,
) -> DataFrame:
    """fpx rows (algorithm, value, entity_id, …) → new candidate pairs per
    micro-batch, left_id < right_id. Works on a streaming OR batch frame
    (batch runs with a fresh empty state per key)."""
    return fingerprints.groupBy("algorithm", "value").applyInPandasWithState(
        _emit_pairs(min_entities, max_entities),
        outputStructType=PAIR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
