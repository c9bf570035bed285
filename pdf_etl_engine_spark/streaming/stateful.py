"""Custom stateful streaming operator — `applyInPandasWithState`.

The reference has no stateful processing at all (SURVEY.md §2.9); this
is the extension surface for operators the built-in aggregations can't
express: arbitrary per-key state evolved across micro-batches with
explicit timeout control. Example operator: per-user running profile
(event count, value total, last-seen timestamp) that survives query
restarts via the checkpoint — the building block for online feature
stores and session enrichment over the `events` stream.

State is a tuple per user; Arrow moves whole per-key batches, so the
Python cost is per key-batch, not per row. At 100 TB the state store
is RocksDB-backed per partition and keys shard across executors by the
groupBy key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "n long, total double, last_seen timestamp"


def _update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_seen = state.get
    else:
        n, total, last_seen = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if last_seen is None or (batch_max is not None and batch_max > last_seen):
            last_seen = batch_max
    state.update((n, total, last_seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [last_seen],
        }
    )


def user_running_profile(events_stream: DataFrame) -> DataFrame:
    """(user_id, ts, value) stream → one updated profile row per user
    per micro-batch, state carried across batches/restarts."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
