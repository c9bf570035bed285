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


# ---------------------------------------------------------------------------
# Timeout-driven sessionization — the second canonical stateful shape
# (r6). Unlike the built-in F.session_window aggregation, the session
# row here is emitted by an EVENT-TIME TIMEOUT when the user's gap
# elapses (hasTimedOut path), which is the pattern every custom
# stateful operator that must act on *absence* of data needs
# (abandoned-cart, connection-liveness, end-of-session features).
# ---------------------------------------------------------------------------

SESSION_OUTPUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
SESSION_STATE = "start timestamp, last timestamp, n long, total double"


def _make_session_updater(gap_s: float):
    gap_ms = int(gap_s * 1000)

    def _row(key, start, last, n, total) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [start],
                "session_end": [last],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield _row(key, start, last, n, total)
            return
        cur = state.get if state.exists else None
        closed = []
        for pdf in pdfs:
            for ts, value in zip(
                pdf.sort_values("ts")["ts"], pdf.sort_values("ts")["value"]
            ):
                if cur is None:
                    cur = (ts, ts, 1, float(value or 0.0))
                elif (ts - cur[1]).total_seconds() * 1000 <= gap_ms:
                    cur = (cur[0], max(cur[1], ts), cur[2] + 1,
                           cur[3] + float(value or 0.0))
                else:  # gap exceeded inside the data: close inline
                    closed.append(cur)
                    cur = (ts, ts, 1, float(value or 0.0))
        if cur is not None:
            state.update(cur)
            # fire once the watermark passes last+gap; clamp above the
            # current watermark (required by the state API)
            last_ms = int(cur[1].timestamp() * 1000)
            state.setTimeoutTimestamp(
                max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        for s in closed:
            yield _row(key, *s)

    return update


def user_sessions(
    events_stream: DataFrame, gap_s: float = 600.0, lateness: str = "1 minute"
) -> DataFrame:
    """(user_id, ts, value) stream → one row per COMPLETED session
    (append mode): a session closes either inline (a new event beyond
    the gap) or via event-time timeout when the watermark passes
    last_event + gap with no new data. State is one 4-tuple per open
    session per user — at 100 TB the keys shard across executors and
    the store is RocksDB per partition; nothing global."""
    return (
        events_stream.withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_updater(gap_s),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters — the r12 Misra–Gries sketch as per-shard
# stateful streaming state (the third canonical stateful shape: a
# BOUNDED-MEMORY summary evolved across micro-batches).
# ---------------------------------------------------------------------------

HH_OUTPUT = "user_id long, cnt long"
HH_STATE = "users array<long>, counts array<long>"


def _make_hh_updater(cap: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from pdf_etl_engine_spark.operators.training import mg_merge

        if state.exists:
            users, counts_arr = state.get
            counts = {int(u): int(c) for u, c in zip(users, counts_arr)}
        else:
            counts = {}
        for pdf in pdfs:
            vc = pdf["user_id"].value_counts()
            counts = mg_merge(
                counts,
                ((int(u), int(c)) for u, c in vc.items()),
                cap,
            )
        state.update(
            (list(counts.keys()), [int(v) for v in counts.values()])
        )
        yield pd.DataFrame(
            {
                "user_id": list(counts.keys()),
                "cnt": [int(v) for v in counts.values()],
            }
        )

    return update


def streaming_heavy_hitters(
    events_stream: DataFrame, cap: int = 4096, shards: int = 8
) -> DataFrame:
    """Frequent-user detection over a live stream: each of ``shards``
    state-store keys holds ONE Misra–Gries summary (state transition =
    `mg_merge`, the same pure function x48's batch kernel uses —
    property-tested absence bound n/(cap+1) carries over verbatim),
    updated per micro-batch and emitted as the current candidate set.

    Why shards, not per-user keys: per-user counts would be the
    built-in streaming aggregation (unbounded state in the distinct
    count); the sketch bounds state at shards × cap rows TOTAL however
    many distinct users the stream carries — the operator you deploy
    to watch for hot keys / abuse on an unbounded-cardinality stream.
    Counts are exact while a shard's distinct count stays ≤ cap, and
    lower bounds with error ≤ n_shard/(cap+1) beyond it (emission
    monotone per user — take max over emissions for the final value).

    Scale: state rides the engine's per-partition state stores keyed
    by shard; Arrow moves per-shard batches; at 100 TB you raise
    shards to spread summaries across executors — memory stays
    shards × cap regardless of stream cardinality."""
    import pyspark.sql.functions as F

    keyed = events_stream.withColumn(
        "shard", (F.col("user_id") % shards).cast("long")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _make_hh_updater(cap),
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
