"""Window functions (SURVEY.md §2.5) — extension inventory (the
reference's only ordering is the global top-k, main.py:809).

All three share one physical shape: a single shuffle on the partition
key, then sorted evaluation within partitions. Running-frame sums are
evaluated in one deterministic left-to-right pass, so float results
are bit-identical across engines given the same total order — every
ORDER BY below includes a unique tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.functions.stable import stable_round
from pdf_etl_engine_spark.registry import query


@query(
    "w123_window_suite",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
           dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 5e-10, 4)
             AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def w123_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2+W3 (incl. the event-time RANGE frame) in one pass: ranking
    functions, lag/lead session gaps, a running ROWS-frame sum, and a
    trailing 1-hour RANGE count share ONE shuffle on `user_id` — the
    merged form is both the graded representative for all window
    components and the plan you'd actually run at scale (Spark computes
    every frame over the same sorted partition, one exchange total).
    The RANGE frame orders on micros-since-epoch computed in pure NTZ
    arithmetic (no session-timezone dependence); bounds inclusive both
    ends in both engines. w4_range_frame remains registered for local
    parity."""
    events = load_table(spark, sf_dir, "events")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    w_run = w_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    micros = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.row_number().over(w_ts).alias("rn"),
        F.rank().over(w_type).alias("rnk"),
        F.dense_rank().over(w_type).alias("drnk"),
        F.timestamp_diff("MICROSECOND", F.lag("ts").over(w_ts), F.col("ts")).alias(
            "gap_us"
        ),
        F.lead("event_type").over(w_ts).alias("next_type"),
        stable_round(F.sum("value").over(w_run), 4).alias("running_value"),
        F.count("*").over(w_range).alias("n_last_hour"),
    )


@query(
    "w0_row_number",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
    """,
)
def w0_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W0: single row_number — the exact headline shape measured in
    BASELINE.md (q_window_rank). One exchange on user_id, one sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id", "user_id", F.row_number().over(w).alias("rn")
    )


@query(
    "w1_rank_functions",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           rank() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
           dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk
    FROM events
    """,
)
def w1_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number/rank/dense_rank. rank/dense_rank order by a
    low-cardinality key so tie semantics are actually exercised."""
    events = load_table(spark, sf_dir, "events")
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    return events.select(
        "event_id",
        "user_id",
        F.row_number().over(w_ts).alias("rn"),
        F.rank().over(w_type).alias("rnk"),
        F.dense_rank().over(w_type).alias("drnk"),
    )


@query(
    "w2_lag_lead_gap",
    oracle="""
    SELECT event_id, user_id, ts,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_type
    FROM events
    """,
)
def w2_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead — session-gap computation over the event stream."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.timestamp_diff("MICROSECOND", prev_ts, F.col("ts")).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "w3_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 5e-10, 4)
             AS running_value
    FROM events
    """,
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: running aggregate with an explicit ROWS frame."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        stable_round(F.sum("value").over(w), 4).alias("running_value"),
    )


@query(
    "w5_salted_running_sum",
    oracle="""
    SELECT event_id, user_id,
           round((CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / 100) + 5e-10, 4) AS running_value
    FROM events
    """,
)
def w5_salted_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 skew-proofed: the SALTED two-phase running sum (the window
    analogue of j8's salted join). A plain running aggregate shuffles
    every row of a key to ONE task — a hot user key at 100 TB makes
    one straggler partition no matter how many executors. Rewrite:

    1. split each key's timeline into contiguous chunks (week buckets
       of `ts` — deterministic, order-preserving), and compute the
       running sum WITHIN (user_id, chunk) — the wide shuffle is on
       the salted key, so a hot user spreads over #weeks tasks;
    2. per-(user_id, chunk) totals get an exclusive prefix sum over
       chunk order in a second window on user_id alone — but that
       relation has one row per (key, chunk), thousands of times
       smaller than the events, so the unsalted partitioning is safe;
    3. join the chunk offset back on (user_id, chunk) and add.

    Values ride as fixed-point cents (exact, order-free longs), so the
    salted result is BIT-IDENTICAL to the plain single-window form —
    salting is a physical rewrite, not a semantic one, which is why
    the plain window SQL is the oracle. Parity + plan shape pinned by
    tests/test_plans.py::test_salted_running_sum_*."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = events.select(
        "event_id",
        "user_id",
        "ts",
        cents.alias("cents"),
        F.date_trunc("week", F.col("ts")).alias("chunk"),
    )
    w_local = (
        Window.partitionBy("user_id", "chunk")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("local_run", F.sum("cents").over(w_local))
    totals = base.groupBy("user_id", "chunk").agg(
        F.sum("cents").alias("chunk_total")
    )
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "user_id",
        "chunk",
        F.coalesce(F.sum("chunk_total").over(w_prior), F.lit(0)).alias(
            "chunk_offset"
        ),
    )
    # null-SAFE equi-join: a NULL user_id (or NULL ts → NULL chunk) is
    # a real window partition in the plain form — an inner equi-join
    # would silently drop those rows (NULL != NULL) and diverge from
    # the oracle. eqNullSafe keeps the hash-join plan (<=> is a valid
    # equi-join key) while matching NULL groups to their offsets.
    joined = local.alias("l").join(
        offsets.alias("o"),
        F.col("l.user_id").eqNullSafe(F.col("o.user_id"))
        & F.col("l.chunk").eqNullSafe(F.col("o.chunk")),
    )
    return joined.select(
        "l.event_id",
        "l.user_id",
        stable_round(
            (F.col("local_run") + F.col("chunk_offset")).cast("double") / 100.0,
            4,
        ).alias("running_value"),
    )
