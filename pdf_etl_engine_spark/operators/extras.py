"""Inventory stragglers: F15 math basics, U4 map→rows UDTF shape,
cube, range window frames, exact percentiles (SURVEY.md §2.4, §2.5,
§2.8, §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_engine_spark.catalog import load_table
from pdf_etl_engine_spark.functions.stable import stable_round
from pdf_etl_engine_spark.registry import query


@query(
    "f15_math_basics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 5e-10, 2)
             AS charged,
           round(abs(l_discount - l_tax) + 5e-10, 4) AS disc_tax_gap,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 50 = 0
    """,
)
def f15_math_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: arithmetic / round / abs / floor / modulo as row
    expressions (the TPC-H charged-amount shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 50 == 0)
    ).select(
        "l_orderkey",
        "l_linenumber",
        stable_round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            2,
        ).alias("charged"),
        stable_round(F.abs(F.col("l_discount") - F.col("l_tax")), 4).alias(
            "disc_tax_gap"
        ),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
    )


@query(
    "u4_explode_map_long",
    oracle="""
    SELECT event_id, 'k' AS kpi_name,
           json_extract_string(props, '$.k') AS kpi_value
    FROM events
    WHERE event_id % 10 = 0
    """,
)
def u4_explode_map_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 (UDTF shape): one row per (row, map entry) — the per-KPI
    long format the reference's wide row build inverts
    (/root/reference/main.py:726-741). `explode(from_json(...))` is
    the built-in generator; no Python UDTF needed."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    kv = ev.select(
        "event_id",
        F.explode(F.from_json(F.col("props"), "map<string,string>")).alias(
            "kpi_name", "kpi_value"
        ),
    )
    return kv


@query(
    "a5b_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a5b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: full cube — all grouping-set combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "w4_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
             AS n_last_hour
    FROM events
    """,
)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 variant: event-time RANGE frame — trailing 1-hour activity
    count per user (the rate-limit / rolling-metric shape)."""
    ev = load_table(spark, sf_dir, "events")
    # order on micros-since-epoch computed in pure NTZ arithmetic
    # (no session-timezone dependence); RANGE bounds inclusive both
    # ends in both engines.
    micros = F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        F.col("ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(micros)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
    )


@query(
    "a7_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5) + 5e-10, 4) AS p50,
           round(quantile_cont(value, 0.9) + 5e-10, 4) AS p90,
           round(CAST(max(value) AS DOUBLE) + 5e-10, 4) AS vmax
    FROM events GROUP BY event_type
    """,
)
def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: exact linear-interpolated percentiles per group (both
    engines implement continuous quantiles identically on sorted
    doubles). The 100 TB path is `approx_percentile` (t-digest-style
    sketch, a4's estimator family) — exact form here for the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        stable_round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50"),
        stable_round(F.percentile(F.col("value"), F.lit(0.9)), 4).alias("p90"),
        stable_round(F.max("value"), 4).alias("vmax"),
    )


@query(
    "a8_grouping_sets",
    oracle="""
    SELECT event_type, CAST(user_id % 10 AS BIGINT) AS cohort, count(*) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def a8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 family: explicit grouping sets — per-type totals, per-cohort
    totals, and the grand total in one aggregation pass."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 10
    )
    # DataFrame-native grouping sets (Spark 4): no shared temp-view
    # name, so concurrent invocations in one session can't race.
    return ev.groupingSets(
        [["event_type"], ["cohort"], []], "event_type", "cohort"
    ).agg(F.count("*").alias("n"))


@query(
    "x29_resample_ffill",
    oracle="""
    WITH ev AS (
      SELECT * FROM events WHERE event_id % 97 = 0
    ), per AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n_events,
             arg_max(value, CAST(epoch(ts) AS BIGINT) * 1000000000
                            + event_id) AS last_value
      FROM ev GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM ev
    ), spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM ev) t,
           bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS s(h)
    )
    SELECT sp.event_type, sp.h,
           coalesce(p.n_events, 0) AS n_events,
           round(last_value(p.last_value IGNORE NULLS)
                   OVER (PARTITION BY sp.event_type ORDER BY sp.h
                         ROWS UNBOUNDED PRECEDING) + 5e-10, 4)
             AS value_ffill
    FROM spine sp
    LEFT JOIN per p ON sp.event_type = p.event_type AND sp.h = p.h
    """,
)
def x29_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29: time-series resample + gap fill — the hypertable/
    `time_bucket_gapfill` shape every monitoring query needs: a dense
    hourly spine per series (event_type), observed buckets carry their
    count and LAST observation (deterministic tiebreak on
    (epoch-second, event_id)), empty buckets read 0 events and the forward-filled
    previous value (`last_value IGNORE NULLS`). Events are thinned to
    every-97th id so the fixture actually HAS gaps to fill at test SF.

    Scale shape: per-bucket aggregation is one shuffle with map-side
    partials; the spine is #series × #buckets rows built from a
    broadcast 1-row bounds aggregate (never the raw events), the fill
    window partitions by series (parallel across series, O(buckets)
    per partition). At 100 TB you'd bound the spine by the query's
    time range — exactly what this plan does with min/max."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 97 == 0
    )
    hr = F.date_trunc("hour", F.col("ts"))
    # deterministic "last observation" tiebreak: a single scalar key
    # (epoch second * 1e9 + event_id) both engines compute identically
    # — DuckDB's arg_max can't order by a composite
    per = ev.groupBy(F.col("event_type"), hr.alias("h")).agg(
        F.count("*").alias("n_events"),
        F.expr(
            "max_by(value, unix_seconds(cast(ts as timestamp))"
            " * 1000000000L + event_id)"
        ).alias("last_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = spine.join(per, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        stable_round(
            F.last("last_value", ignorenulls=True).over(w), 4
        ).alias("value_ffill"),
    )


@query(
    "x30_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 1 HOUR
      GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= c.t2 + INTERVAL 1 HOUR
      GROUP BY 1
    )
    SELECT 'step1_view' AS step, count(*) AS n_users FROM v
    UNION ALL SELECT 'step2_click', count(*) FROM c
    UNION ALL SELECT 'step3_purchase', count(*) FROM p
    """,
)
def x30_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30: ordered funnel — users who viewed, then clicked within an
    hour of their first view, then purchased within an hour of that
    click. Each stage is a per-user min-timestamp aggregate joined
    forward with the event-time ordering constraint — the canonical
    product-analytics query (Amplitude/Mixpanel funnels).

    Scale shape: each stage scans only its event_type (predicate
    pushed to the parquet scan), aggregates per user map-side, and the
    stage joins are hash joins on user_id — per-stage cost shrinks
    monotonically down the funnel. No window over the raw event
    stream, so nothing resorts 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr("interval 1 hour")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + hour))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("step"), F.count("*").alias("n_users")
        )

    return (
        stage(v, "step1_view")
        .unionByName(stage(c, "step2_click"))
        .unionByName(stage(p, "step3_purchase"))
    )


@query(
    "x31_retention_cohorts",
    oracle="""
    WITH firstw AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY 1
    ), act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, a.w) / 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN firstw f USING (user_id)
    GROUP BY 1, 2
    """,
)
def x31_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X31: weekly retention cohorts — users grouped by the week of
    their first event, counted in every later week they were active:
    the triangle matrix behind every retention dashboard.

    Scale shape: two per-user aggregates (first week, distinct active
    weeks — both map-side-combined on the user_id shuffle), a hash
    join on user_id, and a small final aggregate over cohort×offset
    cells. Week truncation keeps both engines Monday-aligned, so the
    day-difference is an exact multiple of 7 (integer offset, no
    float)."""
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    return (
        act.join(firstw, "user_id")
        .groupBy("cohort", (
            F.datediff(F.col("w"), F.col("cohort")) / 7
        ).cast("bigint").alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
