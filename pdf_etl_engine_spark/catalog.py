"""Testdata catalog: load the driver's parquet tables as DataFrames /
temp views.

The reference locates data by string-building one BigQuery table name
per tenant×folder (`/root/reference/main.py:262-264, 804-806`). The
Spark-native design replaces that with one fact table partitioned by
``(tenant_id, folder_id)`` — table-name construction becomes partition
pruning (SURVEY.md §1.4). This module only handles the driver's
benchmark tables; the ETL-side catalog (folders/shares) lives in
``pipeline.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# events.parquet carries TIMESTAMP(NANOS) — Spark's reader rejects it
# ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw int64 and rebuild a
# microsecond-truncated TIMESTAMP_NTZ with *decimal* arithmetic (the
# int64 nanos exceed 2^53, so any double in the path would corrupt
# timestamps; DECIMAL keeps every step exact, and NTZ keeps results
# independent of the session timezone). DuckDB truncates ns→µs the
# same way, so both engines see identical instants.
_NANOS_TS_EXPR = (
    "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ) + "
    "make_dt_interval(0, 0, 0, CAST(ts div 1000 AS DECIMAL(20,0)) / 1000000)"
)


# DataFrame cache: building a fresh reader per query call re-lists
# files and re-reads parquet footers — ~100-300 ms of driver-side
# planning that dominates sub-second queries. The logical plan is
# immutable, so one DataFrame per (session, sf_dir, table) is safe to
# reuse across queries. Keyed by applicationId, not id(spark): a
# stopped session's address can be reused by a fresh one, which would
# alias stale DataFrames bound to a dead SparkContext.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing exotic physical types.
    Cached per (session, sf_dir, table)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _DF_CACHE.get(key)
    if df is not None:
        return df
    path = table_path(sf_dir, name)
    if name == "events":
        # Scope the legacy flag to this read: the file schema is
        # captured eagerly by spark.read.parquet, so restoring the
        # prior value immediately after keeps later TIMESTAMP(NANOS)
        # reads in the same session failing loudly instead of
        # silently surfacing bigint columns.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.expr(_NANOS_TS_EXPR))
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
    else:
        df = spark.read.parquet(path)
    try:
        small = os.path.getsize(path) <= CACHE_MAX_BYTES
    except OSError:
        small = False
    if small:
        # 8-16 cached partitions measured best locally: enough scan
        # parallelism without per-task dispatch overhead dominating
        # sub-second queries.
        n_parts = min(16, spark.sparkContext.defaultParallelism)
        if name == "events":
            # Cluster the hot event-stream cache by its dominant
            # analysis key: every per-user window/session/as-of query
            # (w0, w123, j7, stw twins) demands
            # ClusteredDistribution(user_id) + sort (user_id, ts,
            # event_id) — laying the cache out that way once lets the
            # planner elide BOTH the exchange and the sort on every
            # such query (hashpartitioning satisfies the requirement
            # at any partition count; InMemoryTableScan preserves the
            # cached plan's ordering). This is the in-memory twin of
            # the production layout: a 100 TB event table is bucketed
            # + sort-ordered by user/entity key on disk for exactly
            # the same shuffle-elision (SURVEY §1.4); the parquet
            # scan path stays measured separately in bench.py's
            # scan-path lane, which bypasses this cache entirely.
            df = df.repartition(n_parts, "user_id").sortWithinPartitions(
                "user_id", "ts", "event_id"
            )
        else:
            df = df.repartition(n_parts)
        df = df.cache()
    _DF_CACHE[key] = df
    return df


# Tables at or below this on-disk size are cached in Spark's in-memory
# columnar store, repartitioned across cores first. Rationale: the
# testdata parquet is single-row-group, so a cold scan is ONE task and
# serializes every downstream kernel onto one core; caching pays that
# serial read once, then every query runs parallel in-memory-columnar.
# This is the standard hot-dimension pattern — at production scale the
# 100 TB fact tables exceed the gate and stay on parquet, keeping
# predicate pushdown and partition pruning on the scan path.
CACHE_MAX_BYTES = 256 * 1024 * 1024


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table. Scans are lazy; Catalyst prunes
    columns/filters at the parquet reader, so loading all is free."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
