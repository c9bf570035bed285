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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing exotic physical types."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr(_NANOS_TS_EXPR))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table. Scans are lazy; Catalyst prunes
    columns/filters at the parquet reader, so loading all is free."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
