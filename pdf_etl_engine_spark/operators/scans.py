"""Scans / sources (SURVEY.md §2.1).

S1 parquet scan, S7 JSON event parsing, S2 binary-document scan. The
scan is where 100 TB is won or lost: Catalyst pushes filters and prunes
columns into the parquet reader, so every downstream operator declares
projections instead of SELECT *-ing; `binaryFile` rows carry content
lazily per file split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.registry import query


@query(
    "s1_scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s1_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: read a fact table (the reference's BQ table read,
    main.py:808-811, as a parquet scan)."""
    return load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )


@query(
    "s7_scan_json_events",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def s7_scan_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: parse the JSON event payload into typed columns — the
    reference's trigger-body parse (main.py:660-662) over the `props`
    column. `get_json_object` evaluates JVM-side (no UDF)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), "$.k").try_cast("int").alias("k_val"),
    )


@query("s2_scan_binary_docs")  # rows-only: DuckDB has no binary file scan
def s2_scan_binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: read raw blobs as rows (`blob.download_as_bytes()`,
    main.py:433, 692) via the binaryFile source. Reads the testdata
    parquet files themselves as opaque blobs; `content` is projected
    away so only (path, length) is materialized."""
    df = spark.read.format("binaryFile").load(f"{sf_dir}/*.parquet")
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return df.select(
        name.alias("file_name"), F.col("length").alias("n_bytes")
    ).orderBy("file_name")
