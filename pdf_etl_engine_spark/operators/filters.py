"""Projections / filters / predicates (SURVEY.md §2.2).

P1-P6: the reference's row-visibility logic — path predicates guarding
ingest (main.py:664-669), sentinel normalization (main.py:224-225),
equality predicates and the owner/shared/shares permission check
(main.py:796-802). All pure Column expressions → predicate pushdown and
partition pruning apply unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.functions import kernel
from pdf_etl_engine_spark.operators import synth
from pdf_etl_engine_spark.registry import query


@query("p1_project_all", oracle="SELECT * FROM nation")
def p1_project_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: SELECT * (main.py:809)."""
    return load_table(spark, sf_dir, "nation").select("*")


@query(
    "p2_project_rename_sanitized",
    oracle=f"""
    SELECT p_partkey,
           {synth.sql_sanitize_ident('p_type')} AS kpi_type,
           {synth.sql_sanitize_ident('p_brand')} AS kpi_brand
    FROM part
    """,
)
def p2_project_rename_sanitized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: project values under sanitized identifiers — the
    `kpi_{sanitized}` naming kernel (F1, main.py:281, 733) applied as a
    column expression."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        kernel.sanitize_ident(F.col("p_type")).alias("kpi_type"),
        kernel.sanitize_ident(F.col("p_brand")).alias("kpi_brand"),
    )


@query(
    "p3_filter_path_predicates",
    oracle=f"""
    WITH paths AS (SELECT doc_id, {synth.PATH_EXPR} AS file_path FROM documents)
    SELECT doc_id, file_path,
           string_split(file_path, '/')[2] AS uid,
           string_split(file_path, '/')[3] AS folder_id
    FROM paths
    WHERE file_path NOT LIKE '%processed/%'
      AND file_path NOT LIKE '%.placeholder%'
      AND lower(file_path) LIKE '%.pdf'
      AND len(string_split(file_path, '/')) >= 5
      AND string_split(file_path, '/')[1] = 'incoming'
      AND string_split(file_path, '/')[4] = 'batch'
    """,
)
def p3_filter_path_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: the ingest guard (main.py:664-669): drop `processed/`,
    `.placeholder`, non-`.pdf`; require `incoming/{uid}/{folder}/batch/…`
    (≥5 segments). Then bind uid/folder from the path (main.py:671-672).
    """
    docs = load_table(spark, sf_dir, "documents")
    paths = docs.select("doc_id", F.expr(synth.PATH_EXPR).alias("file_path"))
    p = kernel.path_parts(F.col("file_path"))
    return (
        paths.filter(
            ~F.col("file_path").contains("processed/")
            & ~F.col("file_path").contains(".placeholder")
            & F.lower(F.col("file_path")).endswith(".pdf")
            & (p["n_parts"] >= 5)
            & (p["root"] == "incoming")
            & (p["kind"] == "batch")
        )
        .withColumn("uid", p["uid"])
        .withColumn("folder_id", p["folder_id"])
    )


@query(
    "p4_filter_eq_conj",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
)
def p4_filter_eq_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: conjunctive equality predicates (`folderId==x AND
    ownerId==y`, main.py:543, 799). Both predicates push down to the
    parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "p5_null_sentinels",
    oracle=f"""
    WITH vals AS (SELECT p_partkey, {synth.SENTINEL_EXPR} AS raw_value FROM part)
    SELECT p_partkey, {synth.sql_null_sentinels('raw_value')} AS clean_value
    FROM vals
    """,
)
def p5_null_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: normalize the reference's sentinels `'' / N/A / ---` to NULL
    (main.py:167, 224-225)."""
    part = load_table(spark, sf_dir, "part")
    vals = part.select("p_partkey", F.expr(synth.SENTINEL_EXPR).alias("raw_value"))
    return vals.select(
        "p_partkey", kernel.null_sentinels(F.col("raw_value")).alias("clean_value")
    )


@query(
    "p6_filter_permission",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders o
    WHERE o.o_custkey = 7
       OR EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')
    """,
)
def p6_filter_permission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: permission-filtered visibility (main.py:796-802): a row is
    visible iff the requester is the owner OR a matching share row
    exists. Owners stand in as `o_custkey`; the `shares` dimension is
    the BUILDING-segment customers. The share probe is a broadcast
    LEFT SEMI join — at 100 TB the ACL side stays tiny, so no shuffle
    of the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    shares = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    owner = orders.filter(F.col("o_custkey") == 7)
    shared = orders.join(F.broadcast(shares), "o_custkey", "left_semi")
    visible = owner.unionByName(shared).dropDuplicates(["o_orderkey"])
    return visible.select("o_orderkey", "o_custkey", "o_orderstatus")
