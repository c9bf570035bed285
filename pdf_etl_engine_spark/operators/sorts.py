"""Sorts / limits / top-k (SURVEY.md §2.6).

T1 is the reference's one real query — `SELECT * FROM {table} ORDER BY
uploaded_at DESC LIMIT 100` (main.py:809). Spark plans ORDER BY+LIMIT
as `TakeOrderedAndProject`: each task keeps a 100-row heap and only
those heaps cross the network — no global sort, no full shuffle, which
is exactly the 100 TB-safe physical shape.

Tie-breaks are explicit everywhere a LIMIT boundary exists, so results
are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.registry import query


@query(
    "t1_results_topk",
    oracle="""
    SELECT * FROM lineitem
    ORDER BY l_shipdate DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def t1_results_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: the reference's results query (main.py:808-811) —
    `uploaded_at` stands in as `l_shipdate`. Physical plan:
    TakeOrderedAndProject (verified in tests)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.orderBy(
        F.desc("l_shipdate"), "l_orderkey", "l_linenumber"
    ).limit(100)


@query(
    "t2_sort_multicol",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def t2_sort_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: deterministic multi-key sort with mixed directions."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(50)
    )


@query(
    "t3_topk_per_group",
    oracle="""
    SELECT user_id, event_id, ts, rn FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def t3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: latest-N per group — what the reference's global LIMIT 100
    (main.py:809) should have been per tenant. One shuffle on the
    partition key; the rank filter prunes before anything wide."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.select(
            "user_id", "event_id", "ts", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )
