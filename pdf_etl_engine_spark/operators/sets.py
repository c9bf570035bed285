"""Set operations (SURVEY.md §2.7) — extension inventory.

U1 `unionByName(allowMissingColumns=True)` is also the mechanism behind
S5 schema evolution: old rows read NULL for columns they predate
(main.py:274-291 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.registry import query


@query(
    "u1_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS entity_name,
           c_acctbal AS acctbal, c_mktsegment AS segment,
           'customer' AS entity_kind
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, s_acctbal, NULL, 'supplier'
    FROM supplier
    """,
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: schema-aligned union; the supplier side lacks `segment` and
    reads NULL — exactly how evolved tables surface pre-evolution rows
    (S5, main.py:277-291)."""
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("entity_kind"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("entity_kind"),
    )
    return customer.unionByName(supplier, allowMissingColumns=True)


@query(
    "u23_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, o_custkey AS custkey FROM (
      SELECT o_custkey FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    UNION ALL
    SELECT 'except' AS op, c_custkey AS custkey FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
)
def u23_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2+U3 graded together: distinct intersection (BUILDING customers
    with orders) and set difference (customers who never ordered),
    tagged by op. Each branch is a shuffle-distinct; the union is a
    free concatenation of partitions (no extra exchange)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    inter = orders.intersect(building).select(
        F.lit("intersect").alias("op"), "custkey"
    )
    diff = customer.subtract(
        load_table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("custkey")
        )
    ).select(F.lit("except").alias("op"), "custkey")
    return inter.unionByName(diff)


@query(
    "u123_set_suite",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment,
           'customer' AS op
    FROM customer
    UNION ALL
    SELECT s_suppkey, NULL, 'supplier' FROM supplier
    UNION ALL
    SELECT custkey, NULL, 'intersect' FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    UNION ALL
    SELECT c_custkey, NULL, 'except' FROM (
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders
    )
    """,
)
def u123_set_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+U2+U3 graded together: schema-evolving union, distinct
    intersection, and set difference in one result, tagged by `op`.
    The supplier / intersect / except branches lack the `segment`
    column and surface NULL through `unionByName(allowMissingColumns=
    True)` — exactly how evolved tables read pre-evolution rows (S5,
    main.py:277-291). Each set branch is a shuffle-distinct; the final
    union is a free concatenation of partitions (no extra exchange).
    u1/u23 remain registered for local parity."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    cust = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("op"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("custkey"),
        F.lit("supplier").alias("op"),
    )
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    inter = orders.intersect(building).select(
        "custkey", F.lit("intersect").alias("op")
    )
    diff = (
        customer.select(F.col("c_custkey").alias("custkey"))
        .subtract(orders)
        .select("custkey", F.lit("except").alias("op"))
    )
    out = cust
    for branch in (supp, inter, diff):
        out = out.unionByName(branch, allowMissingColumns=True)
    return out


@query(
    "u2_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: distinct intersection (customers with orders ∩ BUILDING)."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    return orders.intersect(building)


@query(
    "u3_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: set difference — customers who never ordered."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.subtract(orders)


@query(
    "u5_bag_set_ops",
    oracle="""
    SELECT 'intersect_all' AS op, custkey,
           CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT ALL
      SELECT c_custkey FROM customer
    ) GROUP BY custkey
    UNION ALL
    SELECT 'except_all', custkey, CAST(count(*) AS BIGINT)
    FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer
    ) GROUP BY custkey
    """,
)
def u5_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 (late r6): BAG-semantics set operations — INTERSECT ALL
    keeps min(multiplicity) per row across the inputs, EXCEPT ALL
    subtracts multiplicities — the SQL-standard ALL variants the
    distinct-only u2/u3 suite doesn't exercise (a customer with 9
    orders survives EXCEPT ALL 8 times, not 0). Spark's native
    ``intersectAll``/``exceptAll`` plan these as a single aggregate
    computing per-key counts on both sides then replicating min/diff
    — one shuffle, no join explosion; the output collapses the bags
    to (key, multiplicity) so the graded result is bounded and
    order-free."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    ia = (
        orders.intersectAll(cust)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "custkey", "n")
    )
    ea = (
        orders.exceptAll(cust)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "custkey", "n")
    )
    return ia.unionByName(ea)
