"""Bucket-partitioned ANN index: the storage-side half of X4's
similarity search (SURVEY.md §2.11).

``x4b_ann_lsh_topk`` computes LSH buckets at query time, so every probe
still scans all embedding rows before the bucket semi-join filters
them. That is fine as a *query* but wrong as a *serving topology*: at
100 TB the bucket assignment must be paid once, at write time, and a
probe must touch only the partitions holding the query's buckets.

This module makes that real:

* :func:`build_ann_index` explodes each vector into its L (table,
  bucket) slots and writes parquet **partitioned by (t, b)** — the
  Hive-style layout Spark prunes statically. Build cost is one
  shuffle-free write with ×L row amplification (L=12 here); at scale
  the index is maintained incrementally by appending each new batch's
  exploded rows into the same partition tree.
* :func:`probe_ann_index` evaluates the query vector's L buckets
  driver-side (one row — this is the serving path's O(L) work), turns
  them into literal ``(t = …, b = …)`` disjuncts, and reads the index
  with that predicate. ``.explain`` shows the buckets under
  ``PartitionFilters`` and the scan touches ≤ L of the n_tables × 2^k
  partition directories; only the candidate set pays the exact cosine
  rescore. tests/test_ann_index.py pins both the pruning and the
  equivalence to x4b's answer.

The reference service has no vector path at all; this extends its
/get-results top-k idea (main.py:808-811) to embedding space.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.functions.stable import stable_round
from pdf_etl_engine_spark.operators.extensions import (
    _as_double,
    _dot,
    _lsh_buckets,
)
from pdf_etl_engine_spark.registry import query
from pdf_etl_engine_spark.scratch import scratch_dir

# Same (k, L) operating point as x4b — see its docstring for the
# recall math on this near-uniform testdata.
N_TABLES = 12
N_BITS = 3


def build_ann_index(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
) -> None:
    """Write the LSH index table: one row per (vector, table), parquet
    partitioned by (t, b) so probes prune directories, not rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.explode(_lsh_buckets(n_tables, n_bits)).alias("tb"),
    ).select(
        F.col("tb.t").alias("t"),
        F.col("tb.b").alias("b"),
        "vec_id",
        "label",
        "embedding",
    )
    # Shuffle on the partition key before the partitioned write: each
    # writer task then owns whole (t, b) cells, so the layout is one
    # file per cell instead of (tasks × cells) small files — the
    # standard small-files guard for partitioned tables.
    idx.repartition("t", "b").write.mode("overwrite").partitionBy(
        "t", "b"
    ).parquet(out_dir)


def probe_ann_index(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec_id`` via the partitioned
    index: candidate read touches only the query's L bucket
    partitions."""
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == query_vec_id)
    # Serving-path driver work: L bucket ids for ONE vector. This
    # collect is O(L), not O(n) — it is what turns the probe into
    # literal partition predicates Spark can prune statically.
    buckets = (
        qrow.select(F.explode(_lsh_buckets(N_TABLES, N_BITS)).alias("tb"))
        .select("tb.t", "tb.b")
        .collect()
    )
    # unknown query id ⇒ no buckets ⇒ empty candidate set (not a crash)
    pred = F.lit(False)
    for r in buckets:
        pred = pred | (
            (F.col("t") == int(r["t"])) & (F.col("b") == int(r["b"]))
        )
    cand_ids = (
        spark.read.parquet(index_dir)
        .filter(pred)
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )
    qv = qrow.select(_as_double(F.col("embedding")).alias("qv"))
    e = _as_double(F.col("embedding"))
    scored = (
        emb.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            stable_round(
                _dot(e, F.col("qv"))
                / (
                    F.sqrt(_dot(e, e))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                4,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), "vec_id").limit(k)


def default_index_dir(sf_dir: str) -> str:
    """Scratch location for the index over ``sf_dir``'s embeddings,
    keyed by source identity (path + mtime + size) so regenerated
    testdata re-indexes instead of reusing a stale build."""
    return scratch_dir(
        "spark_graft_ann_index",
        table_path(sf_dir, "embeddings"),
        f"{N_TABLES}x{N_BITS}",
    )


@query("x4f_ann_index_topk")  # rows-only: approximate by design
def x4f_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4f: ANN probe against the bucket-partitioned index — builds
    the index on first use (write-once), then answers from ≤ L pruned
    partitions. Same (k, L) as x4b, so the candidate set — and hence
    the answer — is identical; only the I/O shape differs."""
    index_dir = default_index_dir(sf_dir)
    if not pathlib.Path(index_dir, "_SUCCESS").exists():
        build_ann_index(spark, sf_dir, index_dir)
    return probe_ann_index(spark, sf_dir, index_dir)
