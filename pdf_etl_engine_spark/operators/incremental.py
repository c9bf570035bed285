"""Incremental corpus deduplication (SURVEY.md §2.11, X2/X3 extended):
dedup a NEW document batch against an already-accepted corpus without
rescanning the corpus text.

The batch-mode dedup operators (extensions.py x2/x3) compare a table
against itself. A training-data pipeline doesn't work like that: the
corpus is append-only and each incoming batch must be checked against
everything accepted so far. Re-hashing 100 TB of accepted text per
batch is the scale-killer; the standard answer is a FINGERPRINT STORE
— a compact table of per-document content hashes and MinHash band
signatures, maintained incrementally — and dedup becomes two joins
against it:

* exact layer: anti-join on sha2-256 of the normalized text — removes
  byte-identical re-crawls;
* near layer: semi-join of the batch's LSH band signatures against the
  store's — any shared (band_id, band_sig) marks the batch doc as a
  near-dup candidate and drops it (MinHash banding: collision
  probability ≈ 1-(1-j^r)^b for Jaccard j, r rows/band, b bands).

Both joins shuffle on short fixed-width keys (the fingerprints), never
on text; the store is ~64 bytes/doc/band, so a 100 TB corpus's store
fits in a few hundred GB — joinable, and bucketable by key for
shuffle-free probes. Accepting a batch appends its fingerprints to the
store (``fingerprints`` + ``append_rows``), keeping the loop
incremental.

The split used by the registered queries (corpus = ``doc_id % 10 < 7``,
batch = rest) is deterministic and oracle-expressible; the exact layer
is hash-graded against DuckDB (sha-256 collisions are not a practical
concern), the near layer is rows-only (engine-specific hash functions).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.operators.extensions import (
    _BANDS,
    _N_HASHES,
    minhash_signature,
)
from pdf_etl_engine_spark.registry import query
from pdf_etl_engine_spark.scratch import scratch_dir

_ROWS_PER_BAND = _N_HASHES // _BANDS


def _band_sigs(sig_col: str) -> Column:
    """Hash each band's slice of the MinHash signature to one 64-bit
    band signature (same banding as x3_dedup_near_minhash)."""
    return F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig_col, b * _ROWS_PER_BAND + r + 1)
                        for r in range(_ROWS_PER_BAND)
                    ],
                )
            )
            for b in range(_BANDS)
        ]
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document fingerprints: one row per LSH band —
    (id, content_sha, band_id, band_sig). This is the ONLY thing the
    store keeps; text never enters it."""
    sig = docs.select(
        F.col(id_col).alias("fp_id"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
        minhash_signature(F.col("text")).alias("sig"),
    )
    return sig.select(
        "fp_id",
        "content_sha",
        F.posexplode(_band_sigs("sig")).alias("band_id", "band_sig"),
    )


def dedup_against_store(
    batch: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    near: bool = True,
) -> DataFrame:
    """Rows of ``batch`` that survive dedup against the fingerprint
    ``store`` (schema per :func:`fingerprints`). Exact layer always
    runs; ``near=True`` adds the LSH band layer. Both are (semi/anti)
    joins on fingerprint columns — corpus text is never touched."""
    fp = fingerprints(batch, id_col)
    doc_sha = fp.select("fp_id", "content_sha").distinct()
    survive_exact = doc_sha.join(
        store.select("content_sha").distinct(), "content_sha", "left_anti"
    )
    keep = survive_exact.select("fp_id")
    if near:
        near_hit = (
            fp.join(keep, "fp_id", "left_semi")
            .join(
                store.select("band_id", "band_sig").distinct(),
                ["band_id", "band_sig"],
                "left_semi",
            )
            .select("fp_id")
            .distinct()
        )
        keep = keep.join(near_hit, "fp_id", "left_anti")
    return batch.join(
        keep.withColumnRenamed("fp_id", id_col), id_col, "left_semi"
    )


def _corpus_batch(spark: SparkSession, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 < 7),
        docs.filter(F.col("doc_id") % 10 >= 7),
    )


def default_store_dir(sf_dir: str) -> str:
    """Scratch fingerprint store over ``sf_dir``'s corpus split, keyed
    by source identity so regenerated testdata rebuilds it."""
    return scratch_dir("spark_graft_fp_store", table_path(sf_dir, "documents"))


def staged_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: fingerprints materialized once to disk,
    read thereafter (tests/test_incremental.py drives the accept-loop
    against it). NOT used by the registered queries — constructing a
    registered query must schedule no Spark job (repo invariant,
    tests/test_plans.py), so those derive the store lazily instead."""
    out = default_store_dir(sf_dir)
    if not pathlib.Path(out, "_SUCCESS").exists():
        corpus, _ = _corpus_batch(spark, sf_dir)
        fingerprints(corpus).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "x22_incremental_dedup_exact",
    oracle="""
    SELECT b.lang, count(*) AS n_accepted
    FROM documents b
    WHERE b.doc_id % 10 >= 7
      AND NOT EXISTS (SELECT 1 FROM documents c
                      WHERE c.doc_id % 10 < 7 AND c.text = b.text)
    GROUP BY b.lang
    """,
)
def x22_incremental_dedup_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X22: exact layer of incremental dedup — the new batch's sha-256
    anti-joined against the corpus fingerprint relation. The store is
    derived lazily here so query construction stays pure plan-building
    (repo invariant); production maintains it on disk via
    ``staged_store``/``fingerprints`` + ``append_rows`` — the join is
    identical either way. Oracle checks the anti-join semantics via
    direct text comparison."""
    corpus, batch = _corpus_batch(spark, sf_dir)
    store = fingerprints(corpus)
    accepted = dedup_against_store(batch, store, near=False)
    return accepted.groupBy("lang").agg(F.count("*").alias("n_accepted"))


@query("x22b_incremental_dedup_near")  # rows-only: LSH is engine-specific
def x22b_incremental_dedup_near(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X22b: full incremental dedup — exact sha layer plus MinHash
    band semi-join against the store (lazily derived, see x22). A
    batch doc sharing ANY band signature with an accepted doc is
    dropped as a near-dup."""
    corpus, batch = _corpus_batch(spark, sf_dir)
    store = fingerprints(corpus)
    accepted = dedup_against_store(batch, store, near=True)
    return accepted.groupBy("lang").agg(F.count("*").alias("n_accepted"))
