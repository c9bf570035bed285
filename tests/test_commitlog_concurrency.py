"""Commit-log concurrency pins (VERDICT r4 #5): the hard-link version
claim under racing writers, and vacuum's in-flight-append grace window.
The protocol (writers.py) is Delta-style optimistic concurrency — these
tests pin that the design actually holds under simultaneous writers."""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import functions as F

from pdf_etl_engine_spark.sources import writers


def test_publish_commit_race_disjoint_versions(tmp_path):
    """32 threads publishing concurrently: every commit lands, versions
    are the dense sequence 0..31 with no duplicates, and every file
    list survives intact (the hard-link claim loses cleanly and
    retries on the next number)."""
    path = str(tmp_path / "table")
    n_threads, per_thread = 8, 4
    results: list[tuple[str, int]] = []
    lock = threading.Lock()
    start = threading.Barrier(n_threads)

    def writer(tid: int) -> None:
        start.wait()
        for i in range(per_thread):
            tag = f"t{tid}-{i}"
            v = writers._publish_commit(path, [f"{tag}.parquet"])
            with lock:
                results.append((tag, v))

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    versions = sorted(v for _, v in results)
    assert versions == list(range(n_threads * per_thread))
    # every commit's file list is intact and attributed to one version
    files = writers.committed_files(path)
    assert sorted(files) == sorted(
        f"{tag}.parquet" for tag, _ in results
    )


def test_append_rows_race_no_file_loss(tmp_path, spark):
    """Two simultaneous append_rows on the same table: both commits
    publish, the snapshot holds the union of both row sets, and
    replaying either txn afterwards is a no-op."""
    path = str(tmp_path / "facts")
    df_a = spark.range(0, 50).select(
        F.lit("tA").alias("tenant_id"), F.lit("f").alias("folder_id"),
        F.col("id").alias("v"),
    )
    df_b = spark.range(100, 150).select(
        F.lit("tB").alias("tenant_id"), F.lit("f").alias("folder_id"),
        F.col("id").alias("v"),
    )
    errs: list[Exception] = []
    start = threading.Barrier(2)

    def run(df, txn):
        try:
            start.wait()
            assert writers.append_rows(df, path, txn=txn)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    t1 = threading.Thread(target=run, args=(df_a, ("w1", 0)))
    t2 = threading.Thread(target=run, args=(df_b, ("w2", 0)))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    entries = writers._commit_entries(path)
    assert [v for v, _ in entries] == [0, 1]
    got = writers.read_fact_table(spark, path)
    assert got.count() == 100
    assert sorted(
        r["v"] for r in got.filter(F.col("tenant_id") == "tA").collect()
    ) == list(range(0, 50))
    # idempotent replay of both writers
    assert writers.append_rows(df_a, path, txn=("w1", 0)) is False
    assert writers.append_rows(df_b, path, txn=("w2", 0)) is False
    assert got.count() == 100


def test_vacuum_grace_protects_inflight_append(tmp_path, spark):
    """Vacuum at the grace boundary: a data file moved into the layout
    but not yet published (the append's in-flight window) survives a
    concurrent vacuum, and its later commit reads clean. Only an
    UNREFERENCED file older than the grace window is reclaimed."""
    path = str(tmp_path / "facts")
    base = spark.range(0, 10).select(
        F.lit("t1").alias("tenant_id"), F.lit("f").alias("folder_id"),
        F.col("id").alias("v"),
    )
    assert writers.append_rows(base, path)

    # simulate an in-flight append: stage files into the layout
    # WITHOUT publishing (exactly _stage_files' post-move state)
    inflight = spark.range(10, 20).select(
        F.lit("t1").alias("tenant_id"), F.lit("f").alias("folder_id"),
        F.col("id").alias("v"),
    )
    staged = writers._stage_files(inflight, path)
    assert staged

    removed = writers.vacuum_fact_table(path, min_age_s=3600.0)
    assert removed == []  # fresh unreferenced files are protected

    # the in-flight writer now publishes; its files must still exist
    writers._publish_commit(
        path, staged, stats=writers._stats_for(path, staged)
    )
    got = writers.read_fact_table(spark, path)
    assert got.count() == 20

    # an orphan past the grace window IS reclaimed — and committed
    # files never are, regardless of age
    orphan_df = spark.range(99, 100).select(
        F.lit("t1").alias("tenant_id"), F.lit("f").alias("folder_id"),
        F.col("id").alias("v"),
    )
    orphan = writers._stage_files(orphan_df, path)
    old = time.time() - 7200
    for rel in orphan + staged:
        os.utime(os.path.join(path, rel), (old, old))
    removed = writers.vacuum_fact_table(path, min_age_s=3600.0)
    assert sorted(removed) == sorted(orphan)
    assert writers.read_fact_table(spark, path).count() == 20
