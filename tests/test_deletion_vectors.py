"""Merge-on-read deletion vectors (``delete_rows(mode="mor")`` /
``merge_rows(mode="mor")``).

The reference has no delete at all (BigQuery rows live forever,
main.py:743-752); the COW paths are this repo's baseline strategy.
MOR is the 100 TB-scale complement: a sparse GDPR delete whose cost is
O(matched rows), not O(bytes in affected files). These tests pin the
full lifecycle — masking, cumulativity, time travel, interplay with
COW rewrites, compaction apply, vacuum reclaim, and the read-path
guarantee that DV-free snapshots keep the plain scan plan.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pdf_etl_engine_spark.sources import writers as W


def _mk_table(spark, path, n=100, folders=("f1", "f2")):
    per = n // len(folders)
    for i, f in enumerate(folders):
        df = spark.range(i * per, (i + 1) * per).select(
            F.lit("t1").alias("tenant_id"),
            F.lit(f).alias("folder_id"),
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        # one file per folder — deletes below mask fractions of a
        # file, so full-file retirement stays out of these tests
        # (it has its own test)
        W.append_rows(df.coalesce(1), path)
    return path


@pytest.mark.slow
def test_mor_delete_masks_without_rewriting(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    before = sorted(W.committed_files(t))
    n = W.delete_rows(spark, t, "k % 10 = 3", mode="mor")
    assert n == 10
    # no data file added or removed — the commit is metadata + sidecar
    assert sorted(W.committed_files(t)) == before
    assert W.committed_dv(t)  # affected files carry a DV entry
    got = W.read_fact_table(spark, t)
    assert got.count() == 90
    assert got.filter("k % 10 = 3").count() == 0


@pytest.mark.slow
def test_mor_delete_is_cumulative_and_idempotent(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    assert W.delete_rows(spark, t, "k % 10 = 3", mode="mor") == 10
    assert W.delete_rows(spark, t, "k % 10 = 4", mode="mor") == 10
    # masked rows are invisible to the identification scan: re-running
    # the same predicate deletes nothing (and publishes no commit)
    v = W.table_version(t)
    assert W.delete_rows(spark, t, "k % 10 = 3", mode="mor") == 0
    assert W.table_version(t) == v
    assert W.read_fact_table(spark, t).count() == 80


def test_mor_delete_time_travel(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    v0 = W.table_version(t)
    W.delete_rows(spark, t, "k < 50", mode="mor")
    assert W.read_fact_table(spark, t).count() == 50
    # pre-delete snapshot still shows every row
    assert W.read_fact_table(spark, t, version=v0).count() == 100


@pytest.mark.slow
def test_mor_then_cow_rewrite_drops_stale_dv(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    W.delete_rows(spark, t, "k % 10 = 3", mode="mor")
    # a COW delete rewrites the files it affects: prior masks must be
    # preserved in the rewrite, the rewritten files' DV entries
    # retired, and untouched files' DV entries kept
    W.delete_rows(spark, t, "k % 10 = 4", mode="cow")
    assert set(W.committed_dv(t)) <= set(W.committed_files(t))
    got = W.read_fact_table(spark, t)
    assert got.count() == 80
    assert got.filter("k % 10 IN (3, 4)").count() == 0
    # a full-table COW rewrite retires every DV entry
    W.delete_rows(spark, t, "k >= 0", mode="cow")
    assert W.committed_dv(t) == {}
    assert W.committed_files(t) == []


@pytest.mark.slow
def test_mor_merge_masks_matches_and_appends_source(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    files_before = set(W.committed_files(t))
    src = spark.createDataFrame(
        [("t1", "f1", 5, 999), ("t1", "f1", 5000, 1)],
        "tenant_id string, folder_id string, k long, v long",
    )
    W.merge_rows(spark, t, src, ["tenant_id", "folder_id", "k"], mode="mor")
    # old files untouched, source files added, matched row masked
    assert files_before <= set(W.committed_files(t))
    got = W.read_fact_table(spark, t)
    assert got.count() == 101
    assert [r["v"] for r in got.filter("k = 5").collect()] == [999]
    assert [r["v"] for r in got.filter("k = 5000").collect()] == [1]


@pytest.mark.slow
def test_mor_delete_retires_fully_masked_files(spark, tmp_path):
    # a file whose every row ends up masked leaves the snapshot
    # outright — no zombie 100%-masked DV entry, still no rewrite
    t = str(tmp_path / "t")
    for f in ("f1", "f2"):
        df = spark.range(0, 10).select(
            F.lit("t1").alias("tenant_id"),
            F.lit(f).alias("folder_id"),
            F.col("id").cast("long").alias("k"),
        )
        W.append_rows(df.coalesce(1), t)
    n_files = len(W.committed_files(t))
    # mask HALF of f1's rows, then the other half (cumulative → full)
    assert W.delete_rows(
        spark, t, "folder_id = 'f1' AND k < 5", mode="mor"
    ) == 5
    assert len(W.committed_files(t)) == n_files
    assert W.delete_rows(spark, t, "folder_id = 'f1'", mode="mor") == 5
    # f1's file is gone from the snapshot and carries no DV entry
    assert len(W.committed_files(t)) == n_files - 1
    assert all("folder_id=f1" not in f for f in W.committed_dv(t))
    assert W.read_fact_table(spark, t).count() == 10
    # the retired file itself was never rewritten → time travel works
    assert (
        W.read_fact_table(spark, t, version=0)
        .filter("folder_id = 'f1'")
        .count()
        == 10
    )


@pytest.mark.slow
def test_compaction_applies_dv_and_resets_map(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    W.delete_rows(spark, t, "k % 10 = 3", mode="mor")
    W.compact_fact_table(spark, t)
    assert W.committed_dv(t) == {}
    got = W.read_fact_table(spark, t)
    assert got.count() == 90
    assert got.filter("k % 10 = 3").count() == 0


@pytest.mark.slow
def test_vacuum_reclaims_superseded_dv_dirs(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    W.delete_rows(spark, t, "k = 1", mode="mor")
    W.delete_rows(spark, t, "k = 2", mode="mor")  # supersedes for f1
    live = set(W.committed_dv(t).values())
    assert len(live) == 1
    removed = W.vacuum_fact_table(t, min_age_s=0)
    dv_removed = {r for r in removed if r.startswith(W._DV_DIR)}
    assert dv_removed  # the superseded sidecar is gone
    assert not (dv_removed & live)  # the live one is not
    # reads still correct after vacuum
    assert W.read_fact_table(spark, t).count() == 98
    # grace window: a fresh sidecar is never reclaimed
    W.delete_rows(spark, t, "k = 3", mode="mor")
    assert not any(
        r.startswith(W._DV_DIR)
        for r in W.vacuum_fact_table(t, min_age_s=3600)
    )
    assert W.read_fact_table(spark, t).count() == 97


def test_dv_free_snapshot_keeps_plain_scan_plan(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    plan = W.read_fact_table(spark, t)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # zero DV overhead on the common path
    W.delete_rows(spark, t, "k = 1", mode="mor")
    plan = W.read_fact_table(spark, t)._jdf.queryExecution().executedPlan().toString()
    # masked snapshot reads anti-join the (small → broadcast) DV out
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_dv_positions_survive_pushed_filters(spark, tmp_path):
    # row_index recorded under one pushed filter must mask the same
    # physical rows under a DIFFERENT filter / full scan
    t = _mk_table(spark, str(tmp_path / "t"))
    W.delete_rows(spark, t, "k IN (7, 42, 77)", mode="mor")
    got = W.read_fact_table(spark, t).filter("k < 50")
    assert sorted(r["k"] for r in got.collect()) == sorted(
        k for k in range(50) if k not in (7, 42)
    )


def test_dv_file_keys_match_committed_names(spark, tmp_path):
    # the in-scan URI→relative normalization must agree byte-for-byte
    # with the commit log's relative file names
    t = _mk_table(spark, str(tmp_path / "t"))
    W.delete_rows(spark, t, "k = 1", mode="mor")
    assert set(W.committed_dv(t)) <= set(W.committed_files(t))
    dv_dirs = set(W.committed_dv(t).values())
    dv = spark.read.parquet(*[os.path.join(t, d) for d in dv_dirs])
    keys = {r["_dv_file"] for r in dv.select("_dv_file").distinct().collect()}
    assert keys <= set(W.committed_files(t))


@pytest.mark.slow
def test_mor_delete_exactly_once_under_txn_replay(spark, tmp_path):
    # streaming foreachBatch replay around a MOR delete: the delete
    # commit bumps the version but carries no txn, so append txn
    # watermarks are unaffected
    t = _mk_table(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [("t1", "f1", 9001, 1)],
        "tenant_id string, folder_id string, k long, v long",
    )
    assert W.append_rows(df, t, txn=("app", 7))
    W.delete_rows(spark, t, "k = 9001", mode="mor")
    assert not W.append_rows(df, t, txn=("app", 7))  # replay ignored
    assert W.read_fact_table(spark, t).filter("k = 9001").count() == 0


def test_unknown_mode_rejected(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        W.delete_rows(spark, t, "k = 1", mode="zap")
    src = spark.createDataFrame(
        [("t1", "f1", 1, 1)],
        "tenant_id string, folder_id string, k long, v long",
    )
    with pytest.raises(ValueError):
        W.merge_rows(spark, t, src, ["k"], mode="zap")
