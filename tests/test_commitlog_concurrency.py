"""Commit-log concurrency pins (VERDICT r4 #5): the hard-link version
claim under racing writers, and vacuum's in-flight-append grace window.
The protocol (writers.py) is Delta-style optimistic concurrency — these
tests pin that the design actually holds under simultaneous writers."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from pdf_etl_engine_spark.sources import writers


def _rows(spark, vals, tenant="u1", folder="f1"):
    return spark.createDataFrame(
        [(tenant, folder, f"row_{v}", float(v)) for v in vals],
        "tenant_id string, folder_id string, row_id string, amount double",
    )


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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Log checkpoints (VERDICT r5 #3): snapshot-every-K resolution
# ---------------------------------------------------------------------------


def _fold_without_checkpoints(path: str, version=None):
    """Reference fold: resolve state with every checkpoint hidden, so
    tests can prove checkpointed resolution is semantics-preserving."""
    import shutil
    import tempfile

    cdir = os.path.join(path, writers._COMMITS_DIR)
    with tempfile.TemporaryDirectory() as keep:
        moved = []
        for v in writers._checkpoint_versions(path):
            fn = writers._checkpoint_name(v)
            shutil.move(os.path.join(cdir, fn), os.path.join(keep, fn))
            moved.append(fn)
        try:
            return writers._fold_state(path, version=version)
        finally:
            for fn in moved:
                shutil.move(os.path.join(keep, fn), os.path.join(cdir, fn))


def test_checkpoint_written_every_k_and_equivalent(tmp_path):
    """40 commits (adds, removes, one base) cross two checkpoint
    boundaries: checkpoints appear, old ones are pruned to the keep
    window, and checkpointed resolution is byte-equivalent to the full
    log fold at both the head and a historical version."""
    path = str(tmp_path / "t")
    for i in range(40):
        if i == 20:
            writers._publish_commit(path, [f"base-{i}.parquet"], base=True)
        elif i % 7 == 3 and i > 3:
            writers._publish_commit(
                path, [f"f{i}.parquet"], remove=[f"f{i - 7}.parquet"]
            )
        else:
            writers._publish_commit(
                path, [f"f{i}.parquet"], txn=("app", i),
                stats={f"f{i}.parquet": {"v": [i, i]}},
            )
    cps = writers._checkpoint_versions(path)
    assert cps, "no checkpoint written in 40 commits"
    assert len(cps) <= writers._CHECKPOINT_KEEP
    assert all((v + 1) % writers._CHECKPOINT_EVERY == 0 for v in cps)
    for version in (None, 38, 25):
        with_cp = writers._fold_state(path, version=version)
        without = _fold_without_checkpoints(path, version=version)
        assert with_cp == without, f"divergence at version={version}"


def test_checkpoint_time_travel_before_oldest(tmp_path):
    """A version older than every retained checkpoint re-folds from
    the commit JSONs (which are never deleted) — checkpoint pruning
    must not break time travel."""
    path = str(tmp_path / "t")
    for i in range(64):  # enough boundaries to prune the first one
        writers._publish_commit(path, [f"f{i}.parquet"])
    oldest_cp = writers._checkpoint_versions(path)[0]
    want_version = max(0, oldest_cp - 5)
    assert writers._load_checkpoint(path, want_version) is None
    files = writers.committed_files(path, version=want_version)
    assert files == [f"f{i}.parquet" for i in range(want_version + 1)]


def test_checkpoint_race_with_writers(tmp_path):
    """8 racing writers crossing checkpoint boundaries: versions stay
    dense, the final state matches the no-checkpoint fold, and replay
    idempotence holds for every writer."""
    path = str(tmp_path / "t")
    n_threads, per_thread = 8, 8
    start = threading.Barrier(n_threads)

    def writer(tid: int) -> None:
        start.wait()
        for i in range(per_thread):
            writers._publish_commit(
                path, [f"t{tid}-{i}.parquet"], txn=(f"w{tid}", i)
            )

    threads = [
        threading.Thread(target=writer, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    entries = writers._commit_entries(path)
    assert [v for v, _ in entries] == list(range(n_threads * per_thread))
    assert writers._fold_state(path) == _fold_without_checkpoints(path)
    for tid in range(n_threads):
        for i in range(per_thread):
            assert writers.txn_seen(path, f"w{tid}", i)
        assert not writers.txn_seen(path, f"w{tid}", per_thread)


def test_txn_watermark_survives_checkpoint_pruning(tmp_path):
    """The per-app txn watermark folds into checkpoints, so replay
    detection works even when the stamped commits predate the oldest
    retained checkpoint."""
    path = str(tmp_path / "t")
    for i in range(64):
        writers._publish_commit(path, [f"f{i}.parquet"], txn=("stream", i))
    assert writers._checkpoint_versions(path)[0] > 5
    assert writers.txn_seen(path, "stream", 5)
    assert writers.txn_seen(path, "stream", 63)
    assert not writers.txn_seen(path, "stream", 64)


def test_torn_checkpoint_falls_back(tmp_path):
    """A corrupt newest checkpoint must not poison reads: resolution
    falls back to the older checkpoint / full fold with identical
    results."""
    path = str(tmp_path / "t")
    for i in range(35):
        writers._publish_commit(path, [f"f{i}.parquet"])
    good = writers._fold_state(path)
    newest = writers._checkpoint_versions(path)[-1]
    cp_file = os.path.join(
        path, writers._COMMITS_DIR, writers._checkpoint_name(newest)
    )
    with open(cp_file, "w") as fh:
        fh.write('{"version": 999999, "files"')  # torn mid-write
    assert writers._fold_state(path) == good


@pytest.mark.slow
def test_vacuum_interleaved_with_checkpoints(tmp_path, spark):
    """Checkpoints + racing appends + vacuum: vacuum reclaims only
    aged orphans, committed data stays readable, and post-vacuum
    resolution still equals the no-checkpoint fold."""
    path = str(tmp_path / "facts")
    for batch in range(20):  # crosses the K=16 boundary
        df = spark.range(batch * 5, batch * 5 + 5).select(
            F.lit("t1").alias("tenant_id"), F.lit("f").alias("folder_id"),
            F.col("id").alias("v"),
        )
        assert writers.append_rows(df, path, txn=("loader", batch))
    assert writers._checkpoint_versions(path)
    orphan = writers._stage_files(
        spark.range(900, 905).select(
            F.lit("t1").alias("tenant_id"), F.lit("f").alias("folder_id"),
            F.col("id").alias("v"),
        ),
        path,
    )
    old = time.time() - 7200
    for rel in orphan:
        os.utime(os.path.join(path, rel), (old, old))
    removed = writers.vacuum_fact_table(path, min_age_s=3600.0)
    assert sorted(removed) == sorted(orphan)
    got = writers.read_fact_table(spark, path)
    assert got.count() == 100
    assert writers._fold_state(path) == _fold_without_checkpoints(path)
    assert not writers.append_rows(  # replay after vacuum: still no-op
        spark.range(0, 5).select(
            F.lit("t1").alias("tenant_id"), F.lit("f").alias("folder_id"),
            F.col("id").alias("v"),
        ),
        path,
        txn=("loader", 3),
    )


@pytest.mark.slow
def test_cow_delete_conflicts_with_racing_compaction(
    spark, tmp_path, monkeypatch
):
    """OCC: a COW delete whose survivors were computed against the
    pre-compaction snapshot must REFUSE to publish after a compaction
    lands (publishing would duplicate the surviving rows). The table
    stays intact."""
    path = str(tmp_path / "facts")
    for i in range(3):
        writers.append_rows(_rows(spark, [10 * i, 10 * i + 1]), path)

    orig = writers._stage_files
    fired = {"done": False}

    def hook(df, p):
        if not fired["done"]:
            fired["done"] = True
            writers.compact_fact_table(spark, p)  # lands first
        return orig(df, p)

    monkeypatch.setattr(writers, "_stage_files", hook)
    with pytest.raises(writers.ConcurrentWriteError):
        writers.delete_rows(spark, path, "amount >= 10")
    monkeypatch.setattr(writers, "_stage_files", orig)
    # nothing was deleted, nothing duplicated
    assert writers.read_fact_table(spark, path).count() == 6
    # re-run against the new snapshot succeeds
    assert writers.delete_rows(spark, path, "amount >= 10") == 4
    assert writers.read_fact_table(spark, path).count() == 2


@pytest.mark.slow
def test_compaction_conflicts_with_racing_append(
    spark, tmp_path, monkeypatch
):
    """OCC: a base commit replaces the WHOLE snapshot, so an append
    landing mid-rewrite must abort the compaction (publishing would
    silently drop the appended rows). auto_compact swallows the
    conflict (optimization, retried later); compact_fact_table
    raises."""
    path = str(tmp_path / "facts")
    for i in range(3):
        writers.append_rows(_rows(spark, [i]), path)

    orig = writers._stage_files
    fired = {"done": False}

    def hook(df, p):
        if not fired["done"]:
            fired["done"] = True
            writers.append_rows(_rows(spark, [99]), p)  # lands first
        return orig(df, p)

    monkeypatch.setattr(writers, "_stage_files", hook)
    with pytest.raises(writers.ConcurrentWriteError):
        writers.compact_fact_table(spark, path)
    monkeypatch.setattr(writers, "_stage_files", orig)
    # the racing append is intact
    assert writers.read_fact_table(spark, path).count() == 4
    # policy wrapper: conflict → None, not an exception
    fired["done"] = False
    monkeypatch.setattr(writers, "_stage_files", hook)
    assert writers.auto_compact(spark, path, max_files=1) is None
    monkeypatch.setattr(writers, "_stage_files", orig)
    assert writers.read_fact_table(spark, path).count() == 5


@pytest.mark.slow
def test_mor_deletes_on_same_file_conflict(spark, tmp_path, monkeypatch):
    """OCC: two MOR deletes masking the same file race — the second
    built its cumulative DV without the first's rows, so publishing
    it would LOSE the first delete. The loser must raise."""
    path = str(tmp_path / "facts")
    writers.append_rows(_rows(spark, [1, 2, 3, 4]).coalesce(1), path)

    orig = writers._stage_files
    orig_dv = writers._retire_or_write_dv
    fired = {"done": False}

    def hook(spark_, p, hits, affected):
        if not fired["done"]:
            fired["done"] = True
            writers.delete_rows(spark_, p, "amount = 2.0", mode="mor")
        return orig_dv(spark_, p, hits, affected)

    monkeypatch.setattr(writers, "_retire_or_write_dv", hook)
    with pytest.raises(writers.ConcurrentWriteError):
        writers.delete_rows(spark, path, "amount = 3.0", mode="mor")
    monkeypatch.setattr(writers, "_retire_or_write_dv", orig_dv)
    # first delete intact, second not applied
    got = {r["amount"] for r in writers.read_fact_table(spark, path).collect()}
    assert got == {1.0, 3.0, 4.0}
