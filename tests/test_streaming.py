"""Streaming tests (SURVEY.md §5.6): micro-batch ingest end-to-end,
archive-on-success, exactly-once file pickup across restarts, and
quarantine-not-drop error handling.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pdf_etl_engine_spark import pipeline
from pdf_etl_engine_spark.sources import writers
from pdf_etl_engine_spark.streaming import ingest as S

KPI_META = [
    {"name": "Total Amount ($)", "sample_value": "$1.00", "type": "number"},
    {"name": "Status", "sample_value": "Active", "type": "categorical"},
]


def _write_doc(root, tenant, folder, name, payload):
    d = root / "incoming" / tenant / folder / "batch"
    d.mkdir(parents=True, exist_ok=True)
    (d / name).write_bytes(json.dumps(payload).encode())


@pytest.fixture()
def workspace(tmp_path, spark):
    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    cat.create_folder("u1", "reports", kpi_metadata=KPI_META)
    return tmp_path, cat


def _drain(spark, root, cat, facts, ckpt):
    q = S.stream_ingest(
        spark,
        str(root),
        cat,
        facts,
        ckpt,
        quarantine_path=str(root / "quarantine"),
    )
    q.awaitTermination()


@pytest.mark.slow
def test_stream_ingest_and_archive(workspace, spark, tmp_path):
    root, cat = workspace
    facts = str(root / "facts")
    ckpt = str(root / "ckpt")
    _write_doc(root, "u1", "reports", "r1.pdf", {"Total Amount ($)": "$5.00",
                                                 "Status": "Active"})
    _write_doc(root, "u1", "reports", "r2.pdf", {"Total Amount ($)": "(7)"})

    _drain(spark, root, cat, facts, ckpt)

    df = writers.read_fact_table(spark, facts)
    got = {r["file_name"]: r["kpi_total_amount____"] for r in df.collect()}
    assert got == {"r1.pdf": 5.0, "r2.pdf": -7.0}

    # S6: archived out of incoming/ into processed/
    assert not (root / "incoming/u1/reports/batch/r1.pdf").exists()
    assert (root / "processed/u1/reports/batch/r1.pdf").exists()


@pytest.mark.slow
def test_stream_exactly_once_pickup(workspace, spark):
    """Restarting the query with the same checkpoint must not re-ingest
    already-committed files (fixes the reference's duplicate window,
    main.py:743-752)."""
    root, cat = workspace
    facts = str(root / "facts")
    ckpt = str(root / "ckpt")
    _write_doc(root, "u1", "reports", "a.pdf", {"Total Amount ($)": "$1.00"})
    _drain(spark, root, cat, facts, ckpt)

    # second drain, same checkpoint: no new files → no new rows
    _drain(spark, root, cat, facts, ckpt)
    df = writers.read_fact_table(spark, facts)
    assert df.count() == 1

    # a genuinely new file is picked up
    _write_doc(root, "u1", "reports", "b.pdf", {"Total Amount ($)": "$2.00"})
    _drain(spark, root, cat, facts, ckpt)
    assert writers.read_fact_table(spark, facts).count() == 2


@pytest.mark.slow
def test_stream_quarantine_untrained_folder(workspace, spark):
    """Files for an untrained folder land in quarantine with the error,
    instead of being silently dropped (vs main.py:757-759)."""
    root, cat = workspace
    facts = str(root / "facts")
    ckpt = str(root / "ckpt")
    _write_doc(root, "u9", "nofolder", "x.pdf", {"Total Amount ($)": "$1.00"})
    _drain(spark, root, cat, facts, ckpt)

    quarantined = spark.read.parquet(str(root / "quarantine"))
    rows = quarantined.collect()
    assert len(rows) == 1
    assert "not trained" in rows[0]["error"]
    assert rows[0]["rel_path"].endswith("x.pdf")


@pytest.mark.slow
def test_stream_quarantine_cross_tenant_folder_name(workspace, spark):
    """A tenant that never trained 'reports' must NOT silently resolve
    to ANOTHER tenant's same-named folder (which would ingest under
    the other tenant's KPI schema + context_hint). The reference
    rejects this at ingest ('Folder not trained', main.py:676-677);
    its only global search is read-path and share-gated
    (main.py:784-791)."""
    root, cat = workspace  # u1 trained 'reports'
    facts = str(root / "facts")
    ckpt = str(root / "ckpt")
    _write_doc(root, "u9", "reports", "x.pdf", {"Total Amount ($)": "$1.00"})
    _drain(spark, root, cat, facts, ckpt)

    quarantined = spark.read.parquet(str(root / "quarantine"))
    rows = quarantined.collect()
    assert len(rows) == 1
    assert "not trained" in rows[0]["error"]
    assert "u9/reports" in rows[0]["rel_path"]
    # and nothing was written to the fact table under either tenant
    import os

    assert not os.path.exists(facts) or writers.read_fact_table(
        spark, facts
    ).count() == 0


def test_retrain_newest_generation_wins(workspace, spark):
    """create_folder per re-train appends a generation; get_folder
    must return the LATEST KPI set (Firestore set() upsert semantics,
    main.py:497-503), not an arbitrary row."""
    import time

    root, cat = workspace
    time.sleep(0.01)  # created_at tie-break granularity
    cat.create_folder(
        "u1",
        "reports",
        kpi_metadata=[
            {"name": "Revised KPI", "sample_value": "7", "type": "number"}
        ],
    )
    meta = cat.get_folder("u1", "reports")
    assert [k["name"] for k in meta["kpi_metadata"]] == ["Revised KPI"]


@pytest.mark.slow
def test_catalog_metadata_compaction_preserves_answers(workspace, spark):
    """compact_metadata (r6): dead generations drop, live answers
    don't move — get_folder still returns the newest KPI set and
    effective_share still honors the latest permission downgrade."""
    import glob
    import time

    root, cat = workspace
    for gen in range(4):  # re-train x4: 4 more folder generations
        time.sleep(0.01)
        cat.create_folder(
            "u1", "reports",
            kpi_metadata=[{"name": f"KPI gen {gen}", "sample_value": "1",
                           "type": "number"}],
        )
    cat.add_share("u1", "reports", "Reader@Example.com", "edit")
    time.sleep(0.01)
    cat.add_share("u1", "reports", "Reader@Example.com", "view")  # downgrade

    files_before = len(glob.glob(f"{cat.folders_path}/*.parquet"))
    kept = cat.compact_metadata()
    files_after = len(glob.glob(f"{cat.folders_path}/*.parquet"))

    assert kept["folders"] >= 1 and kept["shares"] >= 1
    assert files_after < files_before
    meta = cat.get_folder("u1", "reports")
    assert [k["name"] for k in meta["kpi_metadata"]] == ["KPI gen 3"]
    # the downgrade survives compaction (newest-wins kept row)
    assert cat.effective_share("u1", "reports", "reader@example.com") == "view"
    # idempotent: a second pass keeps the same live rows
    assert cat.compact_metadata() == kept


@pytest.mark.slow
def test_read_path_global_resolve_is_share_gated(workspace, spark):
    """resolve_folder_for_read finds another tenant's folder ONLY when
    a share grants it (main.py:783-791 + 796-802)."""
    root, cat = workspace  # owner u1, folder 'reports'
    assert cat.resolve_folder_for_read("u9", "u9@example.com", "reports") is None
    cat.add_share("u1", "reports", "U9@Example.com", "view")
    meta = cat.resolve_folder_for_read("u9", "u9@example.com", "reports")
    assert meta is not None and meta["tenant_id"] == "u1"


@pytest.mark.slow
def test_read_path_resolve_bounded_per_owner(workspace, spark):
    """VERDICT r5 #8: re-train generations collapse to newest-per-owner
    SPARK-SIDE (row_number()=1 per owner window) before the collect, so
    the driver sees O(distinct owners) rows, and a shared reader gets
    the newest generation of the sharing owner."""
    import time

    root, cat = workspace  # owner u1, folder 'reports'
    for i in range(4):  # many generations for the same owner
        time.sleep(0.01)
        cat.create_folder(
            "u1", "reports",
            kpi_metadata=[
                {"name": f"Gen{i}", "sample_value": "1", "type": "number"}
            ],
        )
    # second owner with two generations of the same folder name
    for name in ("Other0", "Other1"):
        time.sleep(0.01)
        cat.create_folder(
            "u2", "reports",
            kpi_metadata=[
                {"name": name, "sample_value": "2", "type": "number"}
            ],
        )
    n_gens = cat.folders().filter(F.col("folder_id") == "reports").count()
    assert n_gens >= 7  # workspace seed + 4 + 2
    # only u2 shares -> reader resolves u2's NEWEST generation
    cat.add_share("u2", "reports", "u9@example.com", "view")
    meta = cat.resolve_folder_for_read("u9", "u9@example.com", "reports")
    assert meta is not None and meta["tenant_id"] == "u2"
    assert [k["name"] for k in meta["kpi_metadata"]] == ["Other1"]


@pytest.mark.slow
def test_watermark_drops_late_rows(spark, tmp_path):
    """§2.9: event-time window agg with watermark in append mode — a
    row arriving after the watermark passed its window is dropped.
    Lateness is forced by running the query three times over the same
    checkpoint (watermark state persists across restarts): run 1
    advances the watermark to June; run 2 delivers a January row —
    late, dropped; run 3 pushes the watermark further so the June
    windows finalize, proving the late row is absent from state."""

    def _mk(rows_):
        return spark.createDataFrame(rows_, "id long, ts_s string").select(
            "id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    src = tmp_path / "stream_src"
    src.mkdir()
    emitted: list[tuple[str, int]] = []

    def drain(tag, df):
        df.coalesce(1).write.parquet(str(src / tag))
        stream = (
            spark.readStream.schema("id long, ts timestamp")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: emitted.extend(
                    (str(r["ws"]), r["n"]) for r in bdf.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("f1", _mk([(1, "2024-06-01 10:00:00"), (2, "2024-06-01 10:10:00")]))
    drain("f2", _mk([(3, "2024-01-01 00:10:00")]))  # late: months behind
    drain("f3", _mk([(4, "2024-06-01 13:00:00")]))  # closes the 10:00 window

    rows = dict(emitted)
    assert rows.get("2024-06-01 10:00:00") == 2, rows  # finalized, intact
    assert all("2024-01-01" not in k for k in rows), rows  # late row dropped


@pytest.mark.slow
def test_stateful_running_profile_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-user state must accumulate across
    micro-batches AND across query restarts (checkpointed state)."""
    from pdf_etl_engine_spark.streaming.stateful import user_running_profile

    src = tmp_path / "st_src"
    src.mkdir()
    emitted = {}

    def drain(tag, rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
        df.coalesce(1).write.parquet(str(src / tag))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            user_running_profile(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: emitted.update(
                    {r["user_id"]: (r["n_events"], r["total_value"]) for r in bdf.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("b1", [(1, "2024-01-01 10:00:00", 5.0), (1, "2024-01-01 10:05:00", 7.0),
                 (2, "2024-01-01 10:00:00", 1.0)])
    assert emitted[1] == (2, 12.0) and emitted[2] == (1, 1.0)

    # restart with new data: state continues from the checkpoint
    drain("b2", [(1, "2024-01-01 11:00:00", 3.0)])
    assert emitted[1] == (3, 15.0), emitted


@pytest.mark.slow
def test_stateful_sessionization_timeout_and_inline_close(spark, tmp_path):
    """Timeout-driven sessions (r6): a session closes inline when a
    later event exceeds the gap, and via EVENT-TIME TIMEOUT when the
    watermark passes last+gap with no new data for the key — the
    absence-of-data path the built-in session_window agg can't
    customize."""
    from pdf_etl_engine_spark.streaming.stateful import user_sessions

    src = tmp_path / "sess_src"
    src.mkdir()
    emitted = []

    def drain(tag, rows):
        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"),
                 "value")
        df.coalesce(1).write.parquet(str(src / tag))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            user_sessions(stream, gap_s=600.0, lateness="1 minute")
            .writeStream.foreachBatch(
                lambda bdf, bid: emitted.extend(
                    (r["user_id"], str(r["session_start"]),
                     str(r["session_end"]), r["n_events"], r["total_value"])
                    for r in bdf.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "sess_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # b1: user 1 has two events 5 min apart (one session), user 2 one
    drain("b1", [(1, "2024-06-01 10:00:00", 5.0),
                 (1, "2024-06-01 10:05:00", 7.0),
                 (2, "2024-06-01 10:00:00", 1.0)])
    assert emitted == []  # nothing closed yet

    # b2: user 1 reappears 2h later -> session 1 closes INLINE; the
    # watermark advances to ~11:59 (covers user 2's 10:10 timeout,
    # which fires in the NEXT batch evaluation)
    drain("b2", [(1, "2024-06-01 12:00:00", 2.0)])
    assert (1, "2024-06-01 10:00:00", "2024-06-01 10:05:00", 2, 12.0) \
        in emitted

    # b3: unrelated key advances processing; its watermark (12:04)
    # passes user 2's timeout (10:10) -> user 2's session times out,
    # while user 1's new session (timeout 12:10 > 12:04) stays open
    drain("b3", [(3, "2024-06-01 12:05:00", 0.5)])
    assert (2, "2024-06-01 10:00:00", "2024-06-01 10:00:00", 1, 1.0) \
        in emitted
    assert not any(r[0] == 1 and r[1].startswith("2024-06-01 12:")
                   for r in emitted), emitted


@pytest.mark.slow
def test_backpressure_caps_micro_batch_size(workspace, spark):
    """max_files_per_trigger drains a 6-file backlog in capped
    micro-batches (availableNow still processes everything), with
    every row committed exactly once."""
    root, cat = workspace
    facts = str(root / "facts")
    ckpt = str(root / "ckpt")
    for i in range(6):
        _write_doc(root, "u1", "reports", f"b{i}.pdf",
                   {"Total Amount ($)": f"${i}.00"})

    batch_sizes = []
    orig = S._ingest_micro_batch

    def spy(spark_, batch_df, *args, **kwargs):
        batch_sizes.append(batch_df.count())
        return orig(spark_, batch_df, *args, **kwargs)

    S._ingest_micro_batch = spy
    try:
        q = S.stream_ingest(
            spark, str(root), cat, facts, ckpt,
            quarantine_path=str(root / "quarantine"),
            max_files_per_trigger=2,
        )
        q.awaitTermination()
    finally:
        S._ingest_micro_batch = orig

    assert sum(batch_sizes) == 6
    assert max(batch_sizes) <= 2 and len(batch_sizes) >= 3
    df = writers.read_fact_table(spark, facts)
    assert df.count() == 6


@pytest.mark.slow
def test_micro_batch_replay_does_not_duplicate(workspace, spark):
    """Sink-side exactly-once: a micro-batch re-delivered after a
    crash-before-checkpoint (same (app, batch_id) txn) must not
    double-append to the fact table."""
    root, cat = workspace
    facts = str(root / "facts")
    _write_doc(root, "u1", "reports", "a.pdf",
               {"Total Amount ($)": "$5.00", "Status": "Active"})
    batch = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(str(root / "incoming"))
    )
    for _ in range(2):  # original run + replay
        S._ingest_micro_batch(
            spark, batch, str(root), cat, facts,
            None, pipeline.json_bytes_extractor, archive=False,
            txn=("ingest:ckpt", 0),
        )
    assert writers.read_fact_table(spark, facts).count() == 1
    # the NEXT batch id still appends
    S._ingest_micro_batch(
        spark, batch, str(root), cat, facts,
        None, pipeline.json_bytes_extractor, archive=False,
        txn=("ingest:ckpt", 1),
    )
    assert writers.read_fact_table(spark, facts).count() == 2


@pytest.mark.slow
def test_archive_manifest_large_batch(workspace, spark):
    """VERDICT r4 #4: the archive set rides an executor-written
    manifest + distributed moves — no driver collect, no serial loop.
    Counters and filesystem outcome identical to the old path."""
    root, cat = workspace
    for i in range(120):
        _write_doc(root, "u1", "reports", f"f{i:03d}.pdf",
                   {"Total Amount ($)": f"${i}.00", "Status": "A"})
    _drain(spark, root, cat, str(root / "facts"), str(root / "ckpt"))

    incoming = root / "incoming/u1/reports/batch"
    processed = root / "processed/u1/reports/batch"
    assert not list(incoming.glob("*.pdf"))
    assert len(list(processed.glob("*.pdf"))) == 120
    # manifest cleaned up after a fully successful pass
    arch = root / "_archive"
    assert not arch.exists() or not any(arch.iterdir())
    df = writers.read_fact_table(spark, str(root / "facts"))
    assert df.count() == 120


@pytest.mark.slow
def test_archive_from_manifest_idempotent(workspace, spark):
    """A replayed archive (manifest exists, some files already moved)
    moves only the stragglers and never errors."""
    root, _ = workspace
    rels = []
    for i in range(6):
        d = root / "incoming/u9/docs/batch"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"g{i}.pdf").write_bytes(b"x")
        rels.append(f"incoming/u9/docs/batch/g{i}.pdf")
    manifest = root / "_archive" / "txn=test-0"
    spark.createDataFrame(
        [(r,) for r in rels], "rel_path string"
    ).write.parquet(str(manifest))
    # pre-move half of them (simulated earlier partial archive)
    for r in rels[:3]:
        src = root / r
        dst = root / r.replace("incoming/", "processed/", 1)
        dst.parent.mkdir(parents=True, exist_ok=True)
        src.rename(dst)
    moved = S.archive_from_manifest(spark, str(manifest), str(root))
    assert moved == 3  # only the stragglers
    assert not manifest.exists()
    for r in rels:
        assert (root / r.replace("incoming/", "processed/", 1)).exists()
        assert not (root / r).exists()
    # replay with the manifest gone: clean no-op
    assert S.archive_from_manifest(spark, str(manifest), str(root)) == 0


@pytest.mark.slow
def test_stream_ingest_auto_compacts_under_threshold(workspace, spark):
    """auto_compact_max_files: repeated micro-batches must not grow the
    fact table one file per batch forever — once the snapshot crosses
    the threshold the post-commit policy folds it, and replay
    semantics stay intact (row count exact, no duplicates)."""
    root, cat = workspace
    facts = str(root / "facts")
    for i in range(6):
        _write_doc(root, "u1", "reports", f"d{i}.pdf",
                   {"Total Amount ($)": f"${i}.00"})
        q = S.stream_ingest(
            spark, str(root), cat, facts, str(root / f"ckpt{i}"),
            quarantine_path=str(root / "quarantine"),
            auto_compact_max_files=3,
        )
        q.awaitTermination()
    assert writers.read_fact_table(spark, facts).count() == 6
    assert len(writers.committed_files(facts)) <= 4


@pytest.mark.slow
def test_stream_ingest_keeps_rollup_live(workspace, spark):
    """rollup_paths: a declared materialized rollup refreshes after
    every micro-batch, staying equal to a from-scratch aggregate of
    the fact table as batches land."""
    from pdf_etl_engine_spark.sources import rollup as R

    root, cat = workspace
    facts = str(root / "facts")
    rp = str(root / "rollup")
    R.define_rollup(rp, facts, ["folder_id"], {
        "revenue": ("sum", "kpi_total_amount____"),
        "n": ("count", "row_id"),
    })
    for i in range(3):
        _write_doc(root, "u1", "reports", f"m{i}.pdf",
                   {"Total Amount ($)": f"${i + 1}.00"})
        q = S.stream_ingest(
            spark, str(root), cat, facts, str(root / f"rck{i}"),
            quarantine_path=str(root / "quarantine"),
            rollup_paths=[rp],
        )
        q.awaitTermination()
        got = writers.read_fact_table(spark, rp).collect()
        assert len(got) == 1
        assert got[0]["n"] == i + 1
        assert abs(got[0]["revenue"] - sum(range(1, i + 2))) < 1e-9


def test_streaming_heavy_hitters_eviction_keeps_hot_key(spark, tmp_path):
    """streaming_heavy_hitters under a tiny capacity: the per-shard
    Misra-Gries state must stay bounded across micro-batches and the
    dominant key must survive churn (the mg_merge absence bound,
    exercised through the real streaming machinery)."""
    import uuid as _uuid

    from pdf_etl_engine_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    src = tmp_path / "hh_src"
    src.mkdir()
    rows = [(7, f"2024-01-01 00:{i % 60:02d}:00") for i in range(300)] + [
        (1000 + i, "2024-01-01 01:00:00") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.parquet(str(src / "batch"))
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        str(src / "batch")
    )
    hh = streaming_heavy_hitters(stream, cap=4, shards=1)
    sink = f"hh_evict_{_uuid.uuid4().hex[:8]}"
    q = (
        hh.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(sink)
    # every emission is one shard's current summary: <= cap rows per
    # micro-batch, and the hot key is present in the final state
    assert emitted.filter("user_id = 7").count() >= 1
    final_hot = (
        emitted.filter("user_id = 7").agg(F.max("cnt")).collect()[0][0]
    )
    assert final_hot >= 300 - (500 / 5)  # count >= true - n/(cap+1)
    assert emitted.groupBy().count().collect()[0][0] <= 4 * 200
