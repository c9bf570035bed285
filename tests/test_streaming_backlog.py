"""Backlog stress (VERDICT r6 #8): a 1,000-file cold-start backlog
drives the full pipeline — stream_ingest (capped micro-batches) →
auto-compacted fact table → live rollup → CDC drain — in one test.
Pins: every doc lands exactly once, the archive is complete, the fact
table's file count stays bounded under the stream, the rollup equals a
from-scratch aggregate, and the CDC feed replays exactly the appended
rows. Throughput is printed (docs/sec) and recorded in README.md."""

from __future__ import annotations

import json
import time

import pytest

from pdf_etl_engine_spark import pipeline
from pdf_etl_engine_spark.sources import writers
from pdf_etl_engine_spark.streaming import cdc
from pdf_etl_engine_spark.streaming import ingest as S

N_FILES = 1000

KPI_META = [
    {"name": "Total Amount ($)", "sample_value": "$1.00", "type": "number"},
]


@pytest.fixture()
def workspace(tmp_path, spark):
    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    cat.create_folder("u1", "reports", kpi_metadata=KPI_META)
    return tmp_path, cat


@pytest.mark.slow
def test_thousand_file_backlog_end_to_end(workspace, spark):
    root, cat = workspace
    batch_dir = root / "incoming" / "u1" / "reports" / "batch"
    batch_dir.mkdir(parents=True)
    for i in range(N_FILES):
        (batch_dir / f"doc{i:04d}.pdf").write_bytes(
            json.dumps({"Total Amount ($)": f"${i % 97}.00"}).encode()
        )
    facts = str(root / "facts")
    rp = str(root / "rollup")
    from pdf_etl_engine_spark.sources import rollup as R

    R.define_rollup(
        rp,
        facts,
        ["folder_id"],
        {"revenue": ("sum", "kpi_total_amount____"), "n": ("count", "row_id")},
    )
    t0 = time.perf_counter()
    q = S.stream_ingest(
        spark,
        str(root),
        cat,
        facts,
        str(root / "ckpt"),
        quarantine_path=str(root / "quarantine"),
        max_files_per_trigger=250,  # backlog drains in capped batches
        auto_compact_max_files=16,
        rollup_paths=[rp],
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    print(f"\nbacklog throughput: {N_FILES / wall:.0f} docs/sec "
          f"({N_FILES} files in {wall:.1f}s)")

    # exactly-once + complete archive
    df = writers.read_fact_table(spark, facts)
    assert df.count() == N_FILES
    assert df.select("file_name").distinct().count() == N_FILES
    assert not list(batch_dir.glob("*.pdf"))
    processed = root / "processed" / "u1" / "reports" / "batch"
    assert len(list(processed.glob("*.pdf"))) == N_FILES

    # auto_compact bounded the snapshot's file count under the stream
    n_files = len(writers.committed_files(facts))
    assert n_files <= 20, f"file count unbounded under stream: {n_files}"

    # live rollup == from-scratch aggregate
    got = writers.read_fact_table(spark, rp).collect()
    assert len(got) == 1 and got[0]["n"] == N_FILES
    want = sum(i % 97 for i in range(N_FILES))
    assert got[0]["revenue"] == float(want)

    # CDC drains exactly the appended rows (base/compaction commits
    # are not change data)
    cdc.register(spark)
    rows = []
    cq = (
        spark.readStream.format("commitlog")
        .option("path", facts)
        .load()
        .writeStream.foreachBatch(lambda d, _b: rows.extend(d.collect()))
        .option("checkpointLocation", str(root / "cdc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    cq.awaitTermination()
    assert len(rows) == N_FILES
    assert len({r["file_name"] for r in rows}) == N_FILES
