"""Capstone lifecycle: one journey through the whole engine —
train a folder, stream-ingest real PDFs, keep a live rollup, serve
results, GDPR-delete a document (copy-on-write), watch the rollup
fall back to a full recompute, time-travel to the pre-delete
snapshot, compact, and vacuum. Every step uses the public surface;
nothing reaches into internals except version numbers.
"""

from __future__ import annotations

import pytest

from pdf_etl_engine_spark import pipeline
from pdf_etl_engine_spark.service import HmacTokenVerifier, Service
from pdf_etl_engine_spark.sources import rollup, writers
from pdf_etl_engine_spark.streaming import ingest as S
from tests.test_pdf_extractor import build_pdf

KPI_META = [
    {"name": "Total Amount ($)", "sample_value": "$1.00", "type": "number"},
    {"name": "Status", "sample_value": "Active", "type": "categorical"},
]


@pytest.mark.slow
def test_full_table_lifecycle(tmp_path, spark):
    cat = pipeline.Catalog(spark, str(tmp_path / "catalog"))
    cat.create_folder("u1", "invoices", kpi_metadata=KPI_META)
    facts = str(tmp_path / "facts")
    rp = str(tmp_path / "rollup")
    verifier = HmacTokenVerifier(b"secret")
    svc = Service(
        spark, cat, facts, str(tmp_path / "incoming"), verifier
    )
    owner = verifier.issue("u1", "owner@example.com")

    # --- ingest three REAL PDFs through the streaming path -------------
    d = tmp_path / "incoming" / "u1" / "invoices" / "batch"
    d.mkdir(parents=True)
    for i in (1, 2, 3):
        (d / f"doc{i}.pdf").write_bytes(
            build_pdf([f"Total Amount ($): ${i}.00", "Status: Active"])
        )
    rollup.define_rollup(rp, facts, ["folder_id"], {
        "revenue": ("sum", "kpi_total_amount____"),
        "n": ("count", "row_id"),
    })
    q = S.stream_ingest(
        spark, str(tmp_path), cat, facts, str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "quarantine"),
        extractor=pipeline.pdf_extractor,
        rollup_paths=[rp],
    )
    q.awaitTermination()

    # service answers; rollup is live
    status, body = svc.get_results(owner, "invoices")
    assert status == 200 and len(body["results"]) == 3
    r = writers.read_fact_table(spark, rp).collect()[0]
    assert r["n"] == 3 and abs(r["revenue"] - 6.0) < 1e-9
    v_before = writers.table_version(facts)

    # --- GDPR: delete one document, copy-on-write ----------------------
    assert writers.delete_rows(
        spark, facts, "file_name = 'doc2.pdf'"
    ) == 1
    status, body = svc.get_results(owner, "invoices")
    assert status == 200 and len(body["results"]) == 2
    assert all(r["file_name"] != "doc2.pdf" for r in body["results"])

    # the rollup detects the non-append range and fully recomputes
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "full"
    r = writers.read_fact_table(spark, rp).collect()[0]
    assert r["n"] == 2 and abs(r["revenue"] - 4.0) < 1e-9

    # time travel still reads the pre-delete snapshot
    old = writers.read_fact_table(spark, facts, version=v_before)
    assert old.count() == 3

    # --- compact + vacuum ---------------------------------------------
    writers.compact_fact_table(spark, facts)
    assert writers.read_fact_table(spark, facts).count() == 2
    reclaimed = writers.vacuum_fact_table(facts, min_age_s=0.0)
    assert reclaimed  # pre-compaction generations are gone
    assert writers.read_fact_table(spark, facts).count() == 2
    # one more incremental cycle on the compacted table
    (d / "doc4.pdf").write_bytes(
        build_pdf(["Total Amount ($): $10.00", "Status: Active"])
    )
    q = S.stream_ingest(
        spark, str(tmp_path), cat, facts, str(tmp_path / "ckpt2"),
        quarantine_path=str(tmp_path / "quarantine"),
        extractor=pipeline.pdf_extractor,
        rollup_paths=[rp],
    )
    q.awaitTermination()
    r = writers.read_fact_table(spark, rp).collect()[0]
    assert r["n"] == 3 and abs(r["revenue"] - 14.0) < 1e-9
