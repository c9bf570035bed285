"""Streaming ingest throughput as a bench line (VERDICT r8 #6).

The 1,000-file backlog test (tests/test_streaming_backlog.py) proves
the exactly-once pipeline DRAINS; this harness measures how fast, so
streaming regressions become visible round-over-round in BENCH_r{N}
instead of only when someone reruns the slow test. Same path as the
test — stream_ingest (capped micro-batches) → fact table + archive —
on a fresh temp workspace, N synthetic docs, wall-clocked end to end.

Standalone:  python tools/streaming_bench.py [n_files]
From bench:  streaming_docs_per_sec(spark) -> {"docs": N, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KPI_META = [
    {"name": "Total Amount ($)", "sample_value": "$1.00", "type": "number"},
]


def streaming_docs_per_sec(spark, n_files: int = 500) -> dict:
    """Drain an ``n_files`` cold-start backlog through the full ingest
    pipeline and return ``{"docs", "wall_sec", "docs_per_sec"}``.

    The workspace is a throwaway temp dir; the count assertion keeps a
    silently-lossy drain from ever reporting a (great-looking) rate.
    """
    from pdf_etl_engine_spark import pipeline
    from pdf_etl_engine_spark.sources import writers
    from pdf_etl_engine_spark.streaming import ingest as S

    root = tempfile.mkdtemp(prefix="spark-graft-stream-bench-")
    try:
        cat = pipeline.Catalog(spark, os.path.join(root, "catalog"))
        cat.create_folder("u1", "reports", kpi_metadata=KPI_META)
        batch_dir = os.path.join(root, "incoming", "u1", "reports", "batch")
        # second identical tree for the batch twin: the streaming drain
        # ARCHIVES processed files out of its incoming dir, so the twin
        # needs its own copy (rel_path grammar is root-agnostic)
        twin_dir = os.path.join(
            root, "batch_ws", "incoming", "u1", "reports", "batch"
        )
        os.makedirs(batch_dir)
        os.makedirs(twin_dir)
        for i in range(n_files):
            payload = json.dumps(
                {"Total Amount ($)": f"${i % 97}.00"}
            ).encode()
            for d in (batch_dir, twin_dir):
                with open(os.path.join(d, f"doc{i:04d}.pdf"), "wb") as fh:
                    fh.write(payload)
        facts = os.path.join(root, "facts")
        t0 = time.perf_counter()
        q = S.stream_ingest(
            spark,
            root,
            cat,
            facts,
            os.path.join(root, "ckpt"),
            quarantine_path=os.path.join(root, "quarantine"),
            max_files_per_trigger=250,
            auto_compact_max_files=16,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        n_landed = writers.read_fact_table(spark, facts).count()
        if n_landed != n_files:
            raise RuntimeError(
                f"lossy drain: {n_landed}/{n_files} docs landed"
            )
        # batch-equivalent twin (VERDICT r10 #6): the SAME files through
        # the one-shot ingest_batch path into a fresh fact table — the
        # engine's own batch floor, so the streaming rate is judged
        # against a measured comparator instead of standing bare
        # (DuckDB has no streaming ingest to twin against)
        facts_b = os.path.join(root, "facts_batch")
        t0 = time.perf_counter()
        res = pipeline.ingest_batch(
            spark,
            f"{root}/batch_ws/incoming/*/*/*/*",
            cat,
            facts_b,
            quarantine_path=os.path.join(root, "quarantine_batch"),
        )
        batch_wall = time.perf_counter() - t0
        if res["rows_written"] != n_files:
            raise RuntimeError(
                f"batch twin lost rows: {res['rows_written']}/{n_files}"
            )
        return {
            "docs": n_files,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_files / wall, 1),
            "batch_equiv_sec": round(batch_wall, 2),
            "stream_over_batch": round(wall / batch_wall, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from pdf_etl_engine_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    spark = get_spark(app_name="streaming-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = streaming_docs_per_sec(spark, n)
    out["metric"] = "streaming_docs_per_sec"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
