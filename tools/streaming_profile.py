"""Where does the streaming-over-batch ratio go? (VERDICT r11 #7)

tools/streaming_bench.py measures the 500-file exactly-once drain at
~2.8× its one-shot batch twin. This profiler re-runs the same drain
with every phase of each micro-batch wall-clocked — persist+count,
process_bound_batch (extract → append → quarantine), archive moves,
auto-compact — plus the batch twin, and attributes the residual
(wall − Σ phases) to the Structured Streaming framework itself
(per-trigger source listing, offset/commit log writes, trigger
scheduling). Output: one JSON line with the breakdown; the committed
numbers land in BASELINE.md's streaming-floor section.

Run: python tools/streaming_profile.py [n_files]
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


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 500

    from pdf_etl_engine_spark import pipeline
    from pdf_etl_engine_spark.session import get_spark
    from pdf_etl_engine_spark.sources import writers
    from pdf_etl_engine_spark.streaming import ingest as S

    spark = get_spark(app_name="streaming-profile", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    phases: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(module, name, key):
        orig = getattr(module, name)

        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(*a, **kw)
            finally:
                phases[key] = phases.get(key, 0.0) + (
                    time.perf_counter() - t0
                )
                counts[key] = counts.get(key, 0) + 1

        setattr(module, name, wrap)
        return orig

    orig_micro = timed(S, "_ingest_micro_batch", "micro_batch_total")
    orig_pbb = timed(pipeline, "process_bound_batch", "process_bound_batch")
    orig_arch = timed(S, "archive_from_manifest", "archive_moves")
    orig_comp = timed(writers, "auto_compact", "auto_compact")

    def drain(workspace: str, docs: int) -> float:
        cat = pipeline.Catalog(spark, os.path.join(workspace, "catalog"))
        cat.create_folder("u1", "reports", kpi_metadata=KPI_META)
        batch_dir = os.path.join(
            workspace, "incoming", "u1", "reports", "batch"
        )
        twin_dir = os.path.join(
            workspace, "batch_ws", "incoming", "u1", "reports", "batch"
        )
        os.makedirs(batch_dir)
        os.makedirs(twin_dir)
        for i in range(docs):
            payload = json.dumps(
                {"Total Amount ($)": f"${i % 97}.00"}
            ).encode()
            for d in (batch_dir, twin_dir):
                with open(os.path.join(d, f"doc{i:04d}.pdf"), "wb") as fh:
                    fh.write(payload)
        facts = os.path.join(workspace, "facts")
        t0 = time.perf_counter()
        q = S.stream_ingest(
            spark,
            workspace,
            cat,
            facts,
            os.path.join(workspace, "ckpt"),
            quarantine_path=os.path.join(workspace, "quarantine"),
            max_files_per_trigger=250,
            auto_compact_max_files=16,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        n = writers.read_fact_table(spark, facts).count()
        assert n == docs, f"lossy drain {n}/{docs}"
        return wall

    root = tempfile.mkdtemp(prefix="spark-graft-stream-profile-")
    try:
        settle = os.path.join(root, "settle")
        os.makedirs(settle)
        drain(settle, 50)  # untimed settle (codegen/worker-pool warmup)
        phases.clear()
        counts.clear()
        timed_ws = os.path.join(root, "timed")
        os.makedirs(timed_ws)
        wall = drain(timed_ws, n_files)

        # snapshot stream-side phases BEFORE the twin: ingest_batch
        # funnels through the same (patched) process_bound_batch
        stream_phases = dict(phases)
        stream_counts = dict(counts)
        # batch twin on the same file set (own tree: the drain
        # archives its inputs), phase-timed the same way
        cat = pipeline.Catalog(
            spark, os.path.join(timed_ws, "catalog")
        )
        facts_b = os.path.join(timed_ws, "facts_batch")
        t0 = time.perf_counter()
        res = pipeline.ingest_batch(
            spark,
            f"{timed_ws}/batch_ws/incoming/*/*/*/*",
            cat,
            facts_b,
            quarantine_path=os.path.join(timed_ws, "quarantine_batch"),
        )
        batch_sec = time.perf_counter() - t0
        assert res["rows_written"] == n_files
    finally:
        shutil.rmtree(root, ignore_errors=True)
        # restore patched functions
        S._ingest_micro_batch = orig_micro
        pipeline.process_bound_batch = orig_pbb
        S.archive_from_manifest = orig_arch
        writers.auto_compact = orig_comp

    micro = stream_phases.get("micro_batch_total", 0.0)
    compact = stream_phases.get("auto_compact", 0.0)
    framework = wall - micro - compact
    pbb = stream_phases.get("process_bound_batch", 0.0)
    twin_pbb = phases.get("process_bound_batch", 0.0) - pbb
    payload = {
        "metric": "streaming_drain_profile",
        "docs": n_files,
        "wall_sec": round(wall, 2),
        "batch_equiv_sec": round(batch_sec, 2),
        "stream_over_batch": round(wall / batch_sec, 2),
        "micro_batches": stream_counts.get("micro_batch_total", 0),
        "phases_sec": {
            "process_bound_batch": round(pbb, 2),
            "persist_and_bind": round(
                micro - pbb - stream_phases.get("archive_moves", 0.0), 2
            ),
            "archive_moves": round(
                stream_phases.get("archive_moves", 0.0), 2
            ),
            "auto_compact": round(compact, 2),
            "framework_residual": round(framework, 2),
        },
        "batch_twin_process_bound_sec": round(twin_pbb, 2),
        "phase_counts": stream_counts,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
