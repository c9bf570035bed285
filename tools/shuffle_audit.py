"""Measured shuffle economics at sf1: per-query shuffle read/write
bytes, input bytes, and spill for the engine's headline + heavy-X
queries, plus three strategy CONTRAST pairs — the quantities that
decide whether a plan survives a 100 TB cluster.

Why this artifact exists: every round's EXPLAIN audit *reads* the
plans (broadcast vs SMJ, partial agg, TakeOrderedAndProject, static
partition pruning) but the shuffle story was asserted from plan
shape, never measured. This tool measures it. For each audited query
it snapshots the Spark REST API's completed-stage totals
(shuffleWriteBytes / shuffleReadBytes / inputBytes / spill) before
and after ONE fresh execution; queries run sequentially so the delta
is exactly the query's traffic. The cluster translation is direct:
shuffle bytes cross the network on a real cluster, so
`shuffle_write / input` is the fraction of the corpus a 100 TB run
re-materializes — the artifact records that ratio per query.

Contrast pairs (same result checksum-verified, different strategy):
  * broadcast vs shuffle join  — orders ⋈ customer, F.broadcast vs
    autoBroadcastJoinThreshold=-1. The broadcast side should show
    ~0 fact-table shuffle; the SMJ side re-materializes both inputs.
  * exact vs approx distinct   — a3/a4's shapes: count(DISTINCT
    user_id) ships every distinct key to the reducers;
    approx_count_distinct ships one HLL sketch per partition.
  * clustered vs raw window    — the catalog's (user_id, ts,
    event_id)-clustered events cache lets AQE elide the window
    exchange (r13); the same window over the raw parquet pays it.
    The pair measures what that cache clustering is worth in bytes.

Retained-stage eviction guard: spark.ui.retainedStages is raised to
50k (x55b alone runs thousands of stages; the default 1000 would
silently evict stages between snapshots and corrupt the deltas).

Scan-path discipline: the catalog caches every sf1 table in memory
(all are under its 256 MB local gate), which would zero out
input_bytes and hide the shuffle-vs-scan ratio. At 100 TB the fact
tables exceed the gate and stay on parquet (catalog.py's own note),
so this audit measures THAT path: the cache gate is disabled for the
run (CACHE_MAX_BYTES = -1) and every query reads parquet fresh. The
clustered-cache layout is still measured — as the explicit
`window_clustered_vs_raw` contrast, where the cache build cost is
reported separately instead of hiding inside some query's delta.

Run: python tools/shuffle_audit.py  → one JSON line, persisted to
SHUFFLE_AUDIT.json at the repo root. Floors over the artifact are
pinned in tests/test_shuffle_audit.py (the RECALL_*.json precedent:
measure once on the real corpus, pin invariants in the suite).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4077

# (registry name, tables read) audited at sf1, one fresh execution
# each. Mix of relational headline shapes and the heavy X surface;
# x55b included (≈90 s) because the prefix-filter claim IS a
# shuffle-volume claim; x4j2-vs-x4n is the multiprobe-fanout
# contrast (multi-probe replicates index entries per probe key —
# recall bought with shuffle volume; the colocated form bounds it).
# The table list feeds `corpus_bytes` — the on-disk size of the
# inputs, the stable denominator for `shuffle_per_corpus` (REST
# input_bytes reflects post-pruning encoded column pages, which is
# also recorded but can be KBs for dictionary/delta-packed columns).
AUDIT = (
    ("t1_results_topk", ("lineitem",)),
    ("a2_groupby_pricing_summary", ("lineitem",)),
    ("j5_multiway_equi", ("customer", "lineitem", "nation", "orders")),
    ("w0_row_number", ("events",)),
    ("a3_count_distinct", ("events",)),
    ("x2_dedup_exact", ("documents",)),
    ("x4n_lsh_near_dup_multiprobe", ("embeddings",)),
    ("x4j2_lsh_near_dup_colocated", ("embeddings",)),
    ("x48_heavy_hitters", ("documents",)),
    ("x53_curation_pipeline", ("documents",)),
    ("x47i_ivfpq_trained_persisted", ("embeddings",)),
    ("x55b_keep_best_prefix", ("documents",)),
)


def _ui_base(spark) -> str:
    url = spark.sparkContext.uiWebUrl
    if not url:
        raise RuntimeError("Spark UI disabled — audit needs the REST API")
    return url


def _stage_totals(spark) -> dict[str, int]:
    base = _ui_base(spark)
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages", timeout=30
    ) as r:
        stages = json.load(r)
    tot = {
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "input_bytes": 0,
        "output_bytes": 0,
        "disk_spill_bytes": 0,
        "mem_spill_bytes": 0,
        "stages": 0,
    }
    for s in stages:
        if s.get("status") != "COMPLETE":
            continue
        tot["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        tot["input_bytes"] += s.get("inputBytes", 0)
        tot["output_bytes"] += s.get("outputBytes", 0)
        tot["disk_spill_bytes"] += s.get("diskBytesSpilled", 0)
        tot["mem_spill_bytes"] += s.get("memoryBytesSpilled", 0)
        tot["stages"] += 1
    return tot


def _delta(before: dict, after: dict) -> dict:
    d = {k: after[k] - before[k] for k in before}
    if d["input_bytes"] > 0:
        d["shuffle_per_input"] = round(
            d["shuffle_write_bytes"] / d["input_bytes"], 4
        )
    return d


def _measured(spark, fn) -> tuple[dict, object]:
    """One fresh execution of fn() (must return a DataFrame),
    collected; returns (stage-delta + wall_s + rows, rows)."""
    before = _stage_totals(spark)
    t0 = time.monotonic()
    rows = fn().collect()
    wall = round(time.monotonic() - t0, 2)
    # stage completion events land asynchronously after collect
    # returns — settle so the snapshot sees the final stages
    time.sleep(1.5)
    after = _stage_totals(spark)
    d = _delta(before, after)
    d["wall_s"] = wall
    d["rows"] = len(rows)
    return d, rows


def _contrast_broadcast_join(spark, sf1: str) -> dict:
    """orders ⋈ customer revenue-by-segment: F.broadcast vs forced
    shuffle join (threshold -1, no hint). Same aggregate both sides."""
    from pyspark.sql import functions as F

    from pdf_etl_engine_spark.catalog import load_table

    orders = load_table(spark, sf1, "orders")
    customer = load_table(spark, sf1, "customer")

    def agg(joined):
        # decimal sum: order-free exact arithmetic, so the two join
        # strategies' results compare bit-equal (a double sum's
        # addition order differs between plans)
        return (
            joined.groupBy("c_mktsegment")
            .agg(
                F.sum(
                    F.col("o_totalprice").cast("decimal(18,2)")
                ).alias("rev")
            )
            .orderBy("c_mktsegment")
        )

    def broadcast_form():
        return agg(
            orders.join(
                F.broadcast(customer),
                orders.o_custkey == customer.c_custkey,
            )
        )

    def shuffle_form():
        return agg(
            orders.join(customer, orders.o_custkey == customer.c_custkey)
        )

    b, b_rows = _measured(spark, broadcast_form)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        s, s_rows = _measured(spark, shuffle_form)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert [tuple(r) for r in b_rows] == [tuple(r) for r in s_rows]
    return {"broadcast": b, "shuffle_join": s, "results_identical": True}


def _contrast_distinct(spark, sf1: str) -> dict:
    """count(DISTINCT user_id) vs approx_count_distinct over events:
    exact ships every distinct key; approx ships one sketch per map
    partition. Results differ by design (approx) — the artifact
    records the relative error alongside the byte ratio."""
    from pyspark.sql import functions as F

    from pdf_etl_engine_spark.catalog import load_table

    events = load_table(spark, sf1, "events")

    e, e_rows = _measured(
        spark,
        lambda: events.select(
            F.countDistinct("user_id").alias("n")
        ),
    )
    a, a_rows = _measured(
        spark,
        lambda: events.select(
            F.approx_count_distinct("user_id", 0.02).alias("n")
        ),
    )
    exact_n, approx_n = e_rows[0][0], a_rows[0][0]
    return {
        "exact": e,
        "approx": a,
        "exact_n": exact_n,
        "approx_n": approx_n,
        "approx_rel_err": round(abs(approx_n - exact_n) / exact_n, 4),
    }


def _contrast_window_clustering(spark, sf1: str) -> dict:
    """row_number over (user_id, ts, event_id) on a
    (user_id)-clustered in-memory cache (the catalog's r13 layout —
    AQE elides the window exchange + sort) vs the same window over
    the raw parquet scan (pays the full hash exchange). Identical
    results; the clustered side's one-time build shuffle is reported
    separately as `cache_build`, not hidden."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pdf_etl_engine_spark.catalog import load_table

    def ranked(df):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            df.select(
                "user_id",
                "event_id",
                F.row_number().over(w).alias("rn"),
            )
            .groupBy()
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("rn").cast("bigint")).alias("rn_sum"),
            )
        )

    raw_df = load_table(spark, sf1, "events")  # cache gate disabled
    clustered_df = (
        raw_df.repartition(16, "user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .cache()
    )
    try:
        build, _ = _measured(
            spark, lambda: clustered_df.groupBy().count()
        )
        clustered, c_rows = _measured(spark, lambda: ranked(clustered_df))
        raw, r_rows = _measured(spark, lambda: ranked(raw_df))
    finally:
        clustered_df.unpersist()
    assert [tuple(r) for r in c_rows] == [tuple(r) for r in r_rows]
    return {
        "cache_build": build,
        "clustered_cached": clustered,
        "raw_scan": raw,
        "results_identical": True,
    }


def main() -> None:
    from pdf_etl_engine_spark import catalog, registry
    from pdf_etl_engine_spark.session import get_spark
    from tools.synth_sf1 import synth

    registry.load_all()
    # scan-path discipline (module docstring): disable the local
    # in-memory table cache so input_bytes and the shuffle/input
    # ratio measure the production parquet path
    catalog.CACHE_MAX_BYTES = -1
    spark = get_spark(
        app_name="shuffle-audit",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "50000",
            "spark.ui.retainedJobs": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if spark.conf.get("spark.ui.enabled") != "true":
        raise SystemExit(
            "live JVM kept spark.ui.enabled=false — run standalone"
        )
    sf1 = synth()

    def corpus_bytes(tables):
        return sum(
            os.path.getsize(os.path.join(sf1, f"{t}.parquet"))
            for t in tables
        )

    out = {"sf": 1, "sf_dir": sf1, "queries": {}, "contrasts": {}}
    for name, tables in AUDIT:
        fn = registry.QUERIES[name]
        d, _ = _measured(spark, lambda f=fn: f(spark, sf1))
        d["tables"] = list(tables)
        d["corpus_bytes"] = corpus_bytes(tables)
        d["shuffle_per_corpus"] = round(
            d["shuffle_write_bytes"] / d["corpus_bytes"], 4
        )
        out["queries"][name] = d
        print(f"## {name}: {d}", file=sys.stderr)

    out["contrasts"]["broadcast_vs_shuffle_join"] = _contrast_broadcast_join(
        spark, sf1
    )
    out["contrasts"]["exact_vs_approx_distinct"] = _contrast_distinct(
        spark, sf1
    )
    out["contrasts"]["window_clustered_vs_raw"] = _contrast_window_clustering(
        spark, sf1
    )

    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "SHUFFLE_AUDIT.json"),
        "w",
    ) as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
