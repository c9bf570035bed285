"""Measured skew handling at sf1: plain vs salted execution on a
deterministically hot-keyed events table.

VERDICT r6 noted the 100 TB skew story (salted join j8, salted
running-sum window w5) is parity-PINNED but not MEASURED. This tool
makes the measurement: it takes the sf1 events table (1M rows),
remaps a fraction of rows onto one hot user (hash-derived, no RNG),
and times

  * the running-sum WINDOW, plain single-window vs the w5-style
    salted two-phase rewrite (operators/windows.py:188). This is the
    case AQE cannot fix: a window partition is indivisible, so the
    hot key is one straggler task no matter the cluster size.
  * the fact-dim shuffle JOIN, plain vs the j8-style salted rewrite
    (operators/joins.py:249), with AQE skew-join disabled to expose
    the straggler (AQE's runtime split handles sort-merge joins; the
    salted rewrite is for shapes AQE can't split).

Both rewrites are semantic no-ops; each timed pair is
checksum-verified identical before times are reported.

Measured at TWO scale points (1M and 10M rows, same hot fraction)
because salting has a crossover: the rewrite adds a shuffle + join,
so below some straggler size the plain form wins — the point is to
know WHERE, not to pretend salting is free. (At 100 TB a hot key is
billions of rows; the 10M point is the directional evidence.)

Run: python tools/skew_bench.py  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_PCT = 60  # percent of events remapped to the single hot user
SALT_N = 32


def _timed(fn, runs: int = 3) -> float:
    best = None
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    return round(best, 4)


def _point(spark, sf1: str, replicate: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = spark.read.parquet(os.path.join(sf1, "events.parquet"))
    if replicate > 1:  # disjoint event ids, same key/value distribution
        base = base.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
        ).withColumn(
            "event_id",
            F.col("event_id") + F.col("rep").cast("long") * 100_000_000,
        ).drop("rep")
    events = (
        base.select(
            "event_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(100)) < HOT_PCT,
                F.lit(1).cast("long"),
            )
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .repartition(32)
        .localCheckpoint()  # freeze the skewed input out of the timings
    )
    n = events.count()

    # ---- window: plain single window (hot key = one task) ----------------
    def plain_window():
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        df = events.withColumn("run", F.sum("cents").over(w))
        return df.agg(
            F.sum(F.pmod(F.xxhash64("event_id", "run"),
                      F.lit(1_000_000_007))).alias("chk"),
            F.count("*").alias("n"),
        ).collect()[0]

    # ---- window: w5-style salted two-phase (week chunks) ------------------
    def salted_window():
        base = events.withColumn(
            "chunk", F.date_trunc("week", F.col("ts"))
        )
        w_local = (
            Window.partitionBy("user_id", "chunk")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = base.withColumn("local_run", F.sum("cents").over(w_local))
        totals = base.groupBy("user_id", "chunk").agg(
            F.sum("cents").alias("chunk_total")
        )
        w_prior = (
            Window.partitionBy("user_id")
            .orderBy("chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = totals.select(
            "user_id",
            "chunk",
            F.coalesce(F.sum("chunk_total").over(w_prior), F.lit(0)).alias(
                "off"
            ),
        )
        df = local.join(offsets, ["user_id", "chunk"]).withColumn(
            "run", F.col("local_run") + F.col("off")
        )
        return df.agg(
            F.sum(F.pmod(F.xxhash64("event_id", "run"),
                      F.lit(1_000_000_007))).alias("chk"),
            F.count("*").alias("n"),
        ).collect()[0]

    pw, sw = plain_window(), salted_window()
    assert (pw.chk, pw.n) == (sw.chk, sw.n), "salted window result differs"
    t_plain_w = _timed(plain_window)
    t_salt_w = _timed(salted_window)

    # ---- join: shuffle join on the hot key --------------------------------
    dim = events.groupBy("user_id").agg(F.count("*").alias("n_user"))
    dim = dim.localCheckpoint()

    def _join_chk(joined):
        return joined.agg(
            F.sum(F.pmod(F.xxhash64("event_id", "n_user"),
                      F.lit(1_000_000_007))).alias("chk"),
            F.count("*").alias("n"),
        ).collect()[0]

    def plain_join():
        return _join_chk(
            events.hint("shuffle_merge").join(dim, "user_id").select(
                "event_id", "n_user"
            )
        )

    def salted_join():
        fact = events.withColumn(
            "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_N))
        )
        rep = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
        ).withColumn("salt", F.col("salt").cast("long"))
        return _join_chk(
            fact.hint("shuffle_merge").join(rep, ["user_id", "salt"]).select(
                "event_id", "n_user"
            )
        )

    skew_conf = "spark.sql.adaptive.skewJoin.enabled"
    old = spark.conf.get(skew_conf)
    spark.conf.set(skew_conf, "false")
    try:
        pj, sj = plain_join(), salted_join()
        assert (pj.chk, pj.n) == (sj.chk, sj.n), "salted join result differs"
        t_plain_j = _timed(plain_join)
        t_salt_j = _timed(salted_join)
        spark.conf.set(skew_conf, "true")
        t_aqe_j = _timed(plain_join)
    finally:
        spark.conf.set(skew_conf, old)

    return {
        "rows": n,
        "window_plain_sec": t_plain_w,
        "window_salted_sec": t_salt_w,
        "window_speedup": round(t_plain_w / t_salt_w, 2),
        "join_plain_noaqe_sec": t_plain_j,
        "join_salted_sec": t_salt_j,
        "join_aqe_skewjoin_sec": t_aqe_j,
        "join_speedup_vs_noaqe": round(t_plain_j / t_salt_j, 2),
    }


def main() -> None:
    from pdf_etl_engine_spark.session import get_spark
    from tools.synth_sf1 import synth

    spark = get_spark()
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = synth()
    print(json.dumps({
        "metric": "skew_salting",
        "hot_pct": HOT_PCT,
        "salt_n": SALT_N,
        "points": [_point(spark, sf1, r) for r in (1, 10)],
    }))


if __name__ == "__main__":
    main()
