"""x48 crossover measurement (VERDICT r12 #5): find where the
Misra–Gries two-pass beats the plain hash aggregate.

BASELINE.md records x48's ~3.5× sf1 cost as "two extra-scan design
cost, expect >1 by design — the two-pass wins only when the distinct
count is too large for a hash aggregate". This tool turns that claim
into a measured curve: it synthesizes token corpora with a controlled
distinct count V (25 planted heavy tokens at count N/1000 —
comfortably above the N/(cap+1) exactness margin at cap=4096 — over a
unique-token tail) and times BOTH strategies, each in its OWN fresh
heap-capped JVM (2 GiB local-mode heap — the "small heap lane"; the
per-executor memory of a 1000-node cluster is exactly this kind of
bounded). Per-strategy process isolation is load-bearing: past the
crossover the plain aggregate doesn't just spill, it OOMs the JVM,
and that outcome must be recorded as a data point, not crash the
sweep.

* plain      — tokens.groupBy(token).count() → top-25: the hash
  aggregate's state is O(V) across the partition maps + an O(V)-row
  exchange; past the heap it spills, then dies.
* two_pass   — x48's shape verbatim: mg_candidates (bounded 4096-key
  dicts, map-only) → broadcast candidate semi-join → exact counts of
  ≤ candidates keys → top-25. State is shards × cap whatever V is.

When both strategies complete at a sweep point, the parent asserts
they returned the SAME 25 (token, cnt) rows and that every row
carries the mg_exact certificate, so no ratio is ever reported on
divergent answers.

Run: python tools/hh_crossover.py → HH_CROSSOVER.json at the repo
root.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DATA_ROOT = "/tmp/spark-graft-testdata/hh_crossover"
SWEEP_V = (1_000_000, 10_000_000, 50_000_000, 100_000_000)
HEAP = "2g"
HOT = 25
CAP = 4096  # mirror training._HH_CAP
RUNS = 3


def _gen(spark, v: int) -> str:
    """Token corpus with ~v distinct tokens: rows i in [0, n);
    i%1000<25 → one of 25 hot tokens (count n/1000 each), else the
    unique token u<i>. Deterministic, no RNG."""
    out = f"{DATA_ROOT}/v{v}"
    if os.path.exists(f"{out}/_SUCCESS"):
        return out
    from pyspark.sql import functions as F

    n = int(v / 0.975)
    df = spark.range(n).select(
        F.when(
            F.col("id") % 1000 < HOT,
            F.concat(F.lit("hot"), (F.col("id") % 1000).cast("string")),
        )
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("token")
    )
    df.write.mode("overwrite").parquet(out)
    return out


def child(v: int, strategy: str) -> None:
    """One (sweep point, strategy) in a heap-capped JVM; prints one
    JSON line with the median time and the top-25 rows."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", HEAP)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName(f"hh-crossover-v{v}-{strategy}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pdf_etl_engine_spark.operators.training import mg_candidates

    path = _gen(spark, v)
    tokens = spark.read.parquet(path)

    def plain():
        return (
            tokens.groupBy("token")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "token")
            .limit(HOT)
            .collect()
        )

    def two_pass():
        # x48's shape verbatim (training.x48_heavy_hitters), on the
        # bare token column
        pass1 = mg_candidates(tokens, cap=CAP).localCheckpoint(
            eager=False
        )
        cand = (
            pass1.filter(F.col("token").isNotNull())
            .select("token")
            .distinct()
        )
        total = pass1.agg(F.sum("np").alias("n_total"))
        exact = (
            tokens.join(F.broadcast(cand), "token")
            .groupBy("token")
            .agg(F.count("*").alias("cnt"))
            .join(F.broadcast(total))
        )
        return (
            exact.select(
                "token",
                "cnt",
                (F.col("cnt") * (CAP + 1) > F.col("n_total")).alias(
                    "mg_exact"
                ),
            )
            .orderBy(F.desc("cnt"), "token")
            .limit(HOT)
            .collect()
        )

    fn = plain if strategy == "plain" else two_pass
    rows = fn()  # settle + correctness payload
    if strategy == "two_pass":
        assert all(r["mg_exact"] for r in rows), "margin violated"
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    print(
        "HHPOINT "
        + json.dumps(
            {
                "sec": round(statistics.median(samples), 2),
                "rows": [(r["token"], r["cnt"]) for r in rows],
            }
        )
    )


def _run_child(v: int, strategy: str) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            str(v),
            strategy,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("HHPOINT "):
            return json.loads(line[len("HHPOINT "):])
    err = out.stdout + out.stderr
    if "OutOfMemoryError" in err:
        return {"error": "java.lang.OutOfMemoryError: Java heap space"}
    return {"error": f"exit {out.returncode}: {err[-300:]}"}


def main() -> None:
    points = []
    for v in SWEEP_V:
        plain = _run_child(v, "plain")
        two = _run_child(v, "two_pass")
        point = {"v_distinct": v, "n_rows": int(v / 0.975)}
        if "rows" in plain and "rows" in two:
            assert plain["rows"] == two["rows"], f"divergent answers at V={v}"
            point.update(
                plain_sec=plain["sec"],
                two_pass_sec=two["sec"],
                ratio_two_over_plain=round(two["sec"] / plain["sec"], 3),
            )
        else:
            point.update(
                plain_sec=plain.get("sec", plain.get("error")),
                two_pass_sec=two.get("sec", two.get("error")),
            )
        points.append(point)
        print(json.dumps(point))
    cross = next(
        (
            p["v_distinct"]
            for p in points
            if not isinstance(p.get("plain_sec"), (int, float))
            or p.get("ratio_two_over_plain", 99) < 1.0
        ),
        None,
    )
    payload = {
        "metric": "x48_two_pass_vs_plain_groupby_crossover",
        "heap": HEAP,
        "cap": CAP,
        "hot_tokens": HOT,
        "methodology": (
            f"median of {RUNS} per strategy per point, each strategy in "
            f"its own fresh {HEAP}-heap local[16] JVM, top-25 row "
            "equality + mg_exact certificate asserted where both "
            "complete"
        ),
        "points": points,
        "crossover_v_distinct": cross,
    }
    with open(os.path.join(HERE, "HH_CROSSOVER.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
