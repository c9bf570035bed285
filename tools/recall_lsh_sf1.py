"""x4j recall at sf1, measured against the exact k-NN join (VERDICT
r10 #7): the "re-tune recall via L" claim as a committed curve.

Ground truth: x4k_knn_join_brute at sf1 — every vector's exact top-5
cosine neighbors — restricted to neighbor pairs at or above x4j's
0.25 near-dup threshold (pairs below it are not near-dups and no
near-dup pipeline should be charged for missing them). Probe: the
x4j pair set (arithmetic sign-LSH, k=10 bits, mod 127 planes — built
via fused_lsh_pairs, which produces the identical pair set to
x4j/x4j2) swept over L = 4, 8, 12 tables. Recall@L = fraction of
ground-truth pairs present in the LSH pair set; L=12 is the shipped
x4j parameterization, and the measured value is pinned as a floor in
tests/test_extensions_recall.py's sf0.01 twin.

Run: python tools/recall_lsh_sf1.py → one JSON line, persisted to
RECALL_SF1.json at the repo root (round artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L_SWEEP = (4, 8, 12)
THRESHOLD = 0.25


def main() -> None:
    from pyspark.sql import functions as F

    from pdf_etl_engine_spark import registry
    from pdf_etl_engine_spark.catalog import load_table
    from pdf_etl_engine_spark.operators.extensions import (
        _X4J_K,
        _X4J_MOD,
        fused_lsh_pairs,
    )
    from pdf_etl_engine_spark.session import get_spark
    from tools.synth_sf1 import synth

    registry.load_all()
    spark = get_spark(app_name="recall-lsh-sf1", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    sf1 = synth()

    t0 = time.monotonic()
    exact = (
        registry.QUERIES["x4k_knn_join_brute"](spark, sf1)
        .filter(F.col("cos_sim") >= THRESHOLD)
        .select(
            F.least("vec_id", "nbr_id").alias("vec_a"),
            F.greatest("vec_id", "nbr_id").alias("vec_b"),
            "cos_sim",
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    truth: dict[tuple[int, int], float] = {
        (r.vec_a, r.vec_b): r.cos_sim for r in exact.collect()
    }
    exact_sec = round(time.monotonic() - t0, 1)

    def band(c: float) -> str:
        lo = int(c * 10) / 10
        return f"[{lo},{round(lo + 0.1, 1)})"

    truth_by_band: dict[str, int] = {}
    for c in truth.values():
        truth_by_band[band(c)] = truth_by_band.get(band(c), 0) + 1

    emb = load_table(spark, sf1, "embeddings")
    per_l: dict[str, dict] = {}
    for n_tables in L_SWEEP:
        t0 = time.monotonic()
        got = {
            (r.vec_a, r.vec_b)
            for r in fused_lsh_pairs(
                emb, n_tables, _X4J_K, _X4J_MOD, THRESHOLD
            ).collect()
        }
        hit_by_band: dict[str, int] = {}
        for pair, c in truth.items():
            if pair in got:
                hit_by_band[band(c)] = hit_by_band.get(band(c), 0) + 1
        per_l[str(n_tables)] = {
            "lsh_pairs": len(got),
            "hit": sum(hit_by_band.values()),
            "recall": round(sum(hit_by_band.values()) / len(truth), 4),
            # sign-LSH match probability is (1-θ/π)^k per table — it
            # collapses toward the 0.25 threshold and rises with
            # similarity, so the per-band recall is the honest curve
            # (this corpus is word-soup: nearly all truth pairs sit
            # in [0.4,0.5); a real near-dup corpus concentrates at
            # cos ≥ 0.8 where the same parameterization recalls far
            # higher — the k/L levers trade against exactly this)
            "recall_by_band": {
                b: round(hit_by_band.get(b, 0) / n, 4)
                for b, n in sorted(truth_by_band.items())
            },
            "spark_sec": round(time.monotonic() - t0, 1),
        }

    # pinned floor at the shipped parameterization on THIS corpus —
    # a regression in the plane family / bucket kernel / pair dedup
    # shows up as a drop below it
    floor = 0.25
    shipped = per_l[str(max(L_SWEEP))]
    payload = {
        "metric": "x4j_pair_recall_vs_exact_knn",
        "sf": 1.0,
        "threshold": THRESHOLD,
        "k_bits": _X4J_K,
        "exact_truth_pairs": len(truth),
        "truth_pairs_by_band": dict(sorted(truth_by_band.items())),
        "exact_knn_sec": exact_sec,
        "recall_at_L": per_l,
        "pinned_floor_at_L12": floor,
        "passes_floor": shipped["recall"] >= floor,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "RECALL_SF1.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")
    print(json.dumps(payload))
    if not payload["passes_floor"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
