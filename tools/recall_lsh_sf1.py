"""LSH near-dup recall at sf1, measured against the exact k-NN join
(VERDICT r10 #7, extended r12 per VERDICT r11 #1 + ADVICE r11).

Ground truth: x4k_knn_join_brute at sf1 — every vector's exact top-5
cosine neighbors — restricted to pairs at or above the 0.25 near-dup
threshold, with high-similarity subsets at cos ≥ 0.5 and ≥ 0.6 (the
bands a dedup decision actually hinges on). Probes, per family:

* ``arith``  — the r11 production planes ((31p+17j) mod 127, k=10).
  Kept as the REGRESSION row: r11 measured 0.325 overall at L=12 with
  a non-monotone high band, and r12's diagnosis is committed here —
  the family is a 1-parameter sawtooth (every plane a cyclic shift of
  one curve; mean pairwise |cosine| 0.38, max 0.9996), so tables are
  correlated and recall saturates with L.
* ``mixed``  — the r12 hash-mixed family (same k/mod/L), mean pairwise
  |cosine| 0.100 ≈ random Gaussian planes (0.102): the measured curve
  should match sign-LSH theory, and its per-band recall should be
  monotone in similarity.
* ``mixed_multiprobe`` — mixed planes + Hamming-1 probes (x4n, the
  recommended production configuration): per-table collision lifts
  from p^k to p^k + k·p^(k-1)·(1-p).
* ``x14b_mixed_adaptive`` — the exact parameterization x14b's edge
  source runs at sf1 (r12: mixed planes + Hamming-1 probes at
  adaptive k, k-scaled modulus via lsh_modulus), measured because
  ADVICE r11 flagged that the graded recall artifact covered only
  the k=10/mod-127 family.

The artifact also carries the closed-form random-plane theory per
band (p_bit = 1 − θ/π), so "mixed ≈ theory, arith ≪ theory" is
checkable at a glance. Floors: the r11 regression floor (arith L=12
overall ≥ 0.25) plus the r12 production floors on the high-similarity
truth sets for mixed_multiprobe at L=12.

r13 (VERDICT r12 #1): the production floors are re-pinned on a DENSE
PLANTED-PAIR fixture. The sf1 corpus has only 18 truth pairs at
cos ≥ 0.6 — statistically fragile for the number users rely on most —
so a recall-only fixture plants ≥10³ pairs per 0.1-wide cosine band
across [0.6, 0.95) with ground truth exact BY CONSTRUCTION (partner =
c·u + √(1−c²)·v with v ⊥ u, both unit; the float32 cast perturbs the
cosine by ~1e-7, far inside a band), embedded in 20k random unit
background vectors at the corpus dimension. Planted recall needs no
k-NN truth pass: recall = |planted ∩ reported| / |planted| per band.
The corpus-derived section is kept unchanged as the regression lane.

Run: python tools/recall_lsh_sf1.py → one JSON line, persisted to
RECALL_SF1.json at the repo root (round artifact).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L_SWEEP = (4, 8, 12)
THRESHOLD = 0.25
HIGH_BANDS = (0.5, 0.6)


def _band(c: float) -> str:
    lo = int(c * 10) / 10
    return f"[{lo},{round(lo + 0.1, 1)})"


def _theory_recall(cos_mid: float, k: int, n_l: int, probe: bool) -> float:
    p = 1.0 - math.acos(max(-1.0, min(1.0, cos_mid))) / math.pi
    per_table = p**k
    if probe:
        per_table += k * p ** (k - 1) * (1.0 - p)
    return 1.0 - (1.0 - per_table) ** n_l


PLANTED_DIR = "/tmp/spark-graft-testdata/recall_planted"
PLANTED_BANDS = ((0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 0.95))
PLANTED_PAIRS_PER_BAND = 1200
PLANTED_BACKGROUND = 20_000
PLANTED_DIM = 64
PLANTED_SEED = 13


def planted_fixture() -> tuple[str, dict[str, set[tuple[int, int]]]]:
    """Build (idempotently) the dense planted-pair fixture and return
    (sf_dir, truth-by-band). Construction: for target cosine c drawn
    uniformly in the band, partner(u) = c·u + √(1−c²)·v with u, v
    orthonormal — the pair's cosine is exactly c before the float32
    cast. IDs: background 0..B−1, planted pairs (B+2i, B+2i+1) in
    band order, so truth is reproducible from the parameters alone."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(PLANTED_SEED)

    def unit(n: int) -> "np.ndarray":
        x = rng.randn(n, PLANTED_DIM)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    vecs = [unit(PLANTED_BACKGROUND)]
    ids = [np.arange(PLANTED_BACKGROUND, dtype=np.int64)]
    truth: dict[str, set[tuple[int, int]]] = {}
    next_id = PLANTED_BACKGROUND
    for lo, hi in PLANTED_BANDS:
        band = f"[{lo},{hi})"
        u = unit(PLANTED_PAIRS_PER_BAND)
        v = unit(PLANTED_PAIRS_PER_BAND)
        # Gram-Schmidt: v ⊥ u, renormalized
        v -= (v * u).sum(axis=1, keepdims=True) * u
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        c = rng.uniform(lo, hi, size=(PLANTED_PAIRS_PER_BAND, 1))
        w = c * u + np.sqrt(1.0 - c * c) * v
        pair_ids = np.arange(
            next_id, next_id + 2 * PLANTED_PAIRS_PER_BAND, dtype=np.int64
        )
        truth[band] = {
            (int(pair_ids[2 * i]), int(pair_ids[2 * i + 1]))
            for i in range(PLANTED_PAIRS_PER_BAND)
        }
        inter = np.empty((2 * PLANTED_PAIRS_PER_BAND, PLANTED_DIM))
        inter[0::2] = u
        inter[1::2] = w
        vecs.append(inter)
        ids.append(pair_ids)
        next_id += 2 * PLANTED_PAIRS_PER_BAND
    out = os.path.join(PLANTED_DIR, "embeddings.parquet")
    if not os.path.exists(out):
        os.makedirs(PLANTED_DIR, exist_ok=True)
        all_vecs = np.concatenate(vecs).astype(np.float32)
        all_ids = np.concatenate(ids)
        tbl = pa.table(
            {
                "vec_id": pa.array(all_ids, pa.int64()),
                "embedding": pa.array(
                    list(all_vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    np.zeros(len(all_ids), dtype=np.int32), pa.int32()
                ),
            }
        )
        pq.write_table(tbl, out)
    return PLANTED_DIR, truth


def main() -> None:
    from pyspark.sql import functions as F

    from pdf_etl_engine_spark import registry
    from pdf_etl_engine_spark.catalog import load_table
    from pdf_etl_engine_spark.operators.extensions import (
        _X4J_K,
        _X4J_MOD,
        _embedding_count,
        adaptive_lsh_bits,
        fused_lsh_pairs,
        lsh_modulus,
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

    truth_by_band: dict[str, int] = {}
    for c in truth.values():
        truth_by_band[_band(c)] = truth_by_band.get(_band(c), 0) + 1
    high_truth = {
        str(hi): {p for p, c in truth.items() if c >= hi} for hi in HIGH_BANDS
    }

    emb = load_table(spark, sf1, "embeddings")
    k14 = adaptive_lsh_bits(_embedding_count(sf1))
    families: dict[str, dict] = {
        "arith": dict(plane="arith", probe=0, k=_X4J_K, mod=_X4J_MOD,
                      sweep=L_SWEEP),
        "mixed": dict(plane="mixed", probe=0, k=_X4J_K, mod=_X4J_MOD,
                      sweep=L_SWEEP),
        "mixed_multiprobe": dict(plane="mixed", probe=1, k=_X4J_K,
                                 mod=_X4J_MOD, sweep=L_SWEEP),
        # the exact x14b edge-source parameterization (r12: mixed
        # planes + Hamming-1 probes at adaptive k)
        "x14b_mixed_adaptive": dict(plane="mixed", probe=1, k=k14,
                                    mod=lsh_modulus(12, k14), sweep=(12,)),
    }

    results: dict[str, dict] = {}
    for fam, cfg in families.items():
        per_l: dict[str, dict] = {}
        for n_tables in cfg["sweep"]:
            t0 = time.monotonic()
            got = {
                (r.vec_a, r.vec_b)
                for r in fused_lsh_pairs(
                    emb,
                    n_tables,
                    cfg["k"],
                    cfg["mod"],
                    THRESHOLD,
                    plane=cfg["plane"],
                    probe_hamming=cfg["probe"],
                ).collect()
            }
            hit_by_band: dict[str, int] = {}
            for pair, c in truth.items():
                if pair in got:
                    hit_by_band[_band(c)] = hit_by_band.get(_band(c), 0) + 1
            hits = sum(hit_by_band.values())
            per_l[str(n_tables)] = {
                "lsh_pairs": len(got),
                "hit": hits,
                "recall": round(hits / len(truth), 4),
                "recall_by_band": {
                    b: round(hit_by_band.get(b, 0) / n, 4)
                    for b, n in sorted(truth_by_band.items())
                },
                "recall_high": {
                    hi: round(
                        len(got & tp) / len(tp), 4
                    ) if tp else None
                    for hi, tp in high_truth.items()
                },
                "theory_by_band": {
                    b: round(
                        _theory_recall(
                            (float(b[1:4]) + 0.05),
                            cfg["k"],
                            n_tables,
                            bool(cfg["probe"]),
                        ),
                        4,
                    )
                    for b in sorted(truth_by_band)
                },
                "spark_sec": round(time.monotonic() - t0, 1),
            }
        results[fam] = {
            "k_bits": cfg["k"],
            "mod": cfg["mod"],
            "multiprobe_hamming": cfg["probe"],
            "recall_at_L": per_l,
        }

    # ---- dense planted-pair section (r13, VERDICT r12 #1) ----------
    planted_dir, planted_truth = planted_fixture()
    p_emb = spark.read.parquet(
        os.path.join(planted_dir, "embeddings.parquet")
    )
    n_planted_vecs = (
        PLANTED_BACKGROUND
        + 2 * PLANTED_PAIRS_PER_BAND * len(PLANTED_BANDS)
    )
    kp = adaptive_lsh_bits(n_planted_vecs)
    planted_fams = {
        "arith": dict(plane="arith", probe=0, k=_X4J_K, mod=_X4J_MOD),
        "mixed": dict(plane="mixed", probe=0, k=_X4J_K, mod=_X4J_MOD),
        "mixed_multiprobe": dict(
            plane="mixed", probe=1, k=_X4J_K, mod=_X4J_MOD
        ),
        "x14b_mixed_adaptive": dict(
            plane="mixed", probe=1, k=kp, mod=lsh_modulus(12, kp)
        ),
    }
    planted_results: dict[str, dict] = {}
    for fam, cfg in planted_fams.items():
        t0 = time.monotonic()
        got = {
            (min(r.vec_a, r.vec_b), max(r.vec_a, r.vec_b))
            for r in fused_lsh_pairs(
                p_emb,
                12,
                cfg["k"],
                cfg["mod"],
                THRESHOLD,
                plane=cfg["plane"],
                probe_hamming=cfg["probe"],
            ).collect()
        }
        planted_results[fam] = {
            "k_bits": cfg["k"],
            "mod": cfg["mod"],
            "multiprobe_hamming": cfg["probe"],
            "n_tables": 12,
            "recall_by_band": {
                band: round(len(pairs & got) / len(pairs), 4)
                for band, pairs in planted_truth.items()
            },
            "theory_by_band": {
                band: round(
                    _theory_recall(
                        (float(band[1:4]) + float(band.split(",")[1][:-1]))
                        / 2,
                        cfg["k"],
                        12,
                        bool(cfg["probe"]),
                    ),
                    4,
                )
                for band in planted_truth
            },
            "lsh_pairs": len(got),
            "spark_sec": round(time.monotonic() - t0, 1),
        }

    # Floors. (1) regression: the r11 arith row must not drop below its
    # measured level band. (2) production (x4n = mixed_multiprobe,
    # L=12): re-pinned r13 on the DENSE planted bands (≥10³ pairs per
    # band — the corpus floors rested on 18 truth pairs): ≥ 0.8 on
    # [0.6,0.7) (theory ≈ 0.92 at the band's span), ≥ 0.95 on
    # [0.8,0.9) (theory ≈ 0.999), ≥ 0.98 on [0.9,0.95). The corpus
    # high-band floors are KEPT as the in-distribution regression
    # check (real-corpus pair structure ≠ planted isotropic pairs).
    arith12 = results["arith"]["recall_at_L"]["12"]
    prod = results["mixed_multiprobe"]["recall_at_L"]["12"]
    prod_planted = planted_results["mixed_multiprobe"]["recall_by_band"]
    floors = {
        "arith_L12_overall": {
            "floor": 0.25,
            "measured": arith12["recall"],
            "ok": arith12["recall"] >= 0.25,
        },
        "production_high06": {
            "floor": 0.8,
            "measured": prod["recall_high"]["0.6"],
            "ok": (prod["recall_high"]["0.6"] or 0.0) >= 0.8,
        },
        "production_high05": {
            "floor": 0.55,
            "measured": prod["recall_high"]["0.5"],
            "ok": (prod["recall_high"]["0.5"] or 0.0) >= 0.55,
        },
        "production_planted_06_07": {
            "floor": 0.8,
            "n_pairs": PLANTED_PAIRS_PER_BAND,
            "measured": prod_planted["[0.6,0.7)"],
            "ok": prod_planted["[0.6,0.7)"] >= 0.8,
        },
        "production_planted_08_09": {
            "floor": 0.95,
            "n_pairs": PLANTED_PAIRS_PER_BAND,
            "measured": prod_planted["[0.8,0.9)"],
            "ok": prod_planted["[0.8,0.9)"] >= 0.95,
        },
        "production_planted_09_095": {
            "floor": 0.98,
            "n_pairs": PLANTED_PAIRS_PER_BAND,
            "measured": prod_planted["[0.9,0.95)"],
            "ok": prod_planted["[0.9,0.95)"] >= 0.98,
        },
    }

    payload = {
        "metric": "lsh_pair_recall_vs_exact_knn",
        "sf": 1.0,
        "threshold": THRESHOLD,
        "exact_truth_pairs": len(truth),
        "truth_pairs_by_band": dict(sorted(truth_by_band.items())),
        "truth_pairs_high": {hi: len(tp) for hi, tp in high_truth.items()},
        "exact_knn_sec": exact_sec,
        "families": results,
        "planted": {
            "fixture": (
                f"{len(PLANTED_BANDS)} bands x "
                f"{PLANTED_PAIRS_PER_BAND} pairs, exact-by-construction "
                f"cosine, dim {PLANTED_DIM}, {PLANTED_BACKGROUND} "
                f"background unit vectors, seed {PLANTED_SEED}"
            ),
            "pairs_per_band": PLANTED_PAIRS_PER_BAND,
            "families": planted_results,
        },
        "anomaly_analysis": (
            "r11's non-monotone band shape is structural, not noise: the "
            "arithmetic planes (31p+17j) mod M are cyclic shifts of one "
            "sawtooth (mean pairwise |cos| 0.38, max 0.9996 — near-"
            "duplicate planes), so tables are correlated, recall "
            "saturates with L, and specific vector structures are "
            "systematically missed; the mixed family (mean |cos| 0.100 "
            "vs 0.102 for random Gaussian planes) tracks the closed-form "
            "random-plane theory in theory_by_band"
        ),
        "production_config": "x4n_lsh_near_dup_multiprobe "
        "(mixed planes, Hamming-1 probes, L=12, k=10, mod=127)",
        "floors": floors,
        "passes_floor": all(f["ok"] for f in floors.values()),
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
