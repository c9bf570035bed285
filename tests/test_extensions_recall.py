"""ANN recall measurement (SURVEY.md §2.11 X4): the approximate
operators graded against their exact twins on the same data.

Parameters and their rationale live in the operator docstrings
(extensions.py): multi-table sign-LSH (k=3 bits × L=12 tables) for
x4b/x4d — sized for this testdata's weak similarity levels (true
top-10 at cos 0.28-0.41) — and IVF nprobe=6/16 for x4e.
"""

from __future__ import annotations

import os

from pdf_etl_engine_spark import registry

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


def _topk_ids(spark, name):
    return {r["vec_id"] for r in registry.QUERIES[name](spark, SF_DIR).collect()}


def _pairs(spark, name):
    return {
        (r["vec_a"], r["vec_b"])
        for r in registry.QUERIES[name](spark, SF_DIR).collect()
    }


def test_lsh_topk_recall_at_10(spark):
    """x4b (multi-table LSH) vs x4 (exact brute force): recall@10.
    Measured 1.0 at sf0.01, 0.9 at sf0.1 with k=3, L=12."""
    exact = _topk_ids(spark, "x4_cosine_topk")
    approx = _topk_ids(spark, "x4b_ann_lsh_topk")
    assert len(exact & approx) / len(exact) >= 0.8


def test_ivf_topk_recall_at_10(spark):
    """x4e (IVF, nprobe=6/16) vs x4: recall@10. Measured 0.8 at
    sf0.01; on these structureless synthetic embeddings IVF recall
    tracks nprobe/n_cells (see the operator docstring)."""
    exact = _topk_ids(spark, "x4_cosine_topk")
    approx = _topk_ids(spark, "x4e_ann_ivf_topk")
    assert len(exact & approx) / len(exact) >= 0.8


def test_lsh_near_dup_pair_recall(spark):
    """x4d (LSH-bucketed pair generation) vs x4c (exact O(n²) pairs at
    cos≥0.25): pair recall. Measured 0.947 at sf0.01, 0.941 at sf0.1."""
    exact = _pairs(spark, "x4c_embedding_near_dup")
    approx = _pairs(spark, "x4d_embedding_near_dup_lsh")
    assert exact, "exact near-dup baseline unexpectedly empty"
    assert len(exact & approx) / len(exact) >= 0.8
    # no false positives: every reported pair really clears the bar
    assert approx <= exact
