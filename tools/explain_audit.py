"""Regenerate EXPLAIN.md: the formatted physical plan of every
headline (BASELINE.md) query plus the bench-tracked X-surface
operators, with a one-line audit note per query. Run from the repo
root:

    python tools/explain_audit.py [sf_dir]

The output is committed so the plan shapes the 100 TB design depends
on (pushdown, broadcast, TakeOrderedAndProject, partial aggregation,
no Python in relational paths) are reviewable without running Spark.
tests/test_plans.py pins the same properties mechanically; this file
is the human-readable audit trail.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_etl_engine_spark import registry  # noqa: E402
from pdf_etl_engine_spark.session import get_spark  # noqa: E402

# query -> what the plan must show (the audit criterion)
AUDITED = {
    "t1_results_topk": "TakeOrderedAndProject over the scan — per-partition "
    "heaps, no global sort (flagship top-k).",
    "a2_groupby_pricing_summary": "partial_+final HashAggregate — map-side "
    "combine carries one row per (partition, group) over the wire.",
    "j5_multiway_equi": "BroadcastHashJoin on every dimension — the fact "
    "side never shuffles for the join.",
    "w0_row_number": "single Exchange feeding one Window — no extra sort "
    "stages.",
    "s7b_json_extract_agg": "from_json inside the scan projection (single "
    "Jackson pass), then partial aggregation.",
    "a3_count_distinct": "two-phase distinct aggregate (partial on "
    "(group, key), final count).",
    "f2_coerce_number": "whole-stage codegen Project — the coercion kernel "
    "is pure Column expressions, no Python.",
    "x2_dedup_exact": "one hash-shuffle groupBy on the content key.",
    "x16_contamination": "benchmark n-gram side broadcast; corpus side "
    "joins without shuffling for the membership probe.",
    "x22_incremental_dedup_exact": "fingerprint-store side reads "
    "Exchange-free (bucketed); only the probe batch shuffles.",
    "x36_gopher_rules": "map-only metric folds + doc-local explode/groupBy "
    "for the bigram mode; equi-join back, no cartesian.",
    "x37_embedding_outliers": "centroids and label stats broadcast; corpus "
    "distance pass is map-only.",
    "x39_link_pagerank": "three equi-join + partial-agg iterations, "
    "no nested loop.",
    "x40_mixture_sample": "plan broadcast, keep-filter map-only, one "
    "partial-aggregated groupBy(source).",
    "x41_zscore_outliers": "moments groupBy broadcast back; flag pass "
    "map-only; no wide shuffle.",
    "x4i_lsh_near_dup_arith": "bucket bits are map-side expressions; the "
    "candidate self-join is a hash join on (table, bucket) — no "
    "BroadcastNestedLoopJoin / CartesianProduct anywhere (the benched "
    "near-dup path, VERDICT r6 #1).",
    "x4k_knn_join_brute": "map-only: one Arrow block kernel per vector "
    "batch against the broadcast matrix (ArrowEvalPython/MapInPandas, "
    "Python BY DESIGN) — zero shuffles; the exact all-kNN baseline the "
    "x4b/x4e/x4f index probes are graded against.",
    "x4j_lsh_near_dup_k10": "x4i at the production bucket width k=10 "
    "(the sf1-parity substitute, VERDICT r9 #4): Arrow-vectorized "
    "sign-projection + rescore kernels (ArrowEvalPython/MapInPandas, "
    "Python BY DESIGN — dense linear algebra Spark lacks natively), "
    "candidate equi-join on (table, bucket) carrying ID-only rows, "
    "no nested loop, no row-at-a-time Python.",
    "x4j2_lsh_near_dup_colocated": "the 100 TB near-dup configuration "
    "(r11): candidate generation and rescore FUSED into one "
    "FlatMapGroupsInPandas kernel per (table, bucket) group — NO join "
    "node at all, no broadcast of the vector relation, only corpus×L "
    "bounded rows carry payload through the groupBy exchange; the "
    "pair dedup is the only other exchange.",
    "x4m_lsh_near_dup_mixed": "x4j2's fused shape with the hash-mixed "
    "plane family (r12 recall fix): one FlatMapGroupsInPandas kernel "
    "per (table, bucket) group, no join node, pair dedup the only "
    "other exchange — plan identical to x4j2; only the plane "
    "coefficients differ (and the DuckDB oracle recomputes the mixer "
    "itself).",
    "x4n_lsh_near_dup_multiprobe": "the r12 production near-dup "
    "configuration: home + Hamming-1 probe rows ((k+1)·L per vector, "
    "packed int64 unpacked by three codegen'd bit ops) through ONE "
    "groupBy(t, b) exchange into the fused per-bucket kernel "
    "(probe∧probe pairs masked); measured sf1 recall 0.833 at "
    "cos≥0.6 vs the arith family's 0.11 (RECALL_SF1.json).",
    "x4l_knn_join_blocked": "x4k past per-process-matrix range (r12): "
    "FlatMapCoGroupsInPandas over the (query-block, corpus-block) "
    "grid — corpus×(QB+CB) rows through one cogroup exchange, peak "
    "task memory O(block), then one row_number window merges "
    "per-block top-5s; hash-identical to x4k's oracle.",
    "x27_ngram_surprisal": "map-only Arrow kernel emits per-doc trigram "
    "COUNTS with the trigram packed into one BIGINT (r11) — the model "
    "aggregate and score join shuffle integer ID rows only, never "
    "per-character rows; total-mass scalar rides a single-row window "
    "over the aggregated model.",
    "x44_pii_redact": "map-only: regex count + redact in one projection — "
    "no keyed exchange, no join, no Python (r7).",
    "x46_substring_span_dedup": "gram hashing is codegen array math in the "
    "scan projection (no Python); ONE Exchange on the (h1, h2) double "
    "hash carrying 28-byte rows feeds the duplicate-mark window; the "
    "island merge reuses a single doc_id Exchange for both windows AND "
    "the span aggregate — no pair join, no cartesian (r12).",
    "x46c_span_cut": "the span groupBy reuses x46's doc_id partitioning; "
    "ONE left equi-join splices spans back onto documents; the cut is "
    "per-row string math in codegen — no extra wide shuffle beyond "
    "x46's two (r12).",
    "x47_pq_encode": "map-only: HOF folds over ONE array-Literal "
    "codebook (the unrolled 1024-term codegen form overflowed the "
    "64KB JVM method limit into interpreted eval — the loop form is "
    "a small expression instead), argmin via "
    "array_position(array_min), packed int64 out — no UDF, no "
    "shuffle; the 8-byte code column is the 32× scan-size win at "
    "10^12 vectors (r12).",
    "x47b_pq_adc_topk": "queries BroadcastExchange with a "
    "precomputed per-query 128-entry ADC LUT (the standard PQ "
    "trick: per-pair work = 8 lookups + adds, measured 30.7→4.3 s "
    "at sf1); the only keyed exchange is the per-query top-5, "
    "WindowGroupLimit-partial per partition (r12). r14: the encode "
    "half is the Arrow kernel (one mapInArrow feeding the LUT join) "
    "— the HOF-fold encode is the x47g exhibit.",
    "x47d_ivfpq_topk": "IVF-PQ composed: coarse centroids broadcast "
    "(8 rows) for assignment, residual-PQ encode map-side over the "
    "array-Literal codebook, probe = equi-join codes⋈broadcast "
    "per-(query,cell) LUT on the cell key — no cartesian between "
    "corpus-sized relations; per-query top-5 WindowGroupLimit (r12).",
    "x45_semdedup": "codebook broadcast into the assignment pass; the "
    "in-cluster prune is FUSED into one FlatMapGroupsInPandas kernel "
    "per centroid group (r11, the x4j2 discipline) — no candidate "
    "pair relation materializes, no CartesianProduct between "
    "corpus-sized relations; sf1 39.5 s → ~4 s.",
    "sql1_tpch_q3_text": "exact integer arithmetic — revenue folds as "
    "DECIMAL cents into BIGINT (no float round for engines to disagree "
    "on); dims broadcast, TakeOrderedAndProject caps the result (r8).",
    "x45b_semdedup_trained": "training composed into the prune: sampled "
    "fixed-point Lloyd iterations, then the trained codebook broadcasts "
    "into assignment and the pairs join stays an equi-join on "
    "centroid_id — no corpus-sized cartesian anywhere (r8).",
    "x48_heavy_hitters": "two-pass frequent items (r12): pass 1 is one "
    "Arrow kernel (per-partition Misra–Gries, ≤4096 candidates per "
    "partition regardless of vocabulary); the exact pass joins the token "
    "stream against the BROADCAST candidate set — the hash aggregate is "
    "candidate-bounded, never vocabulary-bounded — and the top-k is "
    "TakeOrderedAndProject.",
    "x49b_perceptron_filter": "supervised training applied (r12): the "
    "33 trained integer weights enter the scoring plan as a literal "
    "array — no model join, no Python; scoring is one doc-keyed "
    "aggregation over the hashed feature matrix.",
    "x50_dsir_importance": "DSIR (r12): the 64-row log-ratio model "
    "broadcasts; corpus tokens never sort-merge against it; fixed-point "
    "log accumulation keeps the per-doc sum order-free.",
    "x51_curriculum_shards": "curriculum binning (r12): difficulty is "
    "map-only codegen; the quartile cutoffs are ONE single-row "
    "aggregate broadcast into a map-only assignment — no global sort, "
    "no corpus-wide Window/ntile.",
    "x52_line_boilerplate": "line dedup (r12): the document-frequency "
    "test is one line-keyed window marking rows in place — no "
    "self-join, no pair relation; reassembly is one doc-keyed "
    "aggregation with an in-row array_sort.",
    "x53_curation_pipeline": "composed curation DAG (r12): quality "
    "predicates reach the corpus scan feeding both the dedup window "
    "and the gram explode; benchmark grams + quartile cutoffs "
    "broadcast; one text-keyed exchange in the whole five-stage plan.",
    "x47f_pq_adc_fused": "x47b's scan with the encode as ONE Arrow "
    "kernel (r13): ArrowEvalPython/mapInArrow feeds the same "
    "broadcast-LUT ADC join — 1024 interpreted lambda steps per row "
    "become 64 vectorized array ops per batch, bit-identically "
    "(pinned in tests/test_pq_spans.py). r14: delegates to x47b, "
    "which now owns this plan.",
    "x47g_pq_adc_hof_exhibit": "the labeled HOF-fold exhibit (r14): "
    "x47b's broadcast-LUT ADC join with the encode as interpreted "
    "HOF folds (CodegenFallback) — kept registered so the "
    "Arrow-vs-HOF trade stays measurable; same oracle, same answer.",
    "x47i_ivfpq_trained_persisted": "persisted trained-residual "
    "IVF-PQ (r14): probes read ONLY the probed cell partitions of the "
    "packed-int64 codes tree (PartitionFilters IN-list, pinned) plus "
    "two ≤128-row model tables; unpack is codegen'd shift/mask; the "
    "ADC join and top-k are x47h's shared probe verbatim.",
    "x47h_ivfpq_trained_residual": "trained-residual IVF-PQ (r14): "
    "coarse model broadcast (8 rows) into assignment; residual = "
    "qa − cent in-plan integer math; residual codebook = per-subspace "
    "fixed-point Lloyd on the ≤40k-row sample, broadcast (≤128 rows) "
    "into encode; ADC = codes equi-joined against the BROADCAST "
    "per-(query,cell,s,cd) integer distance table, candidate-bounded "
    "groupBy — no corpus-sized cartesian, every sum an exact BIGINT.",
    "x55_cluster_keep_best": "keep-best dedup (r13): gram-keyed "
    "equi-join candidate generation (no CartesianProduct), integer "
    "Jaccard test, star-contraction components, then one "
    "(component)-keyed window picks the keep-longest representative.",
    "x55c_keep_best_hashed": "x55b with xxhash64 gram keys (r14): "
    "identical plan shape — df aggregate, rarest-prefix window, "
    "hash-keyed equi-join, exact integer-Jaccard rescore on int64 "
    "arrays, star-contraction, keep-longest window — with every "
    "shuffle key a fixed 8-byte int instead of a gram string.",
    "x55b_keep_best_prefix": "prefix-filtered keep-best dedup (r13): "
    "candidate join keyed on the rarest-prefix grams only (hot grams "
    "outside every prefix generate zero candidates), exact "
    "array_intersect rescore per candidate pair — no CartesianProduct, "
    "no corpus-sized nested loop.",
    "x47e_ivfpq_persisted": "persisted IVF-PQ serving path (r13): the "
    "codes scan carries the probed cells as STATIC PartitionFilters "
    "(cell IN-list collected from the ≤8-row persisted centroid "
    "table) — unprobed cell directories are never opened; codes "
    "unpack as codegen'd shift/mask; downstream is x47d's shared "
    "probe plan (broadcast LUT join, WindowGroupLimit top-5).",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    registry.load_all()
    spark = get_spark(app_name="explain-audit", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# EXPLAIN audit — formatted physical plans",
        "",
        f"Generated by `tools/explain_audit.py` at `{sf_dir}`. Each plan is",
        "followed by the property it is audited for;",
        "`tests/test_plans.py` pins the same properties mechanically.",
        "",
    ]
    for name, note in AUDITED.items():
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [
            f"## {name}",
            "",
            f"**Audit:** {note}",
            "",
            "```",
            buf.getvalue().rstrip(),
            "```",
            "",
        ]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "EXPLAIN.md",
    )
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
