"""The driver's correctness harness grades only the first
``registry.GRADED_WINDOW`` entries of ``queries()`` (CORRECTNESS_r01
stopped at exactly 50, in registration order). These tests pin the
window so a refactor or a new registration can't silently push a §2
component's graded representative past the cap again (the round-1
failure mode: 18 queries, including the flagship, went ungraded).
"""

from __future__ import annotations

from pdf_etl_engine_spark import registry

registry.load_all()

WINDOW = list(registry.QUERIES)[: registry.GRADED_WINDOW]


def test_priority_fills_window_exactly():
    assert len(registry.PRIORITY) == registry.GRADED_WINDOW
    assert WINDOW == list(registry.PRIORITY)


def test_flagship_is_first():
    assert WINDOW[0] == "t1_results_topk"


def test_every_component_family_has_window_representative():
    # One graded representative per SURVEY.md §2 component family.
    required = {
        # scans (sp1 = S1+P1 merged representative)
        "sp1_scan_project_all", "s2_scan_binary_docs",
        "s7_scan_json_events", "s7b_json_extract_agg",
        # flagship + sorts
        "t1_results_topk", "t2_sort_multicol", "t3_topk_per_group",
        # windows / sets / kernels (merged representatives)
        "w123_window_suite",
        "u123_set_suite",
        "f213_infer_coerce", "f58_fenced_json_dates",
        "f1011_path_email",
        # r13 rotation: f15_math_basics → tail (scalar-math shapes
        # covered by a2/sql1; still tail-graded); its slot grades the
        # composed curation DAG x53 — the north-star pipeline query.
        "x53_curation_pipeline",
        "pp_ingest_pivot_coerce", "u4_explode_map_long",
        # streaming (r11 rotation: the CDC commit-log source replaces
        # stw_sliding_window in the window — sliding's shape stays
        # covered by tumbling/session; it remains tail-graded)
        "stw_tumbling_window", "stw_cdc_commitlog",
        "stw_session_window", "stw_stream_dedup", "stw_enrich_join",
        # aggregates (a58 = A5 rollup/cube + A8 grouping sets)
        "a58_cube_grouping_sets",
        # the SQL-text surface (reference's BigQuery-SQL interface)
        "sql1_tpch_q3_text",
        # LLM-pipeline families (r12 rotation: x4n — the recommended
        # production near-dup config after the recall fix — replaces
        # x4i; the arithmetic plane family stays window-graded via
        # x4j2, and x4i remains tail-graded)
        "x1_token_stats", "x2_dedup_exact", "x3c_ngram_jaccard",
        "x4_cosine_topk", "x4n_lsh_near_dup_multiprobe",
        "x5b_media_decode", "x6_text_analysis_agg",
        "x10_deterministic_sample", "x16_contamination",
        "x22_incremental_dedup_exact",
        # r9 rotation: the trained-SemDeDup composition replaces
        # a1_count_exists (shape subsumed by a2 + p6/j2 existence)
        "x45b_semdedup_trained",
        # r14 rotation (VERDICT r13 #3): a7_percentiles (BONUS row,
        # still tail-graded locally) → tail; its slot drives the r13
        # flagship keep-best dedup through the driver's window.
        "x55b_keep_best_prefix",
    }
    assert required <= set(WINDOW)
    prefixes = {n.split("_")[0] for n in WINDOW}
    assert {f"p{i}" for i in range(2, 7)} <= prefixes
    # r12 rotation: j4 (composite equi-key, shape subsumed by j5's
    # multiway equi-joins) → tail; its slot drives x4j2, the
    # designated 100 TB near-dup configuration, through the window.
    # r12 second pass: j8 (BONUS skew-salted ≡ plain join, still
    # pinned by the salted parity/plan suite and tail-graded) → tail;
    # its slot drives x49b — supervised classifier training applied
    # corpus-wide — through the window.
    assert {f"j{i}" for i in (1, 2, 3, 5, 6, 7)} <= prefixes
    assert "x4j2" in prefixes
    assert "x49b" in prefixes
    # r14: a7 (BONUS percentiles) rotated to the tail for x55b
    assert {f"a{i}" for i in (2, 3, 6)} <= prefixes
    assert "x55b" in prefixes


def test_window_queries_are_oracle_graded_where_possible():
    # r7: the graded window is 100% oracle-checkable — s2 gained a
    # derivable-manifest oracle and a4 (approximate HLL, inherently
    # rows-only) moved to the tail in favor of the SQL-text surface.
    rows_only = [n for n in WINDOW if n not in registry.ORACLES]
    assert rows_only == []


def test_tail_queries_still_registered():
    tail = list(registry.QUERIES)[registry.GRADED_WINDOW:]
    # merged originals + redundant variants remain runnable
    for name in ("w1_rank_functions", "u2_intersect", "f2_coerce_number",
                 # r7: the exact O(n²) near-dup baseline was demoted to
                 # the tail in favor of the graded LSH scale path, and
                 # approximate HLL for the SQL-text surface
                 "x4c_embedding_near_dup", "a4_approx_count_distinct",
                 # r9: rotated out for x45b_semdedup_trained
                 "a1_count_exists",
                 "x3_dedup_near_minhash", "x7_quality_score",
                 # merged out of the window in round 4, still runnable
                 "s1_scan_parquet", "p1_project_all", "a5_rollup",
                 "a5b_cube", "a8_grouping_sets", "w4_range_frame",
                 "u1_union_by_name", "u23_intersect_except",
                 "f5_parse_date", "f8_strip_fences_json"):
        assert name in tail
