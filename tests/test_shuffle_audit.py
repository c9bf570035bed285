"""Pins over SHUFFLE_AUDIT.json (tools/shuffle_audit.py) — the
measured shuffle-economics artifact. The RECALL_*.json discipline:
the tool measures once on the real sf1 corpus; the suite pins the
invariants the 100 TB story depends on, so a regression that changes
the shuffle shape of a headline plan fails CI instead of silently
rewriting the artifact's meaning.

What the pins assert (and why each is scale-load-bearing):
  * broadcast join moves <10% of the shuffle-join twin's bytes — the
    dim-table join strategy that keeps a 100 TB fact scan map-side.
  * approx_count_distinct moves <10% of exact distinct's shuffle —
    the sketch-vs-keys tradeoff a3/a4 document.
  * the clustered cache elides the window exchange: the clustered
    run's shuffle is <10% of the raw scan's (the one-time build
    shuffle is reported separately and NOT hidden in that number).
  * t1 (TakeOrderedAndProject flagship) shuffles <0.1% of its
    on-disk corpus — top-k never re-materializes the table.
  * a2 (partial-agg groupBy) shuffles <1% of its corpus — map-side
    combine holds on the real data, not just in the plan text.
  * the colocated LSH near-dup (x4j2) shuffles less than the
    Hamming-1 multiprobe form (x4n) — multi-probe buys recall with
    replicated index entries; the bounded form must stay cheaper.
  * every audited query ran on the scan path (input_bytes > 0) and
    spilled nothing to disk at sf1 (the in-memory headroom claim).
"""

import json
import pathlib

ART = pathlib.Path(__file__).resolve().parents[1] / "SHUFFLE_AUDIT.json"


def _payload():
    assert ART.exists(), "run tools/shuffle_audit.py"
    return json.loads(ART.read_text())


def test_broadcast_join_moves_under_10pct_of_shuffle_join():
    c = _payload()["contrasts"]["broadcast_vs_shuffle_join"]
    assert c["results_identical"]
    assert (
        c["broadcast"]["shuffle_write_bytes"]
        < 0.10 * c["shuffle_join"]["shuffle_write_bytes"]
    )


def test_approx_distinct_moves_under_10pct_of_exact():
    c = _payload()["contrasts"]["exact_vs_approx_distinct"]
    assert (
        c["approx"]["shuffle_write_bytes"]
        < 0.10 * c["exact"]["shuffle_write_bytes"]
    )
    # and the sketch is inside its configured 2% rsd envelope (3x)
    assert c["approx_rel_err"] < 0.06


def test_clustered_cache_elides_window_exchange():
    c = _payload()["contrasts"]["window_clustered_vs_raw"]
    assert c["results_identical"]
    assert (
        c["clustered_cached"]["shuffle_write_bytes"]
        < 0.10 * c["raw_scan"]["shuffle_write_bytes"]
    )
    # the elision isn't free-lunch accounting: the build shuffle the
    # cache paid once is on record and is the same order as one raw
    # window's exchange (what "amortized after one query" means)
    assert c["cache_build"]["shuffle_write_bytes"] > 0


def test_topk_and_partial_agg_shuffle_fractions():
    q = _payload()["queries"]
    t1 = q["t1_results_topk"]
    assert t1["shuffle_write_bytes"] < 0.001 * t1["corpus_bytes"]
    a2 = q["a2_groupby_pricing_summary"]
    assert a2["shuffle_write_bytes"] < 0.01 * a2["corpus_bytes"]


def test_colocated_lsh_shuffles_less_than_multiprobe():
    q = _payload()["queries"]
    assert (
        q["x4j2_lsh_near_dup_colocated"]["shuffle_write_bytes"]
        < q["x4n_lsh_near_dup_multiprobe"]["shuffle_write_bytes"]
    )


def test_scan_path_and_no_disk_spill():
    q = _payload()["queries"]
    for name, d in q.items():
        assert d["input_bytes"] > 0, f"{name} never touched the scan path"
        assert d["disk_spill_bytes"] == 0, f"{name} spilled to disk at sf1"
