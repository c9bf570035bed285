"""Profiling wave (x33-x35): plan shapes and the sketch error bound.
Value parity for the oracle-graded entries is covered by
tests/test_oracle_parity.py like every other registry entry."""

from __future__ import annotations

import pytest

from pdf_etl_engine_spark import registry

registry.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_linkage_blocking_join_not_cartesian(spark, sf_dir):
    # the quadratic part must ride the blocking equi-join: a plain
    # hash/sort-merge join on the block key, never an all-pairs plan
    df = registry.QUERIES["x34_record_linkage"](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_linkage_every_dirty_record_resolves(spark, sf_dir):
    rows = registry.QUERIES["x34_record_linkage"](spark, sf_dir).collect()
    by_id = {r["d_id"]: r for r in rows}
    for d, r in by_id.items():
        assert r["dist"] == (0 if d % 3 == 0 else 1)
        if d % 3 == 1:
            # last digit replaced by 'X': every same-decade customer
            # ties at distance 1, so the deterministic tie-break
            # resolves to the LOWEST key in the decade — genuine
            # linkage ambiguity surfaced, not hidden
            assert r["matched_key"] == (d // 10) * 10
        else:
            # clean (dist 0) and appended-char (dist 1) names match
            # only their own record
            assert r["matched_key"] == d


def _leaf_scans(plan: str) -> int:
    """Source scans the query actually executes: InMemoryTableScan
    nodes plus FileScans NOT nested inside an InMemoryRelation. A
    MATERIALIZED InMemoryRelation prints its cache-build plan too, so
    a raw substring count over-counts by one after any earlier test
    has populated the shared table cache (order-dependent flake)."""
    n = 0
    mem_indent = None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip())
        if mem_indent is not None and indent > mem_indent:
            continue  # cache-definition subtree, not query work
        mem_indent = None
        if "InMemoryTableScan" in line:
            n += 1
        elif "InMemoryRelation" in line:
            mem_indent = indent
        elif "Scan parquet" in line:
            n += 1
    return n


def test_profile_single_pass_one_scan(spark, sf_dir):
    # ONE scan of the source feeds every column's metrics
    df = registry.QUERIES["x33_profile_stats"](spark, sf_dir)
    assert _leaf_scans(_plan(df)) == 1


def test_percentile_sketch_within_rank_error(spark, sf_dir):
    # GK sketch with accuracy 10000 ⇒ rank error ≤ n/10000 (< 1 row at
    # test scale): each approx percentile must sit within one rank of
    # the exact order statistics around the target rank
    from pdf_etl_engine_spark.catalog import load_table
    from pdf_etl_engine_spark.operators.profiling import _PCTS

    docs = load_table(spark, sf_dir, "documents")
    vals = {}
    for r in docs.select("lang", "n_chars").collect():
        vals.setdefault(r["lang"], []).append(r["n_chars"])
    approx = {
        r["lang"]: r["pcts"]
        for r in registry.QUERIES["x35b_percentile_sketch"](
            spark, sf_dir
        ).collect()
    }
    for lang, xs in vals.items():
        xs.sort()
        n = len(xs)
        for p, got in zip(_PCTS, approx[lang]):
            rank = p * (n - 1)
            lo = xs[max(0, int(rank) - 1)]
            hi = xs[min(n - 1, int(rank) + 2)]
            assert lo <= got <= hi, (lang, p, got, lo, hi)


def test_registry_grades_new_entries():
    for name in ("x33_profile_stats", "x34_record_linkage",
                 "x35_percentiles"):
        assert name in registry.ORACLES
    assert "x35b_percentile_sketch" in registry.QUERIES
    assert "x35b_percentile_sketch" not in registry.ORACLES


def test_mad_outliers_resist_masking(spark, tmp_path):
    """x54's reason to exist: a cluster of extreme rows inflates σ
    enough that the x41-style mean/3σ test flags NOTHING (masking),
    while the median/MAD modified z-score flags exactly the planted
    extremes. Built on a synthetic lineitem where 20% of prices are
    100× the base level — enough mass to inflate σ past the point
    where any of them clears 3σ."""
    import pyspark.sql.functions as F

    rows = [(i, "A", 100.0 + (i % 7)) for i in range(80)] + [
        (80 + i, "A", 10000.0 + i) for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_returnflag string, l_extendedprice double"
    )
    d = tmp_path / "madfix"
    df.write.parquet(str(d / "lineitem.parquet"))
    out = registry.QUERIES["x54_mad_outliers"](spark, str(d)).collect()
    assert len(out) == 1 and out[0]["n_outliers"] == 20
    # the mean/3σ test is masked: σ ≈ 3960 on this data, and the
    # extremes sit ~2σ from the mean — nowhere near the 3σ line
    stats = df.agg(
        F.avg("l_extendedprice").alias("m"),
        F.stddev_pop("l_extendedprice").alias("s"),
    ).collect()[0]
    n_sigma_flagged = df.filter(
        F.abs(F.col("l_extendedprice") - stats["m"]) > 3 * stats["s"]
    ).count()
    assert n_sigma_flagged == 0
