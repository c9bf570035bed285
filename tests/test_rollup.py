"""Incrementally-maintained materialized rollups (sources/rollup.py):
append-only commit ranges fold the change feed into the stored
aggregate; delete/merge ranges force (and report) a full recompute;
either way the result always equals a from-scratch groupBy of the
fact snapshot."""

from __future__ import annotations

import pytest

from pdf_etl_engine_spark.sources import rollup, writers


def _batch(spark, lo, hi, folder="reports"):
    return spark.createDataFrame(
        [("u1", folder, f"row_{v}", float(v), v % 3) for v in range(lo, hi)],
        "tenant_id string, folder_id string, row_id string,"
        " amount double, bucket int",
    )


def _expected(spark, path):
    df = writers.read_fact_table(spark, path)
    return {
        (r["bucket"],): (r["revenue"], r["n"], r["lo"], r["hi"])
        for r in df.groupBy("bucket")
        .agg(
            writers.F.sum("amount").alias("revenue"),
            writers.F.count("row_id").alias("n"),
            writers.F.min("amount").alias("lo"),
            writers.F.max("amount").alias("hi"),
        )
        .collect()
    }


def _got(spark, rp):
    return {
        (r["bucket"],): (r["revenue"], r["n"], r["lo"], r["hi"])
        for r in writers.read_fact_table(spark, rp).collect()
    }


MEASURES = {
    "revenue": ("sum", "amount"),
    "n": ("count", "row_id"),
    "lo": ("min", "amount"),
    "hi": ("max", "amount"),
}


@pytest.mark.slow
def test_initial_refresh_is_full_and_correct(spark, tmp_path):
    fact, rp = str(tmp_path / "fact"), str(tmp_path / "rollup")
    writers.append_rows(_batch(spark, 0, 100), fact)
    rollup.define_rollup(rp, fact, ["bucket"], MEASURES)
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "full"
    assert _got(spark, rp) == _expected(spark, fact)
    # nothing new: refresh is a no-op, version pointer unchanged
    assert rollup.refresh_rollup(spark, rp)["mode"] == "noop"


@pytest.mark.slow
def test_append_only_range_folds_incrementally(spark, tmp_path):
    fact, rp = str(tmp_path / "fact"), str(tmp_path / "rollup")
    writers.append_rows(_batch(spark, 0, 100), fact)
    rollup.define_rollup(rp, fact, ["bucket"], MEASURES)
    rollup.refresh_rollup(spark, rp)

    writers.append_rows(_batch(spark, 100, 150), fact)
    writers.append_rows(_batch(spark, 150, 180), fact)
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "incremental"
    assert _got(spark, rp) == _expected(spark, fact)


@pytest.mark.slow
def test_delete_in_range_forces_full_recompute(spark, tmp_path):
    fact, rp = str(tmp_path / "fact"), str(tmp_path / "rollup")
    writers.append_rows(_batch(spark, 0, 100), fact)
    rollup.define_rollup(rp, fact, ["bucket"], MEASURES)
    rollup.refresh_rollup(spark, rp)

    writers.append_rows(_batch(spark, 100, 120), fact)
    assert writers.delete_rows(spark, fact, "amount >= 110.0") == 10
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "full"
    assert _got(spark, rp) == _expected(spark, fact)
    # back to append-only after the delete: incremental again
    writers.append_rows(_batch(spark, 200, 220), fact)
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "incremental"
    assert _got(spark, rp) == _expected(spark, fact)


@pytest.mark.slow
def test_mor_dv_commit_forces_full_recompute(spark, tmp_path):
    """A MOR delete/update publishes only deletion vectors — no
    "remove" entry in the commit — yet is NOT append-only: folding
    the range incrementally would never subtract the DV-masked rows
    (stale aggregates after DELETE, double counts after UPDATE)."""
    fact, rp = str(tmp_path / "fact"), str(tmp_path / "rollup")
    writers.append_rows(_batch(spark, 0, 100), fact)
    rollup.define_rollup(rp, fact, ["bucket"], MEASURES)
    rollup.refresh_rollup(spark, rp)

    assert writers.delete_rows(
        spark, fact, "amount >= 90.0", mode="mor"
    ) == 10
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "full"
    assert _got(spark, rp) == _expected(spark, fact)

    writers.update_rows(
        spark, fact, "amount < 5.0", {"amount": "amount + 1000.0"},
        mode="mor",
    )
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "full"
    assert _got(spark, rp) == _expected(spark, fact)


@pytest.mark.slow
def test_compaction_in_range_stays_incremental(spark, tmp_path):
    """A base (compaction) commit adds no rows — the change feed skips
    it and the fold stays incremental and correct."""
    fact, rp = str(tmp_path / "fact"), str(tmp_path / "rollup")
    writers.append_rows(_batch(spark, 0, 60), fact)
    rollup.define_rollup(rp, fact, ["bucket"], MEASURES)
    rollup.refresh_rollup(spark, rp)

    writers.append_rows(_batch(spark, 60, 90), fact)
    writers.compact_fact_table(spark, fact)
    writers.append_rows(_batch(spark, 90, 120), fact)
    out = rollup.refresh_rollup(spark, rp)
    assert out["mode"] == "incremental"
    assert _got(spark, rp) == _expected(spark, fact)


def test_non_decomposable_measure_rejected(tmp_path):
    with pytest.raises(ValueError, match="non-decomposable"):
        rollup.define_rollup(
            str(tmp_path / "r"), str(tmp_path / "f"), ["bucket"],
            {"med": ("median", "amount")},
        )


@pytest.mark.slow
def test_stream_rollup_is_live_and_idempotent(spark, tmp_path):
    """stream_rollup: the CDC stream triggers incremental refreshes;
    a re-run with nothing new folds nothing; appends caught up on the
    next drain."""
    fact, rp = str(tmp_path / "fact"), str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    writers.append_rows(_batch(spark, 0, 100), fact)
    rollup.define_rollup(rp, fact, ["bucket"], MEASURES)

    q = rollup.stream_rollup(spark, rp, ckpt)
    q.awaitTermination()
    assert _got(spark, rp) == _expected(spark, fact)
    v = writers.table_properties(rp)["rollup_spec"]["fact_version"]

    # replayed drain with no new commits: version pointer unmoved
    q = rollup.stream_rollup(spark, rp, ckpt)
    q.awaitTermination()
    assert writers.table_properties(rp)["rollup_spec"]["fact_version"] == v

    # new appends fold incrementally on the next drain
    writers.append_rows(_batch(spark, 100, 140), fact)
    writers.append_rows(_batch(spark, 140, 160), fact)
    q = rollup.stream_rollup(spark, rp, ckpt)
    q.awaitTermination()
    assert _got(spark, rp) == _expected(spark, fact)
    assert (
        writers.table_properties(rp)["rollup_spec"]["fact_version"] > v
    )
