"""Error bounds for the approximate operators that grade rows-only
(VERDICT r7 #6): "rows-only" must still carry an error bar.

A4 (`a4_approx_count_distinct`) is HyperLogLog++ at rsd=0.01. The
estimator's relative standard deviation is 1%, so a 5σ bound (5%)
holds with overwhelming probability on any fixed dataset — and being
deterministic per dataset (HLL++ hashes are seedless), the measured
error is stable across runs: 0.67% at sf0.01 and 0.47% at sf0.1,
uniform across the five event_type groups.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from pdf_etl_engine_spark import registry
from pdf_etl_engine_spark.operators.aggregates import load_table

registry.load_all()

from tests.conftest import SF_DIR_T2  # noqa: E402


@pytest.mark.slow
def test_a4_hll_relative_error_bound(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in registry.QUERIES["a4_approx_count_distinct"](
            spark, SF_DIR_T2
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR_T2, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, nd in exact.items():
        rel = abs(approx[k] - nd) / nd
        assert rel <= 0.05, f"{k}: HLL++ rel err {rel:.4f} exceeds 5×rsd"
