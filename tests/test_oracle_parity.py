"""Differential harness: run every registered query on Spark AND its
DuckDB oracle on the same parquet, compare row count + schema-ish +
values — a local replica of the driver's t2 gate, kept strict
(exact string equality after normalization) so driver hash-mismatches
surface here first.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from pdf_etl_engine_spark import registry
from pdf_etl_engine_spark.catalog import TABLES

registry.load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


def _normalize_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: catches real drift, forgives last-ulp
        return f"{v:.12g}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    res = duck.execute(registry.ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} "
        f"duck={len(duck_rows)}"
    )
    s_norm = _normalize([tuple(r) for r in spark_rows], spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: "
        f"{mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    """Rows-only queries must run and yield a stable schema."""
    sdf = registry.QUERIES[name](spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
