"""Round-trip tests for the non-parquet source formats (S-family)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table
from pdf_etl_engine_spark.sources import readers

SF = "/root/testdata/sf0.001"


def _nation(spark):
    return load_table(spark, SF, "nation")


def test_csv_roundtrip(spark, tmp_path):
    src = _nation(spark)
    readers.write_csv(src, str(tmp_path / "n_csv"))
    back = readers.read_csv(
        spark, str(tmp_path / "n_csv"), src.schema
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_malformed_is_null_not_error(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "x.csv").write_text("a,b\n1,2\nnot_an_int,3\n")
    df = readers.read_csv(spark, str(p), "a int, b int")
    rows = sorted(df.collect(), key=lambda r: (r["b"] or 0))
    assert rows[0]["a"] == 1 and rows[1]["a"] is None


def test_jsonl_roundtrip(spark, tmp_path):
    src = _nation(spark)
    readers.write_jsonl(src, str(tmp_path / "n_json"))
    back = readers.read_jsonl(spark, str(tmp_path / "n_json"), src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_roundtrip(spark, tmp_path):
    src = _nation(spark)
    readers.write_orc(src, str(tmp_path / "n_orc"))
    back = readers.read_orc(spark, str(tmp_path / "n_orc"))
    assert sorted(map(tuple, back.select(*src.columns).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_orc_filter_pushdown(spark, tmp_path):
    src = _nation(spark)
    readers.write_orc(src, str(tmp_path / "n_orc"))
    df = readers.read_orc(spark, str(tmp_path / "n_orc")).filter(
        F.col("n_nationkey") == 3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_nationkey" in plan.split(
        "PushedFilters: [", 1
    )[1].split("]", 1)[0]
