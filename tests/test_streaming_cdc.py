"""Streaming CDC source (streaming/cdc.py): the commit log exposed
through Spark 4's Python Data Source API. Pins the exactly-once
contract (offsets are commit versions; a restarted stream resumes
from the checkpoint and re-reads nothing) and the scope contract
(appends stream, base commits don't)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_etl_engine_spark.sources import writers
from pdf_etl_engine_spark.streaming import cdc


def _rows(spark, vals, tenant="u1", folder="f1"):
    return spark.createDataFrame(
        [(tenant, folder, f"row_{v}", float(v)) for v in vals],
        "tenant_id string, folder_id string, row_id string, amount double",
    )


def _drain(spark, path, checkpoint):
    """Run the CDC stream to exhaustion (availableNow) and return the
    collected rows."""
    cdc.register(spark)
    got = []
    q = (
        spark.readStream.format("commitlog")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(
            lambda df, _bid: got.extend(df.collect())
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


@pytest.mark.slow
def test_cdc_streams_appends_with_versions(spark, tmp_path):
    path = str(tmp_path / "facts")
    ckpt = str(tmp_path / "ckpt")
    writers.append_rows(_rows(spark, [1, 2]), path)  # v0
    writers.append_rows(_rows(spark, [3]), path)  # v1

    got = _drain(spark, path, ckpt)
    assert sorted(r["row_id"] for r in got) == ["row_1", "row_2", "row_3"]
    by_row = {r["row_id"]: r for r in got}
    assert by_row["row_1"]["_commit_version"] == 0
    assert by_row["row_3"]["_commit_version"] == 1
    # partition-directory columns are reattached to single-file reads
    assert by_row["row_1"]["tenant_id"] == "u1"
    assert by_row["row_1"]["folder_id"] == "f1"
    assert by_row["row_2"]["amount"] == 2.0


@pytest.mark.slow
def test_cdc_resume_is_exactly_once_and_skips_compaction(spark, tmp_path):
    path = str(tmp_path / "facts")
    ckpt = str(tmp_path / "ckpt")
    writers.append_rows(_rows(spark, [1, 2]), path)
    assert len(_drain(spark, path, ckpt)) == 2

    # nothing new: resumed stream emits zero rows
    assert _drain(spark, path, ckpt) == []

    # compaction (base commit) re-adds existing rows — NOT change data
    writers.compact_fact_table(spark, path)
    assert _drain(spark, path, ckpt) == []

    # a real append after compaction streams exactly its own rows
    writers.append_rows(_rows(spark, [7, 8], folder="f2"), path)
    got = _drain(spark, path, ckpt)
    assert sorted(r["row_id"] for r in got) == ["row_7", "row_8"]
    assert {r["folder_id"] for r in got} == {"f2"}


def test_cdc_schema_requires_data_or_sidecar(spark, tmp_path):
    cdc.register(spark)
    path = str(tmp_path / "empty_t")
    with pytest.raises(Exception, match="schema|sidecar|committed"):
        (
            spark.readStream.format("commitlog")
            .option("path", path)
            .load()
        )


@pytest.mark.slow
def test_cdc_typed_partition_values(spark, tmp_path):
    """Partition columns declared non-string (date/int via a sidecar
    schema + set_partition_spec) stream as their DECLARED type, not as
    the raw Hive directory string (ADVICE r6 #1)."""
    import datetime

    from pyspark.sql import types as T

    path = str(tmp_path / "facts")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("event_date", T.DateType()),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("row_id", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    writers.create_fact_table(spark, path, schema)
    writers.set_partition_spec(path, ["event_date", "bucket"])
    df = spark.createDataFrame(
        [
            (datetime.date(2026, 1, 5), 7, "a", 1.5),
            (datetime.date(2026, 1, 6), 9, "b", 2.5),
        ],
        schema,
    )
    writers.append_rows(df, path)

    got = _drain(spark, path, ckpt)
    by_row = {r["row_id"]: r for r in got}
    assert by_row["a"]["event_date"] == datetime.date(2026, 1, 5)
    assert by_row["a"]["bucket"] == 7
    assert by_row["b"]["event_date"] == datetime.date(2026, 1, 6)
    assert by_row["b"]["bucket"] == 9
    assert by_row["b"]["amount"] == 2.5


@pytest.mark.slow
def test_cdc_timestamp_columns_roundtrip(spark, tmp_path):
    """TimestampType data columns stream back as the exact instant
    written (Spark 4 stores them as naive ns parquet; the source must
    localize to the engine's pinned UTC session tz, not crash in
    pandas tz conversion — r7 regression found by the backlog test)."""
    import datetime

    path = str(tmp_path / "facts")
    ckpt = str(tmp_path / "ckpt")
    ts = datetime.datetime(2026, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [("u1", "f1", "r1", ts)],
        "tenant_id string, folder_id string, row_id string,"
        " uploaded_at timestamp",
    )
    writers.append_rows(df, path)
    got = _drain(spark, path, ckpt)
    assert got[0]["uploaded_at"] == ts


@pytest.mark.slow
def test_cdc_sees_schema_evolution_nulls(spark, tmp_path):
    """Files written BEFORE a column existed stream NULL for it, same
    as the batch read side's schema-union contract."""
    path = str(tmp_path / "facts")
    ckpt = str(tmp_path / "ckpt")
    writers.append_rows(_rows(spark, [1]), path)
    wide = _rows(spark, [2]).withColumn("note", F.lit("n2"))
    writers.append_rows(wide, path)

    got = _drain(spark, path, ckpt)
    by_row = {r["row_id"]: r for r in got}
    assert by_row["row_2"]["note"] == "n2"
    assert by_row["row_1"]["note"] is None
