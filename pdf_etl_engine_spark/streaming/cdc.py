"""Streaming change-data-capture over the commit log — the table
format's change feed (`sources/writers.read_changes`) exposed as a
REAL Structured Streaming source via Spark 4's Python Data Source API.

The reference has no change feed at all (BigQuery streaming inserts
are fire-and-forget, /root/reference/main.py:743-744); Delta exposes
the equivalent as ``readStream.format("delta")``. Here:

    register(spark)
    df = (spark.readStream.format("commitlog")
          .option("path", table_path).load())

Offsets ARE commit versions: ``latestOffset`` is ``table_version``,
a micro-batch reads the commits in ``(start, end]``, and Spark's
checkpointed offset log + the dense monotonic version sequence give
exactly-once delivery end to end (replayed batches re-read exactly
the same closed version interval). One InputPartition per data FILE
(not per commit), so a wide commit fans out across executors.

Scope matches ``read_changes``: appended rows only — COW/MOR deletes
rewrite or mask history and emit no change rows. Base (compaction)
commits are skipped: they re-add existing rows, not new data.
"""

from __future__ import annotations

import json as _json
import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StructField, StructType

from pdf_etl_engine_spark.sources import writers as _w

_VERSION_COL = "_commit_version"


def _changed_files(path: str, start_v: int, end_v: int) -> list[tuple[int, str]]:
    """(version, relative file path) for every data file added by a
    non-base commit in ``(start_v, end_v]`` — the same commit-record
    walk ``read_changes`` does, without a SparkSession."""
    out: list[tuple[int, str]] = []
    for v, fn in _w._commit_entries(path) or []:
        if v <= start_v or v > end_v:
            continue
        rec = _w._load_commit(path, fn)  # resolves manifest indirection
        if rec.get("base"):
            continue
        out.extend((v, f) for f in rec.get("files", []))
    return out


def _partition_values(rel_path: str) -> dict[str, str]:
    """Hive-style ``key=value`` directory components of a data file's
    relative path — the partition columns a single-file parquet read
    does not carry."""
    vals: dict[str, str] = {}
    for seg in rel_path.split(_os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            vals[k] = v
    return vals


def _cast_partition_value(raw: str, dt) -> object:
    """Parse a Hive directory-name partition value into the declared
    field type — mirroring Spark's own partition-value casting
    (PartitioningUtils.inferPartitionColumnValue): the directory name
    is always a string, but the column may be declared int/date/…
    (e.g. via set_partition_spec generated columns), and emitting raw
    strings against a typed StructField fails the Python data source's
    row conversion. ``__HIVE_DEFAULT_PARTITION__`` is the null marker."""
    import datetime as _dt
    import decimal as _decimal
    from urllib.parse import unquote as _unquote

    from pyspark.sql import types as _T

    raw = _unquote(raw)
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if isinstance(dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType)):
        return int(raw)
    if isinstance(dt, (_T.FloatType, _T.DoubleType)):
        return float(raw)
    if isinstance(dt, _T.DecimalType):
        return _decimal.Decimal(raw)
    if isinstance(dt, _T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dt, _T.DateType):
        return _dt.date.fromisoformat(raw)
    if isinstance(dt, _T.TimestampType):
        return _dt.datetime.fromisoformat(raw.replace(" ", "T"))
    return raw


def _stream_schema(path: str) -> StructType:
    """The change feed's row schema: the table schema (sidecar when
    declared, else reconstructed from the newest committed file plus
    its partition directory columns) with ``_commit_version`` appended.
    Like any stream, the schema is fixed at query start; columns added
    by later schema evolution need a stream restart (Delta's contract
    too)."""
    base = _w._read_sidecar_schema(path)
    if base is None:
        files = _w.committed_files(path) or []
        if not files:
            raise ValueError(
                f"cannot infer change-feed schema: no sidecar schema and "
                f"no committed files at {path}"
            )
        import pyarrow.parquet as _pq
        from pyspark.sql.pandas.types import from_arrow_schema

        rel = files[-1]
        base = from_arrow_schema(
            _pq.read_schema(_os.path.join(path, rel))
        )
        for k in _partition_values(rel):
            # partition dir values are strings on this path; declare a
            # sidecar schema (create_fact_table) for typed partitions
            base = base.add(k, "string")
    return StructType(
        # every data field is nullable: files written before a column
        # existed stream NULL for it, even when newer files declare the
        # column required (schema-union contract of the batch reader)
        [StructField(f.name, f.dataType, True) for f in base.fields]
        + [StructField(_VERSION_COL, LongType(), False)]
    )


class _FilePartition(InputPartition):
    def __init__(self, version: int, abs_path: str, rel_path: str):
        self.version = version
        self.abs_path = abs_path
        self.rel_path = rel_path


class CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, start_version: int):
        self._path = path
        self._schema = schema
        self._start = start_version

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        v = _w.table_version(self._path)
        return {"version": -1 if v is None else v}

    def partitions(self, start: dict, end: dict):
        files = _changed_files(
            self._path, int(start["version"]), int(end["version"])
        )
        if not files:
            # Spark requires >= 1 partition per planned batch; an empty
            # interval (e.g. only base commits) reads zero rows from it
            return [_FilePartition(int(end["version"]), "", "")]
        return [
            _FilePartition(v, _os.path.join(self._path, f), f)
            for v, f in files
        ]

    @staticmethod
    def _norm_column(vals: list, dt) -> list:
        """Normalize pyarrow ``to_pylist`` values for Spark's Python
        data source row conversion. Spark 4 writes TimestampType as
        naive nanosecond parquet (session tz pinned UTC by the engine,
        session.py), which pyarrow surfaces as tz-naive pandas
        Timestamps — Spark's converter then calls ``tz_convert`` on
        them and fails. Localize naive instants to UTC (the session
        tz they were written in) and hand over plain datetimes."""
        import datetime as _dt

        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(dt, TimestampType):
            out = []
            for v in vals:
                if v is not None and isinstance(v, _dt.datetime):
                    if v.tzinfo is None:
                        v = v.replace(tzinfo=_dt.timezone.utc)
                    if hasattr(v, "to_pydatetime"):
                        v = v.to_pydatetime()
                out.append(v)
            return out
        if isinstance(dt, TimestampNTZType):
            return [
                v.to_pydatetime() if hasattr(v, "to_pydatetime") else v
                for v in vals
            ]
        return vals

    def read(self, partition: _FilePartition):
        if not partition.abs_path:
            return
        import pyarrow.parquet as _pq

        table = _pq.read_table(partition.abs_path)
        cols = {c.lower(): c for c in table.column_names}
        part_vals = _partition_values(partition.rel_path)
        n = table.num_rows
        out_cols = []
        for field in self._schema.fields[:-1]:
            if field.name in part_vals:
                val = _cast_partition_value(
                    part_vals[field.name], field.dataType
                )
                out_cols.append([val] * n)
            elif field.name.lower() in cols:
                out_cols.append(
                    self._norm_column(
                        table.column(cols[field.name.lower()]).to_pylist(),
                        field.dataType,
                    )
                )
            else:  # column added after this file was written
                out_cols.append([None] * n)
        version = [partition.version] * n
        yield from zip(*out_cols, version)

    def commit(self, end: dict) -> None:
        pass  # commit records are never deleted; nothing to release


class CommitLogDataSource(DataSource):
    """``spark.readStream.format("commitlog").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "commitlog"

    def schema(self):
        return _stream_schema(self._table_path())

    def _table_path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("commitlog source requires .option('path', …)")
        return path

    def streamReader(self, schema: StructType) -> CommitLogStreamReader:
        start = int(self.options.get("startingversion", -1))
        return CommitLogStreamReader(self._table_path(), schema, start)


def register(spark: SparkSession) -> None:
    """Register the change-feed source for this session (idempotent)."""
    spark.dataSource.register(CommitLogDataSource)


# ---------------------------------------------------------------------------
# Graded entry: the CDC source run as a real streaming query
# ---------------------------------------------------------------------------

from pdf_etl_engine_spark.catalog import load_table  # noqa: E402
from pdf_etl_engine_spark.registry import query  # noqa: E402


@query(
    "stw_cdc_commitlog",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS commit_version,
           count(*) AS n_rows, sum(l_quantity) AS sum_qty
    FROM lineitem WHERE l_orderkey % 7 = 0
    UNION ALL
    SELECT CAST(1 AS BIGINT) AS commit_version,
           count(*) AS n_rows, sum(l_quantity) AS sum_qty
    FROM lineitem WHERE l_orderkey % 7 = 1
    """,
)
def stw_cdc_commitlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC feed graded batch-equivalently: two known lineitem slices
    are appended as commits v0 and v1 of a scratch table, the
    ``commitlog`` streaming source drains them (availableNow), and the
    per-commit row counts and quantity sums must equal what the oracle
    computes straight from lineitem — proving the feed delivers
    exactly the appended rows, each stamped with the commit that added
    it. l_quantity is integral, so the double sums are exact in any
    accumulation order.

    Scale: the source plans one InputPartition per data FILE, so a
    wide commit fans out across executors; offsets are commit versions
    checkpointed by Spark, giving exactly-once across restarts (pinned
    by tests/test_streaming_cdc.py)."""
    import shutil as _shutil
    import tempfile as _tempfile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    path = _tempfile.mkdtemp(prefix="cdc_graded_")
    try:
        _w.append_rows(li.filter(F.col("l_orderkey") % 7 == 0), path)
        _w.append_rows(li.filter(F.col("l_orderkey") % 7 == 1), path)
        register(spark)
        got: list = []
        ckpt = _os.path.join(path, "_ckpt")
        q = (
            spark.readStream.format("commitlog")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(
                lambda df, _bid: got.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.createDataFrame(got)
    finally:
        _shutil.rmtree(path, ignore_errors=True)
    return out.groupBy(
        F.col(_VERSION_COL).alias("commit_version")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
    )
