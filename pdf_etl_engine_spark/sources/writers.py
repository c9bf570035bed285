"""Sinks: typed table create, append, schema evolution (SURVEY.md
§2.1 S3-S5).

The reference's sink is BigQuery streaming insert plus hand-rolled
ALTER TABLE ADD COLUMN schema sync (/root/reference/main.py:256-351,
743-748). Spark restatement on plain parquet (no Delta in this env):

* a fact table is a parquet DIRECTORY, partitioned by
  ``(tenant_id, folder_id)`` — one table per logical family instead of
  the reference's table-per-tenant×folder explosion (SURVEY.md §1.4);
* append = write new files into the partition dirs — no rewrite of
  existing data;
* evolution = appending files whose schema has MORE columns; readers
  union schemas with ``mergeSchema`` so old rows surface NULL for new
  columns — exactly the reference's add-only semantics (columns never
  dropped or retyped, main.py:277-291);
* commit visibility: plain parquet lacks Delta's atomic log, so this
  module carries a minimal one — each append stages its files, moves
  them into the partition layout, then atomically publishes a commit
  record under ``_commits/`` listing exactly those files; readers
  resolve the file set from the log. A crash at ANY point before the
  final rename leaves the new files invisible (staged dirs and
  unlogged files are never read) — closing the partial-file window
  the reference also has (BQ insert + separate archive,
  main.py:743-752). On an object store the final rename becomes a
  conditional put; with Delta/Iceberg the whole module collapses into
  the table format's own log.
"""

from __future__ import annotations

import json as _json
import os as _os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

PARTITION_COLS = ("tenant_id", "folder_id")

_COMMITS_DIR = "_commits"


def _list_parquet_files(root: str) -> list[str]:
    """Relative paths of non-hidden parquet files under ``root``."""
    out: list[str] = []
    for dirpath, dirnames, filenames in _os.walk(root):
        dirnames[:] = [
            d for d in dirnames if not d.startswith(("_", "."))
        ]
        for fn in filenames:
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                out.append(
                    _os.path.relpath(_os.path.join(dirpath, fn), root)
                )
    return sorted(out)


def _commit_entries(path: str) -> list[tuple[int, str]] | None:
    """(version, filename) pairs in version order, or None if no log."""
    cdir = _os.path.join(path, _COMMITS_DIR)
    if not _os.path.isdir(cdir):
        return None
    out = []
    for fn in _os.listdir(cdir):
        if fn.startswith((".", "_")) or not fn.endswith(".json"):
            continue
        out.append((int(fn[: -len(".json")]), fn))
    return sorted(out)


def _publish_commit(
    path: str,
    files: list[str],
    base: bool = False,
    txn: tuple[str, int] | None = None,
) -> int:
    """Atomically add the NEXT commit record and return its version.

    Versions are a dense sequence claimed via hard-link (link fails
    with EEXIST if a concurrent writer took the number — optimistic
    retry, Delta-style). ``base=True`` marks a snapshot commit:
    readers discard all earlier commits (compaction publishes these).
    Readers see all of a commit's files or none of them. ``txn``
    stamps the commit with a writer identity — see ``txn_seen``.
    """
    cdir = _os.path.join(path, _COMMITS_DIR)
    _os.makedirs(cdir, exist_ok=True)
    tmp = _os.path.join(cdir, f".tmp-{_uuid.uuid4().hex}")
    rec: dict = {"files": files, "base": base}
    if txn is not None:
        rec["txn"] = [txn[0], int(txn[1])]
    with open(tmp, "w") as fh:
        _json.dump(rec, fh)
    try:
        while True:
            entries = _commit_entries(path) or []
            version = (entries[-1][0] + 1) if entries else 0
            target = _os.path.join(cdir, f"{version:020d}.json")
            try:
                _os.link(tmp, target)
                return version
            except FileExistsError:
                continue  # lost the race — claim the next number
    finally:
        _os.unlink(tmp)


def txn_seen(path: str, app_id: str, batch_id: int) -> bool:
    """True if a commit stamped ``(app_id, batch_id)`` is already in
    the log — the idempotence check behind exactly-once streaming
    sinks (Delta's ``txn`` action). A replayed micro-batch (crash
    between sink commit and checkpoint advance) sees its own earlier
    commit and publishes nothing.

    Commit records are never deleted (vacuum removes only data files),
    so the marker survives compaction. The linear scan over commit
    JSONs is O(commits); a real table format folds this into snapshot
    state — with Delta this whole function is ``txnVersion``.
    """
    entries = _commit_entries(path) or []
    cdir = _os.path.join(path, _COMMITS_DIR)
    want = [app_id, int(batch_id)]
    for _v, fn in entries:
        with open(_os.path.join(cdir, fn)) as fh:
            if _json.load(fh).get("txn") == want:
                return True
    return False


def table_version(path: str) -> int | None:
    """Latest commit version, or None for an unlogged/empty table."""
    entries = _commit_entries(path)
    if not entries:
        return None
    return entries[-1][0]


def committed_files(path: str, version: int | None = None) -> list[str] | None:
    """Relative data-file paths named by the commit log — the table
    snapshot as of ``version`` (default: latest) — or None when the
    table has no log (legacy directory-listing table). A ``base``
    commit resets the file set (compaction snapshot)."""
    entries = _commit_entries(path)
    if entries is None:
        return None
    cdir = _os.path.join(path, _COMMITS_DIR)
    files: list[str] = []
    for v, fn in entries:
        if version is not None and v > version:
            break
        with open(_os.path.join(cdir, fn)) as fh:
            rec = _json.load(fh)
        if rec.get("base"):
            files = list(rec.get("files", []))
        else:
            files.extend(rec.get("files", []))
    return files


def create_fact_table(
    spark: SparkSession, path: str, schema: StructType
) -> None:
    """S4: declare a typed table (the reference's typed create,
    main.py:293-314). On plain parquet there is no metastore to hold
    an empty table's schema, and writing schema-bearing files at the
    table ROOT would conflict with the partitioned layout the appends
    use (`tenant_id=/folder_id=` directories) — so the physical table
    materializes on first append, and this declares the schema as a
    sidecar the readers can consult before data exists. With a real
    table format (Delta/Iceberg/metastore) this becomes CREATE TABLE.
    """
    import json as _json
    import os as _os

    _os.makedirs(path, exist_ok=True)
    with open(_os.path.join(path, "_schema.json"), "w") as fh:
        _json.dump(schema.jsonValue(), fh)


def append_rows(
    df: DataFrame, path: str, txn: tuple[str, int] | None = None
) -> bool:
    """S3: atomic append of typed rows. Partitioned by
    (tenant_id, folder_id) when present so reads prune partitions
    instead of string-building table names (main.py:262-264 →
    partition pruning).

    Protocol: write to a hidden staging dir (one per append), move the
    data files into their final partition dirs under commit-unique
    names, then publish one commit record naming them. Readers resolve
    files from the log, so a crash mid-append publishes nothing.

    ``txn=(app_id, batch_id)`` makes the append idempotent: if the log
    already holds that transaction the call is a no-op (returns
    False). This is what turns a checkpointed ``foreachBatch`` stream
    into an exactly-once sink — replays re-run the batch but cannot
    commit it twice. Returns True when rows were published.
    """
    if txn is not None and txn_seen(path, txn[0], txn[1]):
        return False
    # Bootstrap: a legacy table (files but no log) gets its existing
    # files recorded first so they stay visible under log-based reads.
    existing = _list_parquet_files(path)
    if existing and committed_files(path) is None:
        _publish_commit(path, existing)
    moved = _stage_files(df, path)
    _publish_commit(path, moved, txn=txn)
    return True


def _stage_files(df: DataFrame, path: str) -> list[str]:
    """Write ``df`` into the table's partition layout via a hidden
    staging dir; returns the relative paths of the moved data files
    (NOT yet published — the caller decides the commit record)."""
    commit_tag = _uuid.uuid4().hex[:12]
    staging = _os.path.join(path, f"_staging-{commit_tag}")
    writer = df.write.mode("overwrite").format("parquet")
    if all(c in df.columns for c in PARTITION_COLS):
        writer = writer.partitionBy(*PARTITION_COLS)
    writer.save(staging)
    moved: list[str] = []
    for rel in _list_parquet_files(staging):
        dst_rel = _os.path.join(
            _os.path.dirname(rel), f"c{commit_tag}-{_os.path.basename(rel)}"
        )
        dst = _os.path.join(path, dst_rel)
        _os.makedirs(_os.path.dirname(dst), exist_ok=True)
        _os.replace(_os.path.join(staging, rel), dst)
        moved.append(dst_rel)

    import shutil as _shutil

    _shutil.rmtree(staging, ignore_errors=True)
    return moved


def compact_fact_table(spark: SparkSession, path: str) -> int:
    """Small-file compaction: rewrite the CURRENT snapshot with one
    file per (tenant_id, folder_id) partition and publish it as a
    ``base`` commit — readers atomically switch to the compacted
    layout; older versions stay readable (time travel) until
    ``vacuum_fact_table`` reclaims their files.

    The at-scale need: streaming ingest appends a file per micro-batch
    per partition, and scan cost degrades with file count. On a
    cluster you'd target ~1 GB files (repartition by size) instead of
    one per partition. Returns the new table version.
    """
    current = read_fact_table(spark, path)
    if all(c in current.columns for c in PARTITION_COLS):
        current = current.repartition(*[F.col(c) for c in PARTITION_COLS])
    else:
        current = current.coalesce(1)
    files = _stage_files(current, path)
    return _publish_commit(path, files, base=True)


def vacuum_fact_table(path: str, min_age_s: float = 3600.0) -> list[str]:
    """Delete data files not referenced by the CURRENT snapshot
    (orphans from crashed appends + pre-compaction generations).
    Time-travel reads older than the last ``base`` commit stop working
    — run only once no reader needs them (the retention trade every
    log-structured table format has). Returns the deleted paths.

    ``min_age_s`` is the in-flight-append guard (Delta's retention
    check): ``append_rows`` moves data files into the layout BEFORE
    publishing their commit, so an unreferenced file younger than the
    grace window may belong to an append between its move and its
    publish — deleting it would make that commit reference missing
    files. Only pass 0 when no writer can be active."""
    import time as _time

    live = set(committed_files(path) or [])
    cutoff = _time.time() - min_age_s
    removed = []
    for rel in _list_parquet_files(path):
        if rel in live:
            continue
        full = _os.path.join(path, rel)
        try:
            if _os.path.getmtime(full) > cutoff:
                continue  # possibly an in-flight append: leave it
            _os.unlink(full)
        except FileNotFoundError:
            continue
        removed.append(rel)
    return removed


def read_fact_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read with schema union across file generations (S5 read side):
    rows written before a column existed read NULL for it.

    File resolution honors the commit log when one exists — data
    files a crashed append moved into place but never published are
    NOT read — and ``version`` reads the snapshot as of that commit
    (time travel; versions are returned by ``table_version``). Tables
    without a log (or written by other tools) fall back to directory
    listing; `_schema.json`, `_commits/` and `_staging-*/` (underscore
    prefixes) are invisible to the parquet reader by Hadoop's
    hidden-path convention."""
    files = committed_files(path, version=version)
    if files is None:
        return spark.read.option("mergeSchema", "true").parquet(path)
    if not files:
        schema = _read_sidecar_schema(path)
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise FileNotFoundError(f"empty committed table at {path}")
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(*[_os.path.join(path, f) for f in files])
    )


def _read_sidecar_schema(path: str) -> StructType | None:
    sidecar = _os.path.join(path, "_schema.json")
    if not _os.path.exists(sidecar):
        return None
    with open(sidecar) as fh:
        return StructType.fromJson(_json.load(fh))


def evolve_columns(
    existing: set[str], kpi_metadata: list[dict[str, str]]
) -> list[dict[str, str]]:
    """S5 planning: which metadata columns are new to the table.
    Mirrors the reference's existing-columns diff (main.py:274-291) —
    add-only; never drops, never retypes."""
    from pdf_etl_engine_spark.functions import kernel

    return [
        kpi
        for kpi in kpi_metadata
        if kernel.kpi_col_name(kpi.get("name", "")) not in existing
    ]


def align_to_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Project/cast a batch to the target table schema, adding NULLs
    for table columns the batch lacks (legacy rows) and keeping any
    new batch columns (evolution) at the end."""
    out = []
    for field in schema.fields:
        if field.name in df.columns:
            out.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    extra = [c for c in df.columns if c not in {f.name for f in schema.fields}]
    return df.select(*out, *extra)
