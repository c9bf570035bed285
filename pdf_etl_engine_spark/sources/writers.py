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
* commit visibility note: parquet lacks Delta's atomic log. Appends
  are directory-atomic per task file; a crashed job can leave partial
  files. Production hardening = Delta/Iceberg table format — the
  engine code is format-agnostic (swap ``.format("parquet")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

PARTITION_COLS = ("tenant_id", "folder_id")


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


def append_rows(df: DataFrame, path: str) -> None:
    """S3: append typed rows. Partitioned by (tenant_id, folder_id)
    when present so reads prune partitions instead of string-building
    table names (main.py:262-264 → partition pruning)."""
    writer = df.write.mode("append").format("parquet")
    if all(c in df.columns for c in PARTITION_COLS):
        writer = writer.partitionBy(*PARTITION_COLS)
    writer.save(path)


def read_fact_table(spark: SparkSession, path: str) -> DataFrame:
    """Read with schema union across file generations (S5 read side):
    rows written before a column existed read NULL for it. The
    `_schema.json` sidecar (underscore prefix → invisible to the
    parquet reader) is ignored here by construction."""
    return spark.read.option("mergeSchema", "true").parquet(path)


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
