"""Pipeline-parity query: the reference's whole ingest row-build
(main.py:726-741) as one oracle-checked relational plan.

Long extracted-KPI rows (file_path, kpi_name, raw_value) → path filter
(P3) → pivot to one wide row per file (A6) → per-type coercion (F14)
→ sanitized kpi_* columns (F1/P2). This is the t2-gradable core of
ingest; the streaming/binary front end lives in pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_engine_spark.catalog import load_table, table_path
from pdf_etl_engine_spark.functions import kernel
from pdf_etl_engine_spark.operators import synth
from pdf_etl_engine_spark.registry import query

# KPI names as a user would define them (raw, pre-sanitization) and
# their inferred logical types (main.py:490-494 metadata shape).
KPI_DEFS = (
    ("Total Amount ($)", "number"),
    ("Report Date", "date"),
    ("Status", "categorical"),
)

_STATUS_EXPR = """
CASE doc_id % 4
  WHEN 0 THEN 'Approved'
  WHEN 1 THEN 'Active'
  WHEN 2 THEN 'N/A'
  ELSE 'Pending'
END
"""

_AMOUNT_EXPR = """
CASE doc_id % 6
  WHEN 0 THEN 'N/A'
  WHEN 1 THEN concat('($', doc_id % 900, ',', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '.25)')
  ELSE concat('$', doc_id % 900, ',', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '.75')
END
"""

_DATE_EXPR = """
CASE doc_id % 3
  WHEN 0 THEN concat(2020 + doc_id % 5, '-', 1 + doc_id % 12, '-', 1 + doc_id % 28)
  WHEN 1 THEN concat(1 + doc_id % 12, '/', 1 + doc_id % 28, '/', 2020 + doc_id % 5)
  ELSE 'not a date'
END
"""

_COL_AMOUNT = kernel.kpi_col_name(KPI_DEFS[0][0])
_COL_DATE = kernel.kpi_col_name(KPI_DEFS[1][0])
_COL_STATUS = kernel.kpi_col_name(KPI_DEFS[2][0])


@query(
    "pp_ingest_pivot_coerce",
    oracle=f"""
    WITH long_rows AS (
      SELECT {synth.PATH_EXPR} AS file_path,
             'Total Amount ($)' AS kpi_name, {_AMOUNT_EXPR} AS raw_value
      FROM documents
      UNION ALL
      SELECT {synth.PATH_EXPR}, 'Report Date', {_DATE_EXPR} FROM documents
      UNION ALL
      SELECT {synth.PATH_EXPR}, 'Status', {_STATUS_EXPR} FROM documents
    ), valid AS (
      SELECT * FROM long_rows
      WHERE file_path NOT LIKE '%processed/%'
        AND file_path NOT LIKE '%.placeholder%'
        AND lower(file_path) LIKE '%.pdf'
        AND len(string_split(file_path, '/')) >= 5
        AND string_split(file_path, '/')[1] = 'incoming'
        AND string_split(file_path, '/')[4] = 'batch'
    ), wide AS (
      SELECT file_path,
             string_split(file_path, '/')[len(string_split(file_path, '/'))]
               AS file_name,
             max(CASE WHEN kpi_name = 'Total Amount ($)' THEN raw_value END)
               AS raw_amount,
             max(CASE WHEN kpi_name = 'Report Date' THEN raw_value END)
               AS raw_date,
             max(CASE WHEN kpi_name = 'Status' THEN raw_value END) AS raw_status
      FROM valid GROUP BY file_path
    )
    SELECT file_name,
           {synth.sql_to_number('raw_amount')} AS {_COL_AMOUNT},
           {synth.sql_parse_date('raw_date')} AS {_COL_DATE},
           {synth.sql_null_sentinels('raw_status')} AS {_COL_STATUS}
    FROM wide
    """,
)
def pp_ingest_pivot_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest core end-to-end (main.py:656-759, minus RPCs):
    per-file KPI map → P3 path guard → A6 pivot → F14 typed coercion
    under F1-sanitized `kpi_*` names. One wide typed row per document,
    exactly the reference's fact-row shape (B5 in FIXTURES.md)."""
    docs = load_table(spark, sf_dir, "documents")
    kpi_entries = F.array(
        F.struct(
            F.lit(KPI_DEFS[0][0]).alias("kpi_name"),
            F.expr(_AMOUNT_EXPR).alias("raw_value"),
        ),
        F.struct(
            F.lit(KPI_DEFS[1][0]).alias("kpi_name"),
            F.expr(_DATE_EXPR).alias("raw_value"),
        ),
        F.struct(
            F.lit(KPI_DEFS[2][0]).alias("kpi_name"),
            F.expr(_STATUS_EXPR).alias("raw_value"),
        ),
    )
    long_rows = docs.select(
        F.expr(synth.PATH_EXPR).alias("file_path"),
        F.explode(kpi_entries).alias("kv"),
    ).select("file_path", "kv.kpi_name", "kv.raw_value")

    p = kernel.path_parts(F.col("file_path"))
    valid = long_rows.filter(
        ~F.col("file_path").contains("processed/")
        & ~F.col("file_path").contains(".placeholder")
        & F.lower(F.col("file_path")).endswith(".pdf")
        & (p["n_parts"] >= 5)
        & (p["root"] == "incoming")
        & (p["kind"] == "batch")
    )

    wide = (
        valid.groupBy("file_path")
        .pivot("kpi_name", [name for name, _ in KPI_DEFS])
        .agg(F.max("raw_value"))
    )
    return wide.select(
        kernel.path_parts(F.col("file_path"))["file_name"].alias("file_name"),
        kernel.coerce_typed(F.col(KPI_DEFS[0][0]), "number").alias(_COL_AMOUNT),
        kernel.coerce_typed(F.col(KPI_DEFS[1][0]), "date").alias(_COL_DATE),
        kernel.coerce_typed(F.col(KPI_DEFS[2][0]), "categorical").alias(_COL_STATUS),
    )
