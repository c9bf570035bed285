"""Logical type system + schema inference (SURVEY.md §1.2-1.3).

The reference infers a 4-type logical schema per folder — number /
date / categorical / string — via an LLM pass with a regex fallback
(`infer_kpi_types_with_ai` /root/reference/main.py:90-162,
`infer_kpi_type_fallback` main.py:165-202), then maps logical→physical
with a 4-entry dict (`get_bigquery_type`, main.py:208-216).

Here inference is sampling + the F13 Column-expression decision tree
(functions/kernel.py) with majority vote — one distributed aggregation
over the sample, no LLM, no Python loop over rows. An LLM-backed
inferrer can be plugged via the same `TypeInferrer` contract (the
reference's own fallback layering at main.py:159-162 legitimizes the
deterministic default).
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pdf_etl_engine_spark.functions import kernel

LOGICAL_TYPES = ("number", "date", "categorical", "string")

# Physical mapping — port of get_bigquery_type (main.py:208-216):
# number→FLOAT64, date→DATE, categorical/string→STRING, default STRING.
_SPARK_TYPES: dict[str, DataType] = {
    "number": DoubleType(),
    "date": DateType(),
    "categorical": StringType(),
    "string": StringType(),
}

# Fixed audit columns (main.py:297-301): row_id, file_name, uploaded_at.
AUDIT_FIELDS = (
    StructField("row_id", StringType()),
    StructField("file_name", StringType()),
    StructField("uploaded_at", TimestampType()),
)


def get_spark_type(logical_type: str) -> DataType:
    """Logical → physical Spark type; unknown → StringType (the
    reference's dict default, main.py:216)."""
    return _SPARK_TYPES.get(logical_type, StringType())


class TypeInferrer(Protocol):
    """Contract shared by the deterministic and (optional) LLM
    inferrers: `{kpi_name: sample_or_column}` → `{kpi_name: type}`."""

    def infer(self, samples: dict[str, str]) -> dict[str, str]: ...


class FallbackTypeInferrer:
    """Single-sample inference — the reference's per-value fallback
    (main.py:165-202) via the same decision tree the F13 Column
    expression implements."""

    def infer(self, samples: dict[str, str]) -> dict[str, str]:
        return {
            name: infer_type_of_value(value) for name, value in samples.items()
        }


def infer_type_of_value(value: str | None) -> str:
    """Driver-side single-value inference. Kept in lockstep with
    kernel.infer_type (tests assert the two agree)."""
    import re

    if value is None or value in ("", "N/A", "---"):
        return "string"
    v = str(value).strip()
    cleaned = re.sub(r"[$€£¥,\s%]", "", v)
    if re.match(r"^-?\d+\.?\d*$", cleaned):
        return "number"
    has_letters = bool(re.search(r"[A-Za-z]", v))
    has_numbers = bool(re.search(r"\d", v))
    if has_letters and has_numbers:
        month_pat = (
            r"^(January|February|March|April|May|June|July|August|September|"
            r"October|November|December|Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|"
            r"Oct|Nov|Dec)\s+\d{1,2},?\s+\d{4}$"
        )
        if re.match(month_pat, v, re.IGNORECASE):
            return "date"
        return "categorical" if len(v) <= 30 else "string"
    for pat in (
        r"^\d{4}[-/]\d{1,2}[-/]\d{1,2}$",
        r"^\d{1,2}[-/]\d{1,2}[-/]\d{4}$",
        r"^\d{1,2}[-/]\d{1,2}[-/]\d{2}$",
    ):
        if re.match(pat, v):
            return "date"
    if len(v) <= 25 and v.replace(" ", "").replace("-", "").isalpha():
        return "categorical"
    return "string"


def infer_schema(
    sample_df: DataFrame, columns: list[str] | None = None, sample_rows: int = 1000
) -> dict[str, str]:
    """Infer the logical type of each string column by majority vote
    over a sample — F13 applied as ONE select + ONE aggregation
    (mode per column), all JVM-side.

    The vote generalizes the reference (which types a column from a
    single sample value, main.py:478-494): with N samples per column,
    one odd value no longer mistypes the whole column.
    """
    cols = columns or [c for c, t in sample_df.dtypes if t == "string"]
    if not cols:
        return {}
    sample = sample_df.select(*cols).limit(sample_rows)
    typed = sample.select(
        *[kernel.infer_type(F.col(c)).alias(c) for c in cols]
    )
    # mode per column in one aggregation pass; ties broken
    # deterministically by preferring the more specific type
    # (number > date > categorical > string).
    agg_exprs = []
    for c in cols:
        for t in LOGICAL_TYPES:
            agg_exprs.append(
                F.count(F.when(F.col(c) == t, 1)).alias(f"{c}::{t}")
            )
    row = typed.agg(*agg_exprs).collect()[0].asDict()
    specificity = {t: i for i, t in enumerate(LOGICAL_TYPES)}
    result = {}
    for c in cols:
        best = max(
            LOGICAL_TYPES,
            key=lambda t: (row[f"{c}::{t}"], -specificity[t]),
        )
        result[c] = best
    return result


def fact_table_schema(kpi_metadata: list[dict[str, str]]) -> StructType:
    """Audit columns + one typed `kpi_*` column per KPI — the
    reference's typed table create (main.py:293-314)."""
    fields = list(AUDIT_FIELDS)
    for kpi in kpi_metadata:
        name = kpi.get("name", "")
        fields.append(
            StructField(
                kernel.kpi_col_name(name),
                get_spark_type(kpi.get("type", "string")),
            )
        )
    return StructType(fields)
