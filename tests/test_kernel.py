"""Unit + property tests for the scalar kernel (SURVEY.md §5.2-5.3).

The cases are the reference's own documented behaviors (FIXTURES.md
B4): currency strip, parens negatives, percents, sentinel NULLs, date
chains, categorical-not-date codes, never-raise coercion.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pdf_etl_engine_spark.functions import kernel
from pdf_etl_engine_spark.plans import types as T


def _run1(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col(F.col("v")).alias("out")).collect()[0]["out"]


def _run_many(spark, col, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [
        r["out"] for r in df.select(col(F.col("v")).alias("out")).collect()
    ]


# --- F2/F3: numeric coercion (main.py:229-239) ----------------------------

NUMBER_CASES = [
    ("$1,234.56", 1234.56),
    ("(100)", -100.0),
    ("15%", 15.0),
    ("  42  ", 42.0),
    ("€ 2.500", 2.5),          # euro strip leaves dot-decimal
    ("¥1,000,000", 1000000.0),
    ("($1,234.56)", -1234.56),
    ("-17.5", -17.5),
    ("N/A", None),
    ("---", None),
    ("", None),
    (None, None),
    ("not a number", None),    # unparseable → NULL, never error
    ("12.34.56", None),
]


def test_to_number_cases(spark):
    vals = [c[0] for c in NUMBER_CASES]
    out = _run_many(spark, kernel.to_number, vals)
    for (raw, expected), got in zip(NUMBER_CASES, out):
        assert got == pytest.approx(expected) if expected is not None else got is None, (
            f"to_number({raw!r}) = {got!r}, want {expected!r}"
        )


# --- F5: date coercion (main.py:241-247) ----------------------------------

DATE_CASES = [
    ("2024-01-15", datetime.date(2024, 1, 15)),
    ("2024/1/5", datetime.date(2024, 1, 5)),
    ("1/15/2024", datetime.date(2024, 1, 15)),
    ("01-15-2024", datetime.date(2024, 1, 15)),
    ("January 15, 2024", datetime.date(2024, 1, 15)),
    ("Jan 15 2024", datetime.date(2024, 1, 15)),
    ("not a date", None),
    ("N/A", None),
    ("", None),
    (None, None),
]


def test_parse_date_cases(spark):
    vals = [c[0] for c in DATE_CASES]
    out = _run_many(spark, kernel.parse_date, vals)
    for (raw, expected), got in zip(DATE_CASES, out):
        assert got == expected, f"parse_date({raw!r}) = {got!r}, want {expected!r}"


# --- F13: type inference (main.py:165-202) --------------------------------

INFER_CASES = [
    ("$1,234.56", "number"),
    ("15%", "number"),
    ("12345", "number"),
    ("-42.5", "number"),
    ("2024-01-15", "date"),
    ("1/15/2024", "date"),
    ("01-15-24", "date"),
    ("January 15, 2024", "date"),
    ("KDC-54", "categorical"),      # alphanumeric code, NOT date
    ("INV-001", "categorical"),
    ("ABC123", "categorical"),
    ("Active", "categorical"),
    ("Approved", "categorical"),
    ("Type A", "categorical"),
    ("N/A", "string"),
    ("---", "string"),
    ("", "string"),
    (None, "string"),
    ("This is a long free-text sentence about things.", "string"),
    ("(100)", "string"),            # reference quirk: infers string,
                                    # coerces as number if declared
]


def test_infer_type_cases(spark):
    vals = [c[0] for c in INFER_CASES]
    out = _run_many(spark, kernel.infer_type, vals)
    for (raw, expected), got in zip(INFER_CASES, out):
        assert got == expected, f"infer_type({raw!r}) = {got!r}, want {expected!r}"


def test_column_and_python_inference_agree(spark):
    """kernel.infer_type (Column) and plans.types.infer_type_of_value
    (driver-side) must implement the same decision tree."""
    vals = [c[0] for c in INFER_CASES] + [c[0] for c in NUMBER_CASES]
    col_out = _run_many(spark, kernel.infer_type, vals)
    py_out = [T.infer_type_of_value(v) for v in vals]
    assert col_out == py_out


# --- F1/F11: sanitizers ---------------------------------------------------

@pytest.mark.slow
def test_sanitizers(spark):
    assert kernel.sanitize_ident_py("Total Amount ($)") == "total_amount____"
    assert kernel.kpi_col_name("Rig ID") == "kpi_rig_id"
    assert _run1(spark, kernel.sanitize_ident, "My-Folder 2!") == "my_folder_2_"
    assert (
        _run1(spark, kernel.sanitize_email, "User.Name@Example.COM")
        == "user_name_example_com"
    )
    assert (
        _run1(spark, kernel.sanitize_filename, "inv #12 (final).pdf")
        == "inv__12__final_.pdf"
    )


def test_strip_fences_and_json_map(spark):
    fenced = '```json\n{"a": "1", "b": "x"}\n```'
    df = spark.createDataFrame([(fenced,)], "v string")
    out = df.select(
        kernel.json_to_map(kernel.strip_md_fences(F.col("v"))).alias("m")
    ).collect()[0]["m"]
    assert out == {"a": "1", "b": "x"}


# --- Property tests (SURVEY.md §5.3): coercion never raises, and ----------
# --- coerced output is either NULL or of the declared type. ---------------

@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=40,
        ),
        min_size=1,
        max_size=50,
    )
)
@pytest.mark.slow
def test_coercion_total_on_arbitrary_strings(spark, values):
    """Invariant of main.py:219-250: any string coerces or NULLs —
    never raises (ANSI-safety of the kernels)."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(
        kernel.to_number(F.col("v")).alias("n"),
        kernel.parse_date(F.col("v")).alias("d"),
        kernel.infer_type(F.col("v")).alias("t"),
    ).collect()
    for r in rows:
        assert r["n"] is None or isinstance(r["n"], float)
        assert r["d"] is None or isinstance(r["d"], datetime.date)
        assert r["t"] in T.LOGICAL_TYPES


@pytest.mark.slow
def test_fuzzy_date_udf(spark):
    """The optional dateutil-fuzzy UDF handles shapes the chain
    declines, and still never raises."""
    from pdf_etl_engine_spark.functions.fuzzy import parse_date_fuzzy

    cases = [
        ("Invoice dated January 5th, 2024 (final)", datetime.date(2024, 1, 5)),
        ("2024-01-15", datetime.date(2024, 1, 15)),
        ("totally not a date at all ???", None),
        ("N/A", None),
        (None, None),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v string")
    out = [r["d"] for r in df.select(parse_date_fuzzy(F.col("v")).alias("d")).collect()]
    assert out == [e for _, e in cases]
