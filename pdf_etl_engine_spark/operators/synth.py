"""Shared synthetic-input expressions.

The reference operates on inputs the driver's testdata doesn't carry
verbatim — GCS object paths (main.py:664-672), currency/percent/
accounting strings (main.py:229-237), sentinel values (main.py:224),
mixed-type KPI samples (main.py:165-202). To grade those kernels
against the DuckDB oracle, both engines must see *identical* inputs,
so each fixture is ONE SQL expression string evaluated by Spark
(``F.expr``) and DuckDB alike (their shared dialect subset: CASE,
concat, %, lpad, CAST AS STRING). The operator under test stays a
native DataFrame expression — only fixture construction goes through
``F.expr``.

Also here: SQL renderings of the coercion kernels (``sql_to_number``
etc.) used to build oracle statements that mirror
``functions/kernel.py`` exactly.
"""

from __future__ import annotations

# --- GCS-style object paths over `documents` (main.py:664-672 grammar) ----
# 11 variants: 7 invalid shapes (processed/, .placeholder, non-pdf,
# <5 segments, wrong root, wrong kind) + uppercase-.PDF valid + valid.
PATH_EXPR = """
CASE doc_id % 11
  WHEN 0 THEN concat('processed/u', doc_id % 5, '/folder_', doc_id % 7, '/batch/doc_', doc_id, '.pdf')
  WHEN 1 THEN concat('incoming/u', doc_id % 5, '/folder_', doc_id % 7, '/batch/.placeholder')
  WHEN 2 THEN concat('incoming/u', doc_id % 5, '/folder_', doc_id % 7, '/batch/doc_', doc_id, '.txt')
  WHEN 3 THEN concat('incoming/u', doc_id % 5, '/doc_', doc_id, '.pdf')
  WHEN 4 THEN concat('staging/u', doc_id % 5, '/folder_', doc_id % 7, '/batch/doc_', doc_id, '.pdf')
  WHEN 5 THEN concat('incoming/u', doc_id % 5, '/folder_', doc_id % 7, '/master/doc_', doc_id, '.pdf')
  WHEN 6 THEN concat('incoming/u', doc_id % 5, '/folder_', doc_id % 7, '/batch/DOC_', doc_id, '.PDF')
  ELSE concat('incoming/u', doc_id % 5, '/folder_', doc_id % 7, '/batch/doc_', doc_id, '.pdf')
END
"""

# --- currency / percent / accounting-negative strings over `lineitem` ----
# Shapes from the reference's own documented cases (main.py:229-237):
# sentinels, "(…)" negatives, "N%" percents, "$9,999.99" currency.
CURRENCY_EXPR = """
CASE
  WHEN l_linenumber % 7 = 0 THEN 'N/A'
  WHEN l_linenumber % 5 = 0 THEN '---'
  WHEN l_linenumber % 3 = 0 THEN concat('($', l_orderkey % 9000, ',',
       lpad(CAST(l_partkey % 1000 AS STRING), 3, '0'), '.',
       lpad(CAST(l_suppkey % 100 AS STRING), 2, '0'), ')')
  WHEN l_linenumber % 2 = 0 THEN concat(l_orderkey % 500, '%')
  ELSE concat('$', l_orderkey % 9000, ',',
       lpad(CAST(l_partkey % 1000 AS STRING), 3, '0'), '.',
       lpad(CAST(l_suppkey % 100 AS STRING), 2, '0'))
END
"""

# --- mixed-type KPI samples over `documents` (main.py:165-202 cases) ----
MIXED_EXPR = """
CASE doc_id % 8
  WHEN 0 THEN '$1,234.56'
  WHEN 1 THEN concat(2020 + doc_id % 5, '-', 1 + doc_id % 12, '-', 1 + doc_id % 28)
  WHEN 2 THEN concat('KDC-', doc_id % 100)
  WHEN 3 THEN 'Active'
  WHEN 4 THEN 'N/A'
  WHEN 5 THEN concat('January ', 1 + doc_id % 28, ', 2024')
  WHEN 6 THEN substr(text, 1, 40)
  ELSE concat(1 + doc_id % 12, '/', 1 + doc_id % 28, '/', 2000 + doc_id % 30)
END
"""

# --- date strings in the reference's recognized formats over `orders` ----
_MONTH_NAME = """
CASE month(o_orderdate)
  WHEN 1 THEN 'January' WHEN 2 THEN 'February' WHEN 3 THEN 'March'
  WHEN 4 THEN 'April' WHEN 5 THEN 'May' WHEN 6 THEN 'June'
  WHEN 7 THEN 'July' WHEN 8 THEN 'August' WHEN 9 THEN 'September'
  WHEN 10 THEN 'October' WHEN 11 THEN 'November' ELSE 'December'
END
"""

DATE_STR_EXPR = f"""
CASE o_orderkey % 5
  WHEN 0 THEN concat(year(o_orderdate), '-', month(o_orderdate), '-', day(o_orderdate))
  WHEN 1 THEN concat(month(o_orderdate), '/', day(o_orderdate), '/', year(o_orderdate))
  WHEN 2 THEN concat({_MONTH_NAME}, ' ', day(o_orderdate), ', ', year(o_orderdate))
  WHEN 3 THEN 'not a date'
  ELSE concat(year(o_orderdate), '/', month(o_orderdate), '/', day(o_orderdate))
END
"""

# --- sentinel-laden categorical values over `part` (main.py:224-225) ----
SENTINEL_EXPR = """
CASE p_partkey % 5
  WHEN 0 THEN 'N/A'
  WHEN 1 THEN '---'
  WHEN 2 THEN ''
  WHEN 3 THEN CAST(NULL AS STRING)
  ELSE p_brand
END
"""

# ---------------------------------------------------------------------------
# DuckDB renderings of the coercion kernels — these must mirror
# pdf_etl_engine_spark/functions/kernel.py expression-for-expression.
# DuckDB regexp_replace needs the 'g' flag to match Spark replace-all.
# ---------------------------------------------------------------------------

SQL_SENTINEL = "({v} IS NULL OR {v} IN ('', 'N/A', '---'))"


def sql_clean_numeric(v: str) -> str:
    return rf"regexp_replace(trim({v}), '[$€£¥,\s%]', '', 'g')"


def sql_to_number(v: str) -> str:
    """DuckDB twin of kernel.to_number (main.py:229-239)."""
    cleaned = sql_clean_numeric(v)
    parens = (
        rf"CASE WHEN regexp_matches({cleaned}, '^\(.*\)$') "
        rf"THEN concat('-', regexp_extract({cleaned}, '^\((.*)\)$', 1)) "
        rf"ELSE {cleaned} END"
    )
    return (
        f"CASE WHEN {SQL_SENTINEL.format(v=v)} THEN NULL "
        f"ELSE TRY_CAST({parens} AS DOUBLE) END"
    )


def sql_parse_date(v: str) -> str:
    """DuckDB twin of kernel.parse_date (format chain, main.py:241-247)."""
    t = f"trim({v})"
    chain = ", ".join(
        f"try_strptime({t}, '{fmt}')"
        for fmt in (
            "%Y-%m-%d", "%Y/%m/%d", "%m/%d/%Y", "%m-%d-%Y",
            "%B %d, %Y", "%B %d %Y", "%b %d, %Y", "%b %d %Y",
            "%Y-%m-%d %H:%M:%S",
        )
    )
    return (
        f"CASE WHEN {SQL_SENTINEL.format(v=v)} THEN NULL "
        f"ELSE CAST(coalesce({chain}) AS DATE) END"
    )


def sql_sanitize_ident(v: str) -> str:
    return f"lower(regexp_replace({v}, '[^a-zA-Z0-9_]', '_', 'g'))"


def sql_null_sentinels(v: str) -> str:
    return f"CASE WHEN {SQL_SENTINEL.format(v=v)} THEN NULL ELSE {v} END"


def sql_infer_type(v: str) -> str:
    """DuckDB twin of kernel.infer_type (main.py:165-202).

    Same decision order: sentinel → numeric-after-strip → letters+digits
    (month-date / ≤30 categorical / string) → digit-date → alpha≤25 →
    string. RE2 supports (?i) and \\p{L} like Java regex.
    """
    t = f"trim({v})"
    cleaned = sql_clean_numeric(v)
    month_re = (
        "(?i)^(January|February|March|April|May|June|July|August|September|"
        "October|November|December|Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|"
        "Nov|Dec)\\s+\\d{1,2},?\\s+\\d{4}$"
    )
    return rf"""
    CASE
      WHEN {SQL_SENTINEL.format(v=v)} THEN 'string'
      WHEN regexp_matches({cleaned}, '^-?\d+\.?\d*$') THEN 'number'
      WHEN regexp_matches({t}, '[A-Za-z]') AND regexp_matches({t}, '\d') THEN
        CASE WHEN regexp_matches({t}, '{month_re}') THEN 'date'
             WHEN length({t}) <= 30 THEN 'categorical'
             ELSE 'string' END
      WHEN regexp_matches({t}, '^\d{{4}}[-/]\d{{1,2}}[-/]\d{{1,2}}$')
        OR regexp_matches({t}, '^\d{{1,2}}[-/]\d{{1,2}}[-/]\d{{4}}$')
        OR regexp_matches({t}, '^\d{{1,2}}[-/]\d{{1,2}}[-/]\d{{2}}$') THEN 'date'
      WHEN length({t}) <= 25
        AND regexp_matches(regexp_replace({t}, '[ \-]', '', 'g'), '^\p{{L}}+$')
        THEN 'categorical'
      ELSE 'string'
    END
    """
