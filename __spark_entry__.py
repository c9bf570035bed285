"""Driver contract for the spark-graft builder (PySpark target).

Delegates to pdf_etl_engine_spark's query/oracle registry: every
operator from SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame
callable plus (when SQL-expressible) a DuckDB oracle statement.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pdf_etl_engine_spark import registry  # noqa: E402

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "t1_results_topk"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's results query
    (`SELECT * ... ORDER BY uploaded_at DESC LIMIT 100`,
    /root/reference/main.py:809) over lineitem."""
    return registry.QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return dict(registry.ORACLES)
