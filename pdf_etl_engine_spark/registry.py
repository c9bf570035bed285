"""Query/oracle registry.

Every operator from SURVEY.md §2 registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. ``__spark_entry__.py``
exposes these to the driver's correctness harness.

Parity rules enforced by convention here (SURVEY.md §7 risk #1):
* alias every computed column identically in Spark and SQL;
* round floating aggregates in BOTH engines;
* DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all semantics;
* deterministic tie-breaks on every sort/limit/top-k boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → rows-only grading."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from pdf_etl_engine_spark.operators import (  # noqa: F401
        aggregates,
        extensions,
        extras,
        filters,
        joins,
        kernels,
        pipelineq,
        scans,
        sets,
        sorts,
        windows,
    )
    from pdf_etl_engine_spark.streaming import windowq  # noqa: F401
