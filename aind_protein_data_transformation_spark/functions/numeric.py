"""Numeric aggregation helpers shared by the checkable queries.

Why DECIMAL: Spark and DuckDB sum doubles in different orders, so two
correct engines disagree in the low bits — at sf0.1 a revenue sum is
~1e9 and the float error (~n*eps*sum) exceeds the driver's 6-decimal
rounding. Casting each addend to DECIMAL(25,6) makes the sum exact and
engine-independent; the final cast back to DOUBLE is deterministic.
The per-row double arithmetic *before* the cast is written identically
on both sides, so it is bit-identical too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Engine-portable exact sum of a double column -> DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Engine-portable avg: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
