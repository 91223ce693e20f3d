"""Numeric aggregation helpers shared by the checkable queries.

Why not plain double sums: Spark and DuckDB sum doubles in different
orders, so two correct engines disagree in the low bits — at sf0.1 a
revenue sum is ~1e9 and the float error (~n*eps*sum) exceeds the
driver's 6-decimal rounding. Both sides therefore sum EXACTLY at scale
6 and only convert to DOUBLE at the end, which is deterministic.

The DuckDB oracle does it the obvious way: ``SUM(CAST(x AS
DECIMAL(25,6)))``. The Spark side computes the *same exact value*
through a split fixed-point sum that stays on the primitive-long fast
path end to end (measured 2.6x faster than decimal aggregation, whose
sum accumulator exceeds Spark's 18-digit compact representation and
falls into per-row java.math.BigDecimal):

1. per row, the scale-6 fixed-point value ``u = floor(x*1e6 + 0.5)``
   (a pure FP round-to-micros — no Decimal allocation);
2. two long sums of the split halves ``hi = floor(u / 2^20)``,
   ``lo = pmod(u, 2^20)`` (identity ``hi*2^20 + lo == u`` holds for
   either sign; each partial sum stays < 2^63 up to ~1e12 rows of
   values < 1e12, i.e. far beyond 100 TB);
3. one post-aggregation recombine in DECIMAL(38,6) — k groups, not n
   rows — and a final cast to DOUBLE, identical to casting DuckDB's
   exact decimal sum.

Equivalence caveat (documented, verified empirically across sf0.001/
sf0.01/sf0.1): ``floor(x*1e6+0.5)`` rounds half-up toward +inf while a
decimal cast rounds half away from zero — they can differ only when
``x*1e6`` lands EXACTLY on .5 in binary double, a measure-zero knife
edge no generated value hits. The per-row double arithmetic *before*
fixed-pointing is written identically on both sides, so it is
bit-identical too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spark-side decimal type for the few places that still sum via decimal
#: (window frames over small partitions, streaming state) — scale 6,
#: compact-long representable.
DEC = "decimal(18,6)"

#: Split radix: 2^20. hi-sums carry value/2^20, lo-sums carry < 2^20 per
#: row; both stay inside int64 beyond 10^12 rows.
_M = 1 << 20


def _fixed_micros(c: Column) -> Column:
    """Scale-6 fixed-point (micros) of a double column, as long."""
    return F.floor(c.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def exact_sum(col: Column | str) -> Column:
    """Exact scale-6 sum of a double column as DOUBLE (unaliased).

    One Column containing two long SUMs plus a k-group decimal
    recombine; drop-in replacement for ``SUM(CAST(. AS DECIMAL))`` with
    the same exact value (see module docstring). Composable: ratios like
    ``exact_sum(a) / exact_sum(b)`` stay single aggregation passes.
    """
    if isinstance(col, str):
        # any SQL expression (not just a column name): the
        # single-crossing F.expr path
        return F.expr(exact_sum_sql(col))
    u = _fixed_micros(col)
    hi = F.sum(F.floor(u / F.lit(_M)).cast("long"))
    lo = F.sum(F.pmod(u, F.lit(_M)))
    total = (hi.cast("decimal(32,0)") * F.lit(_M) + lo).cast("decimal(38,0)")
    # exact: multiply by the scale-6 unit instead of dividing (decimal
    # division re-infers scale and may round; multiplication cannot)
    return (total * F.lit("0.000001").cast("decimal(7,6)")).cast("double")


def exact_sum_sql(expr: str) -> str:
    """Spark-SQL text of the split fixed-point exact sum of ``expr``.

    The string form of :func:`exact_sum`, expression-for-expression
    (``D`` suffixes keep the literals DOUBLE, matching ``F.lit``; bare
    SQL decimals would parse as DECIMAL). Exists so hot query builders
    can assemble whole aggregates in one ``F.expr`` py4j crossing
    instead of ~15 Column calls each.
    """
    # same exactness trick as the Column path: multiply by the scale-6
    # unit, never divide (recombine); built from the shared partials so
    # every consumer agrees on the radix/scaling by construction
    hi, lo = exact_sum_partials_sql(expr)
    return exact_recombine_sql(hi, lo)


def fixed_micros_sql(expr: str) -> str:
    """SQL text of :func:`_fixed_micros`: the scale-6 fixed-point long.
    Project this ONCE and feed the column to
    :func:`split_partials_sql` — aggregate expressions get no common-
    subexpression elimination, so inlining the fixed-pointing into both
    partials (what :func:`exact_sum_partials_sql` does) evaluates it
    twice per row (measured +25% on the rollup fine aggregate)."""
    return f"CAST(FLOOR(CAST(({expr}) AS DOUBLE) * 1000000.0D + 0.5D) AS BIGINT)"


def split_partials_sql(u_col: str) -> tuple[str, str]:
    """The two long SUM partials over an already-fixed-point column
    (``(hi_sql, lo_sql)``). The partials are plain longs, so consumers
    that re-aggregate across levels (rollup-by-reaggregation) sum them
    again exactly; :func:`exact_recombine_sql` turns the re-summed pair
    back into the DOUBLE ``exact_sum_sql`` yields — one definition of
    the radix/scaling instead of hand-copied constants."""
    return (
        f"SUM(CAST(FLOOR({u_col} / {_M}) AS BIGINT))",
        f"SUM(PMOD({u_col}, {_M}))",
    )


def exact_sum_partials_sql(expr: str) -> tuple[str, str]:
    """Partials with the fixed-pointing inlined (single-expression
    convenience; see :func:`fixed_micros_sql` for when to project
    instead)."""
    return split_partials_sql(fixed_micros_sql(expr))


def exact_recombine_sql(hi: str, lo: str) -> str:
    """Recombine (re-)aggregated split partials into the exact DOUBLE.
    ``hi``/``lo`` are SQL expressions (typically ``SUM(hi)``/``SUM(lo)``
    over stored partial columns)."""
    total = f"CAST(CAST({hi} AS DECIMAL(32,0)) * {_M} + {lo} AS DECIMAL(38,0))"
    return f"CAST({total} * CAST('0.000001' AS DECIMAL(7,6)) AS DOUBLE)"


def dsum(col: Column | str, alias: str) -> Column:
    """Engine-portable exact sum of a double column -> DOUBLE."""
    return exact_sum(col).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Engine-portable avg: exact fixed-point sum / count, divided as
    doubles (same division both engines)."""
    if isinstance(col, str):
        return F.expr(f"{exact_sum_sql(col)} / COUNT({col}) AS {alias}")
    return (exact_sum(col) / F.count(col)).alias(alias)


def spark_dsum_sql(expr: str, alias: str) -> str:
    """Spark-SQL text twin of :func:`dsum` — for queries shipped as one
    static ``spark.sql`` statement."""
    return f"{exact_sum_sql(expr)} AS {alias}"


def spark_davg_sql(expr: str, alias: str) -> str:
    """Spark-SQL text twin of :func:`davg`."""
    return f"{exact_sum_sql(expr)} / COUNT({expr}) AS {alias}"


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum` (plain exact decimal sum)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
