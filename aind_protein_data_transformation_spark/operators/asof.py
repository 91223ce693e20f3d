"""As-of join (SURVEY.md §2B; hard part (c) in §7 — Spark has no native
primitive).

Implementation: the union-sort trick. Tag both sides, union on the key
+ time axis, and carry the most recent right-side row forward with
``last(..., ignoreNulls)`` over an unbounded-preceding window. This is
ONE shuffle on (key) — the same cost as a regular sort-merge join —
and never materializes the O(left x right) inequality join a naive
range-join formulation would.

Tie semantics match DuckDB ASOF (inclusive: a right row AT the left
timestamp matches) by sorting right-tagged rows before left-tagged rows
at equal timestamps.

Skew note: a hot key (one user with millions of events) serializes into
one partition's window sort. The banded fallback (bucket time into
coarse bands, carry the last right row per band, then local resolve)
restores parallelism; not needed at harness scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` within the same ``on`` key.

    ``right_values`` are the right-side columns to carry (prefixed
    ``asof_`` in the output). ``how='inner'`` drops left rows with no
    match; ``'left'`` keeps them with nulls.
    """
    # null-struct DDL straight from the (already analyzed, memoized)
    # schemas — building a throwaway select().schema per side would cost
    # two extra plan analyses per call. Top-level identifiers are
    # backtick-quoted; precondition: column dataTypes must have a
    # round-trippable simpleString (true of every Spark SQL type whose
    # NESTED field names are identifier-safe — simpleString does not
    # quote nested struct fields).
    ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    ltype = "struct<" + ",".join(f"`{c}`:{ltypes[c]}" for c in left.columns) + ">"
    rtype = "struct<" + ",".join(f"`{c}`:{rtypes[c]}" for c in right_values) + ">"
    lt = left.selectExpr(
        f"`{on}`",
        f"`{left_time}` AS _t",
        "1 AS _is_left",
        f"struct({', '.join(f'`{c}`' for c in left.columns)}) AS _l",
        f"CAST(NULL AS {rtype}) AS _r",
    )
    rt = right.selectExpr(
        f"`{on}`",
        f"`{right_time}` AS _t",
        "0 AS _is_left",
        f"CAST(NULL AS {ltype}) AS _l",
        f"struct({', '.join(f'`{c}`' for c in right_values)}) AS _r",
    )
    # right rows sort first at equal _t -> inclusive match (DuckDB ASOF).
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn(
        "_asof", F.last("_r", ignorenulls=True).over(w)
    )
    merged = merged.filter(F.col("_is_left") == 1)
    if how == "inner":
        merged = merged.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return merged.selectExpr(
        *[f"_l.`{c}` AS `{c}`" for c in left.columns],
        *[f"_asof.`{c}` AS `asof_{c}`" for c in right_values],
    )
