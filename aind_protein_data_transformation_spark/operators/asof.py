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
one partition's window sort. :func:`asof_join_banded` is the
skew-resistant form — time-banded local carries plus a bounded per-key
band spine — equal answers (property-tested), one extra shuffle.
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


def asof_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    band_width: int,
    how: str = "left",
) -> DataFrame:
    """Skew-resistant as-of join: identical semantics to
    :func:`asof_join` (numeric time columns), but a HOT KEY no longer
    serializes into one window partition.

    Time is bucketed into bands of ``band_width`` (same units as the
    time columns). Three bounded stages replace the single per-key
    window:

    1. per-(key, band) summary — the latest right row of each band
       (window over one band of one key: rows bounded by band width);
    2. a band SPINE per key (every band either side touches) carries
       the latest summary from STRICTLY EARLIER bands forward — a
       window over O(bands-per-key) summary rows, never data rows;
    3. the union-sort carry runs per (key, band) — many small sorts —
       and each left row takes its within-band carry, falling back to
       the spine's earlier-band summary.

    A hot key with rows across B bands now spreads over B tasks; pick
    ``band_width`` so one band of the hottest key fits a task (e.g.
    an hour of events). Costs one extra shuffle vs asof_join — use it
    when key skew is real, keep asof_join when keys are well spread.
    """
    ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    ltype = "struct<" + ",".join(f"`{c}`:{ltypes[c]}" for c in left.columns) + ">"
    rtype = "struct<" + ",".join(f"`{c}`:{rtypes[c]}" for c in right_values) + ">"
    band = f"CAST(FLOOR(_t / {band_width}) AS BIGINT)"
    lt = left.selectExpr(
        f"`{on}`",
        f"`{left_time}` AS _t",
        "1 AS _is_left",
        f"struct({', '.join(f'`{c}`' for c in left.columns)}) AS _l",
        f"CAST(NULL AS {rtype}) AS _r",
    ).selectExpr("*", f"{band} AS _band")
    rt = right.selectExpr(
        f"`{on}`",
        f"`{right_time}` AS _t",
        "0 AS _is_left",
        f"CAST(NULL AS {ltype}) AS _l",
        f"struct({', '.join(f'`{c}`' for c in right_values)}) AS _r",
    ).selectExpr("*", f"{band} AS _band")

    w_rn = Window.partitionBy(on, "_band").orderBy(F.desc("_t"), F.asc("_is_left"))
    summaries = (
        rt.withColumn("_rn", F.row_number().over(w_rn))
        .filter(F.col("_rn") == 1)
        .select(on, "_band", F.col("_r").alias("_summary"))
    )
    spine = (
        lt.select(on, "_band").unionByName(rt.select(on, "_band")).distinct()
    )
    w_prev = (
        Window.partitionBy(on)
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = (
        spine.join(summaries, [on, "_band"], "left")
        .withColumn("_prev", F.last("_summary", ignorenulls=True).over(w_prev))
        .select(on, "_band", "_prev")
    )

    w_band = (
        Window.partitionBy(on, "_band")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        lt.unionByName(rt)
        .withColumn("_within", F.last("_r", ignorenulls=True).over(w_band))
        .filter(F.col("_is_left") == 1)
        .join(prev, [on, "_band"], "left")
        .withColumn("_asof", F.coalesce("_within", "_prev"))
    )
    if how == "inner":
        merged = merged.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError(f"unsupported how={how!r}")
    return merged.selectExpr(
        *[f"_l.`{c}` AS `{c}`" for c in left.columns],
        *[f"_asof.`{c}` AS `asof_{c}`" for c in right_values],
    )
