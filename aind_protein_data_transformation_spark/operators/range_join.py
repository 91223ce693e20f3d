"""Banded range join: count, per probe row, build rows above a value.

``count_above(probe, build)`` answers "for every probe row, how many
build rows have value strictly greater" — the aggregation form of the
inequality theta join (``probe JOIN build ON b.v > p.v GROUP BY p``).

A broadcast nested-loop join evaluates the predicate |probe|×|build|
times; fine when one side is tiny, quadratic the moment both sides are
fact-sized. Banding restores linear work:

1. bucket both sides by ``floor(v / width)`` (any deterministic
   monotone bucketing; only consistency matters, the predicate itself
   is evaluated exactly);
2. build-side bucket histogram (map-side combined, O(buckets) rows),
   then a cumulative "count strictly above this bucket" over the
   histogram — a window over O(buckets) rows, bounded by the value
   range, never by data;
3. every probe row gets its bucket's above-count broadcast-joined in,
   plus an exact boundary term from an EQUI-join against only the
   build rows sharing its bucket — the predicate is evaluated only
   inside the boundary bucket, |probe|×|build|/buckets expected pairs.

Probe rows with zero matches keep a 0 count (left join + coalesce);
callers replicating SQL's inner-join-GROUP-BY drop them with
``total > 0``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def count_above(
    probe: DataFrame,
    build: DataFrame,
    probe_col: str,
    build_col: str,
    bucket_width: float,
    out_col: str = "n_above",
) -> DataFrame:
    """Append ``out_col`` to ``probe``: count of ``build`` rows whose
    ``build_col`` is strictly greater than the row's ``probe_col``."""
    bkt = lambda c: F.floor(F.col(c).cast("double") / F.lit(bucket_width))  # noqa: E731

    bvals = build.select(F.col(build_col).alias("_bv"), bkt(build_col).alias("_bb"))
    hist = bvals.groupBy("_bb").agg(F.count("*").alias("_cnt"))
    # buckets that appear only on the probe side still need a cum row
    buckets = hist.unionByName(
        probe.select(bkt(probe_col).alias("_bb"))
        .distinct()
        .withColumn("_cnt", F.lit(0)),
    ).groupBy("_bb").agg(F.sum("_cnt").alias("_cnt"))
    w = Window.orderBy(F.desc("_bb")).rowsBetween(Window.unboundedPreceding, -1)
    cum = buckets.select(
        "_bb", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_above")
    )

    pb = probe.withColumn("_pb", bkt(probe_col))
    based = pb.join(F.broadcast(cum), pb["_pb"] == cum["_bb"], "left").drop("_bb")

    boundary = (
        pb.join(bvals, pb["_pb"] == bvals["_bb"])
        .where(F.col("_bv") > F.col(probe_col))
        .groupBy(*probe.columns)
        .agg(F.count("*").alias("_bnd"))
    )
    return (
        based.join(boundary, probe.columns, "left")
        .select(
            *probe.columns,
            (
                F.coalesce("_above", F.lit(0)) + F.coalesce("_bnd", F.lit(0))
            ).alias(out_col),
        )
    )
