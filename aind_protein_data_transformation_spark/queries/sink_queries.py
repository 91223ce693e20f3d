"""Sink round-trip queries — the write side of the driver contract.

The reference's output side is a partitioned, compressed columnar store
(czi_to_zarr.py:545-553 writes zstd-compressed chunked levels laid out
``level=k/``); the relational twin here is a partitioned zstd parquet
write. The query writes through the real sink and returns what a fresh
scan of the written files yields, so the CORRECTNESS row certifies the
whole write→read loop (row fidelity, partition-column recovery, type
round-trip), not just the logical plan.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "sink_parquet_roundtrip",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned zstd parquet sink round-trip: aggregate orders, write
    ``partitionBy(o_orderstatus)`` with zstd, read the files back and
    return them. Partition pruning on the read side hits the directory
    layout (``o_orderstatus=F/``); bigint/double round-trip bit-exact
    through parquet, so the oracle is simply the same aggregate on the
    source table. At 100 TB this layout is the fan-in target of every
    pipeline here — one shuffle to the agg, then a parallel write.

    The same aggregate is ALSO written through the CSV sink and read
    back with an explicit schema (CSV scan coverage, SURVEY §2B row
    "CSV scan"): the returned frame joins n_orders from the parquet leg
    with total_spend from the CSV leg, so a corruption in either
    write→read loop breaks the hash. Doubles survive CSV because Spark
    writes the shortest round-trippable decimal form (Java
    Double.toString contract).

    The output paths are fixed (overwrite mode), so repeated runs reuse
    the directories and the returned DataFrame stays a lazy scan of the
    written files — no driver-side collect anywhere."""
    out = os.path.join(tempfile.gettempdir(), "spark_graft_sink_roundtrip")
    out_csv = os.path.join(tempfile.gettempdir(), "spark_graft_sink_roundtrip_csv")
    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_spend"),
        )
    )
    (
        agg.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("o_orderstatus")
        .parquet(out)
    )
    agg.write.mode("overwrite").option("header", "true").csv(out_csv)
    pq = spark.read.parquet(out).select(
        "o_orderstatus", "o_orderpriority", "n_orders"
    )
    csv = spark.read.schema(
        "o_orderstatus string, o_orderpriority string, "
        "n_orders bigint, total_spend double"
    ).option("header", "true").csv(out_csv).select(
        "o_orderstatus", "o_orderpriority", "total_spend"
    )
    return pq.join(csv, ["o_orderstatus", "o_orderpriority"]).orderBy(
        "o_orderstatus", "o_orderpriority"
    )


@query(
    "sink_zorder_clustered_scan",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_discount BETWEEN 0.06 AND 0.08
      AND l_quantity < 10
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sink_zorder_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered write → pruned multi-column box scan
    (operators/layout.py — quantile-binned Morton key, pure built-ins).

    Writes lineitem re-clustered on (l_shipdate, l_discount,
    l_quantity) — one sketch pass for bin edges, one range shuffle, a
    per-partition sort — then answers a discount+quantity box predicate
    from the files it just wrote. The predicate deliberately has NO
    date term: that is the predicate shape a single-key (date-sorted /
    date-partitioned) 100-TB layout cannot prune at all, and the
    z-order layout's measured keep-fraction for this exact box is 0.33
    vs 1.0 single-key (scripts/exp_zorder.py, deterministic footer
    geometry; BENCH.md round 12). ``curve="hilbert"`` is the measured
    winner at both tested scales (0.19 vs Morton's 0.24 at the 10x
    layout — no quadrant jumps, tighter per-row-group boxes), so the
    shipped query uses it explicitly; the broadcast Morton→Hilbert
    lookup is geometry-sized (2^18 cells here), never data-sized.
    (bits=6 here is explicit for write-path coverage and run-to-run
    determinism — this table lands as ~8 single-group files at sf
    scales, too few groups for sizing to matter; production callers
    should leave ``bits=None``, the operator default since round 13,
    which law-sizes the geometry — cells ≈ row-group count, the
    measured optimum from BENCH.md round 12 — from the table's actual
    observed rows-per-row-group.)
    Correctness leg: the layout must not change the answer, so the
    oracle runs the same box aggregate on the ORIGINAL table — any row
    lost, duplicated, or re-typed by the cluster-write breaks the
    hash.

    Reference parity: the reference's output side is layout chosen for
    the downstream access pattern (czi_to_zarr.py:545-553 chunked
    viewer-sized zarr levels); this is the relational form of the same
    decision."""
    from ..operators.layout import zorder_layout

    out = os.path.join(tempfile.gettempdir(), "spark_graft_sink_zorder")
    li = load_table(spark, sf_dir, "lineitem")
    zorder_layout(
        li, ["l_shipdate", "l_discount", "l_quantity"], out,
        bits=6, num_files=8, curve="hilbert",
    )
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("l_discount") >= 0.06)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 10)
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                  .cast("decimal(25,6)")).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "sink_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join (plans/scale.py
    ``write_bucketed``) — the write-side layout contract that removes
    the join shuffle entirely, driver-checkable end to end.

    The 100-TB problem: orders ⋈ lineitem on the order key runs in
    every pipeline, and at fact-fact scale NEITHER side broadcasts —
    each run pays two full shuffles of the big tables. Bucketing both
    tables into the same bucket count on the join key at WRITE time
    makes every subsequent join read co-located buckets directly:
    SortMergeJoin with zero Exchange, the one shuffle pathology AQE
    cannot remove at runtime (AQE can only resize/convert exchanges
    that are already in the plan; bucketing removes them from the plan
    altogether). The write cost amortizes across every downstream run
    — the same layout-work-once-pay-back-every-scan argument as the
    Z-order sink.

    The zero-shuffle property IS the lever, so the query asserts it:
    if the joined plan contains any Exchange the query raises (a red
    driver row, never a silently-shuffled green). ``hint("merge")``
    pins SortMergeJoin without touching any session conf (at sandbox
    SF the dimension side would otherwise broadcast; at 100 TB SMJ is
    what the planner picks anyway). The final groupBy aggregates the
    joined rows — that exchange is inherent to the aggregation (its
    input is already bucket-local), and the assertion deliberately
    covers the JOIN subplan only.

    Correctness leg: the bucketed write must not lose, duplicate, or
    re-type rows, so the oracle runs the same join+aggregate on the
    ORIGINAL tables — any row the bucketed write→scan loop corrupts
    breaks the hash."""
    from ..plans.scale import write_bucketed

    root = os.path.join(tempfile.gettempdir(), "spark_graft_bucketed_join")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    write_bucketed(orders, "graft_orders_bkt", "o_orderkey", 8,
                   ["o_orderkey"], path=f"{root}/orders")
    write_bucketed(li, "graft_lineitem_bkt", "o_orderkey", 8,
                    ["o_orderkey"], path=f"{root}/lineitem")
    joined = (
        spark.table("graft_orders_bkt")
        .hint("merge")
        .join(spark.table("graft_lineitem_bkt"), "o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise RuntimeError(
            "bucketed join planned an Exchange — the zero-shuffle "
            "layout contract broke:\n" + plan
        )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(25,6)")
            ).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "sink_zorder_string_scan",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE source BETWEEN 'src10' AND 'src16'
      AND n_chars BETWEEN 100 AND 300
    GROUP BY source
    ORDER BY source
    """,
)
def sink_zorder_string_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING-column clustered write → string-box pruned scan (round
    13: ``operators/layout._numeric_expr`` bins strings through an
    order-preserving 6-byte UTF-8 prefix surrogate, pure built-ins).

    Clusters documents on (source, n_chars) — a string key and a
    numeric key interleaved — then answers a string-range + numeric
    band box from the written files. The string range deliberately
    crosses the classic lexicographic trap (``'src10' < 'src2'``
    bytewise): both the surrogate's placement and the read-side
    predicate must agree with the oracle's string collation or rows
    appear/vanish at the band edges. The surrogate only PLACES rows —
    the stored column and its parquet min/max stats are the real
    strings, so correctness never depends on the 6-byte prefix
    (pruning geometry for string boxes is test-pinned equal to Spark's
    own ``numOutputRows`` in tests/test_layout.py). Regime note in the
    operator docstring: high-cardinality strings are the surrogate's
    territory; a 5-value lang column should use ``partitionBy``.

    Rotated INTO the driver window round 14 (VERDICT round 13 #4) for
    its first driver row — the string surrogate is genuinely new
    machinery, unlike the tail's machinery twins;
    ``sink_zorder_clustered_scan`` holds the numeric clustered-write
    family via its r13 ledger green plus the local differential."""
    from ..operators.layout import zorder_layout

    out = os.path.join(tempfile.gettempdir(), "spark_graft_sink_zorder_str")
    docs = load_table(spark, sf_dir, "documents")
    zorder_layout(
        docs, ["source", "n_chars"], out, bits=4, num_files=4,
    )
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("source") >= "src10") & (F.col("source") <= "src16")
            & (F.col("n_chars") >= 100) & (F.col("n_chars") <= 300)
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("source")
    )
