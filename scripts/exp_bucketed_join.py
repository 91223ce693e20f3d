#!/usr/bin/env python
"""Bucketed co-located join at the 10x scale layout (BENCH.md evidence
for the sink_bucketed_join lever).

The registered query asserts the PLAN property (zero Exchange); this
experiment measures the WALL payoff where it matters — at a scale where
the join body dominates the session constants. Both arms run the same
orders ⋈ lineitem (on the order key) + per-priority aggregate over the
10x key-shifted relational layout (scripts/bench_scale10.py fixture,
~6M lineitem rows), same session, back-to-back, best-of-3, noop sink:

- ``shuffled``: plain parquet scans, ``hint("merge")`` SortMergeJoin —
  two full exchanges of the fact tables per run (what every
  non-bucketed deployment pays on EVERY run).
- ``bucketed``: both tables written ``bucketBy(16)`` + ``sortBy`` on
  the join key once, then the same join — zero Exchange (asserted),
  bucket-co-located SMJ.

The one-time bucketed WRITE cost is timed too: the lever's economics
are write-once-join-many, so the report includes the break-even run
count (write_cost / per_run_saving). Timing noise on this VM is ±50%
per run — only the same-session contrast matters, and the Exchange
counts printed alongside are deterministic plan facts.

Usage: python scripts/exp_bucketed_join.py [scale10_dir]
(builds the 10x layout via bench_scale10.scale_table if missing)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 16
RUNS = 3


def _best_of(df_factory, runs: int = RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df_factory().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main(argv: list[str]) -> int:
    scale_dir = argv[1] if len(argv) > 1 else "/tmp/sparkgraft-scale10"
    if not os.path.isdir(os.path.join(scale_dir, "lineitem.parquet")):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench_scale10",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_scale10.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        for t in (*mod.SINGLE, *mod.SHIFT):
            mod.scale_table("/root/testdata/sf0.1", scale_dir, t)

    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.plans.scale import write_bucketed
    from aind_protein_data_transformation_spark.session import get_spark

    spark = get_spark("exp-bucketed-join")
    try:
        orders = spark.read.parquet(
            os.path.join(scale_dir, "orders.parquet")
        ).select("o_orderkey", "o_orderpriority")
        li = (
            spark.read.parquet(os.path.join(scale_dir, "lineitem.parquet"))
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .withColumnRenamed("l_orderkey", "o_orderkey")
        )

        def agg(joined):
            return (
                joined.groupBy("o_orderpriority")
                .agg(
                    F.count("*").alias("n_items"),
                    F.sum(
                        (F.col("l_extendedprice")
                         * (F.lit(1) - F.col("l_discount")))
                        .cast("decimal(25,6)")
                    ).cast("double").alias("revenue"),
                )
            )

        # warm the scans so neither arm is billed first-touch listing
        orders.write.format("noop").mode("overwrite").save()
        li.write.format("noop").mode("overwrite").save()

        def shuffled():
            return agg(orders.hint("merge").join(li, "o_orderkey"))

        sh_join_plan = (
            orders.hint("merge").join(li, "o_orderkey")
            ._jdf.queryExecution().executedPlan().toString()
        )
        t_shuffled = _best_of(shuffled)

        t0 = time.perf_counter()
        write_bucketed(orders, "x10_orders_bkt", "o_orderkey", N_BUCKETS,
                       ["o_orderkey"], path=f"{scale_dir}/_bkt/orders")
        write_bucketed(li, "x10_lineitem_bkt", "o_orderkey", N_BUCKETS,
                       ["o_orderkey"], path=f"{scale_dir}/_bkt/lineitem")
        t_write = round(time.perf_counter() - t0, 3)

        bo = spark.table("x10_orders_bkt")
        bl = spark.table("x10_lineitem_bkt")
        bk_join = bo.hint("merge").join(bl, "o_orderkey")
        bk_join_plan = (
            bk_join._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in bk_join_plan, "bucketed join shuffled!"

        def bucketed():
            return agg(bo.hint("merge").join(bl, "o_orderkey"))

        t_bucketed = _best_of(bucketed)

        # answers identical across arms (one content check, collected
        # small: 5 priority groups)
        a = sorted(map(tuple, shuffled().collect()))
        b = sorted(map(tuple, bucketed().collect()))
        assert a == b, "arms disagree"

        saving = round(t_shuffled - t_bucketed, 3)
        out = {
            "experiment": "bucketed_join_10x",
            "rows_lineitem": li.count(),
            "shuffled_best_s": t_shuffled,
            "bucketed_best_s": t_bucketed,
            "speedup": round(t_shuffled / max(t_bucketed, 1e-9), 2),
            "join_exchanges_shuffled": sh_join_plan.count("Exchange"),
            "join_exchanges_bucketed": bk_join_plan.count("Exchange"),
            "bucketed_write_once_s": t_write,
            "breakeven_runs": (
                round(t_write / saving, 1) if saving > 0 else None
            ),
        }
        print(json.dumps(out))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
