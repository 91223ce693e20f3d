#!/usr/bin/env python
"""Round-17 at-scale A/B for q_topk_per_group (VERDICT r16 #5).

r16 replaced the plain `ORDER BY` (2 exchanges; the old plan's
pre-shuffle WindowGroupLimit ships <= k rows per group per map task)
with a range-prefusion (`REPARTITION_BY_RANGE(o_custkey)` + SORT BY,
1 exchange; ships ALL rows). The byte math inverts when groups are
large: with g rows per group per map task, the old form shuffles
~k/g of the data. This experiment measures both forms at the 10x
layout (orders-per-customer ~10, the sf ratio) AND on a HOT variant
(custkey folded mod 1500 -> ~1000 orders per customer) so the
inversion point is actually exercised.

Both forms are verified row-equal on each layout first.

Usage: python scripts/exp_r17_topk.py [rounds]
Prereq: /tmp/sparkgraft-scale10 (scripts/bench_scale10.py builds it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.measure import interleaved_ab
from aind_protein_data_transformation_spark.session import get_spark

PREFUSED = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM (SELECT /*+ REPARTITION_BY_RANGE(o_custkey) */ * FROM {rel})
) WHERE rk <= 3
SORT BY o_custkey, rk, o_orderkey
"""

GROUPLIMIT = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM {rel}
) WHERE rk <= 3
ORDER BY o_custkey, rk, o_orderkey
"""


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    scale10 = "/tmp/sparkgraft-scale10"
    hot_dir = "/tmp/sparkgraft-topk-hot"
    spark = get_spark("exp-r17-topk")

    orders = spark.read.parquet(os.path.join(scale10, "orders.parquet"))
    orders.createOrReplaceTempView("orders_std")
    if not os.path.isdir(hot_dir):
        # ~1500 distinct customers over 1.5M orders -> ~1000 orders per
        # customer; keys deterministic, written multi-file like scale10
        orders.selectExpr(
            "o_orderkey", "pmod(o_custkey, 1500) AS o_custkey",
            "o_totalprice", "o_orderdate", "o_orderpriority", "o_orderstatus"
        ).repartition(30).write.mode("overwrite").parquet(hot_dir)
    spark.read.parquet(hot_dir).createOrReplaceTempView("orders_hot")

    frames = {}
    for rel in ("orders_std", "orders_hot"):
        pre = spark.sql(PREFUSED.format(rel=rel))
        old = spark.sql(GROUPLIMIT.format(rel=rel))
        a = sorted(map(tuple, pre.collect()))
        b = sorted(map(tuple, old.collect()))
        plan_old = old._jdf.queryExecution().executedPlan().toString()
        print(f"{rel}: rows_equal={a == b} n={len(a)} "
              f"old_has_WindowGroupLimit={'WindowGroupLimit' in plan_old}")
        frames[f"{rel}::prefused"] = pre
        frames[f"{rel}::grouplimit"] = old

    res = interleaved_ab(frames, rounds=rounds, warmup=1)
    for k, v in res.items():
        print(f"{k:28s} best={v['best']:.3f} runs={[round(x,2) for x in v['runs']]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
