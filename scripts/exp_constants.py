#!/usr/bin/env python
"""Same-session A/B for the two ugliest sub-second constants
(VERDICT r5 #7): q_rollup_region_nation_revenue (0.158s vs DuckDB
0.009s) and q_outer_join_order_fill (0.237s vs 0.024s). One structural
variant each, exact-result-asserted, best-of-5 both forms back-to-back.

rollup_reagg   aggregate customer on c_nationkey FIRST (one exchange,
               25 groups, split fixed-point partials — exactly
               re-aggregatable longs), broadcast-join the names onto
               the 25-ROW aggregate instead of probing two broadcast
               hash tables per fact row, then expand the ROLLUP levels
               and recombine in the single bounded final task
               (sorted_small's coalesce). Fact rows touch ONE
               project+partial-agg, never a join or an Expand.
               MEASURED WIN (0.20-0.22s vs 0.23-0.29s across three
               sessions) and LANDED as the registered form round 6 —
               this script now keeps the old literal GROUP BY ROLLUP
               as the baseline so the A/B stays reproducible.

outer_range    both join sides REPARTITION_BY_RANGE on the join key =
               the final ORDER BY key: RangePartitioning satisfies the
               join's ClusteredDistribution, so the sort-merge join
               reuses it and the final global sort is already
               satisfied — one partitioning shared by join + output
               order instead of hash exchanges plus a sampling range
               exchange.

Usage: python scripts/exp_constants.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.catalog import ensure_views  # noqa: E402
from aind_protein_data_transformation_spark.queries.relational import (  # noqa: E402
    q_outer_join_order_fill,
    q_rollup_region_nation_revenue,
)
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402

#: the pre-round-6 registered form: literal GROUP BY ROLLUP over the
#: fact x broadcast-dims join (Expand replicates each joined row once
#: per grouping set before the partial aggregate).
_ROLLUP_LITERAL_SQL = """
SELECT COALESCE(r_name, '<ALL>') AS region_name,
       COALESCE(n_name, '<ALL>') AS nation_name,
       total_acctbal, n_customers
FROM (
    SELECT /*+ BROADCAST(n), BROADCAST(r) */ r_name, n_name,
           {dsum},
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
)
"""

_OUTER_RANGE_SQL = """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.n_orders, 0L) AS n_orders,
       COALESCE(o.max_price, 0.0D) AS max_price
FROM (SELECT /*+ REPARTITION_BY_RANGE(c_custkey) */ c_custkey, c_name
      FROM customer) c
LEFT JOIN (
    SELECT /*+ REPARTITION_BY_RANGE(o_custkey) */ o_custkey,
           COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
ORDER BY c_custkey
"""


def rollup_literal(spark, sf_dir):
    from aind_protein_data_transformation_spark.functions.numeric import (
        spark_dsum_sql,
    )
    from aind_protein_data_transformation_spark.plans.scale import sorted_small

    ensure_views(spark, sf_dir, "customer", "nation", "region")
    sql = _ROLLUP_LITERAL_SQL.format(
        dsum=spark_dsum_sql("c_acctbal", "total_acctbal")
    )
    return sorted_small(spark.sql(sql), "region_name", "nation_name")


def outer_range(spark, sf_dir):
    ensure_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_OUTER_RANGE_SQL)


def _best(df, rounds):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _rows(df):
    return [tuple(r) for r in df.collect()]


def main(argv):
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(argv[2]) if len(argv) > 2 else 5
    spark = get_spark("exp-constants")
    out = {"metric": "constants_ab", "sf_dir": sf_dir, "rounds": rounds}
    try:
        pairs = {
            "rollup": (rollup_literal, q_rollup_region_nation_revenue),
            "outer_fill": (q_outer_join_order_fill, outer_range),
        }
        for name, (base_fn, var_fn) in pairs.items():
            base = base_fn(spark, sf_dir)
            var = var_fn(spark, sf_dir)
            assert _rows(base) == _rows(var), f"{name}: variant diverges"
            # warm both plans, then interleave timed runs back-to-back
            out[f"{name}_base_s"] = _best(base, rounds)
            out[f"{name}_variant_s"] = _best(var, rounds)
            spark.catalog.clearCache()
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
