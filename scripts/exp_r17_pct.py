#!/usr/bin/env python
"""Round-17 q_percentiles_exact experiment: fuse the two phase-1
histograms into ONE lineitem scan (VERDICT r16 "Next round" #1).

The r16 GROUPING-SETS fusion was reverted because it needed a
localCheckpoint (multi-ref CTE inlining + pushed branch filters killed
exchange-subtree identity) whose per-run cost exceeded the saved scan at
sf0.1. This round's form avoids the checkpoint entirely: ONE aggregate
keyed on the COMBINED key (l_returnflag, l_quantity, price_bucket) —
bounded cardinality at any SF (~|qty domain| x |log buckets| x |flags|)
— feeds BOTH rank pipelines through window functions. The relation is
still multi-referenced (qty leg + price targets), but every reference
inlines to the IDENTICAL scan -> partial-agg -> exchange subtree (no
branch filters can reach below the windows), so ReuseExchange/AQE stage
reuse executes it once. Expected plan: 3 lineitem scans -> 2 (the
fused histogram + the rank-select probe).

Usage:
  python scripts/exp_r17_pct.py check   # result equality at 3 SFs + plan scan count
  python scripts/exp_r17_pct.py time [rounds]  # interleaved A/B at $SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.catalog import (
    DEFAULT_SF_DIR,
    ensure_views,
)
from aind_protein_data_transformation_spark.measure import interleaved_ab
from aind_protein_data_transformation_spark.operators.percentile import (
    log_bucket_id_sql,
)
from aind_protein_data_transformation_spark.queries.scalar_packs import (
    _PCT_EXACT_SQL,
    _PCT_QTY,
    _pct_interp_sql,
    _pct_lohi_sql,
)
from aind_protein_data_transformation_spark.session import get_spark

_BID = log_bucket_id_sql("CAST(l_extendedprice AS DOUBLE)")
_H90 = "CAST(pn - 1 AS DOUBLE) * 0.9D"

NEW_SQL = f"""
WITH base AS (
    SELECT l_returnflag, l_quantity, bid, COUNT(*) AS cnt
    FROM (SELECT l_returnflag, l_quantity, {_BID} AS bid FROM lineitem)
    GROUP BY l_returnflag, l_quantity, bid
),
w AS (
    SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qv, bid,
           SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS q_cum_end,
           SUM(cnt) OVER (PARTITION BY l_returnflag, l_quantity) AS q_cnt,
           SUM(cnt) OVER (PARTITION BY l_returnflag) AS qn,
           SUM(pcnt) OVER (PARTITION BY l_returnflag ORDER BY bid ASC NULLS LAST) AS p_cum_end,
           SUM(pcnt) OVER (PARTITION BY l_returnflag, bid) AS p_cnt,
           SUM(pcnt) OVER (PARTITION BY l_returnflag) AS pn
    FROM (SELECT *, CASE WHEN bid IS NULL THEN 0L ELSE cnt END AS pcnt FROM base)
),
targets AS (
    SELECT DISTINCT l_returnflag, bid, p_cum_end - p_cnt AS cum_start, pn AS n
    FROM w
    WHERE ((p_cum_end - p_cnt) <= FLOOR({_H90}) AND FLOOR({_H90}) < p_cum_end)
       OR ((p_cum_end - p_cnt) <= LEAST(FLOOR({_H90}) + 1, pn - 1)
           AND LEAST(FLOOR({_H90}) + 1, pn - 1) < p_cum_end)
),
picked AS (
    SELECT /*+ BROADCAST(t) */ p.l_returnflag, p.v, t.n,
           t.cum_start + ROW_NUMBER() OVER (PARTITION BY p.l_returnflag, p.bid
                                            ORDER BY p.v) - 1 AS grank
    FROM (SELECT l_returnflag, v, {log_bucket_id_sql("v")} AS bid
          FROM (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem)
          WHERE v IS NOT NULL) p
    JOIN targets t ON p.l_returnflag <=> t.l_returnflag AND p.bid = t.bid
),
united AS (
    SELECT l_returnflag, 1 AS isq, qv AS v,
           q_cum_end - q_cnt AS cum_start, q_cum_end AS cum_end, qn AS n
    FROM w
    UNION ALL
    SELECT l_returnflag, 0 AS isq, v, grank AS cum_start,
           grank + 1 AS cum_end, n
    FROM picked
),
agg AS (
    SELECT l_returnflag,
           {", ".join(_pct_lohi_sql(p, a, "isq = 1") for p, a in _PCT_QTY)},
           {_pct_lohi_sql(0.9, "price_p90", "isq = 0")}
    FROM united GROUP BY l_returnflag
)
SELECT l_returnflag,
       {", ".join(_pct_interp_sql(p, a) for p, a in _PCT_QTY)},
       {_pct_interp_sql(0.9, "price_p90")}
FROM agg
"""


#: Variant C — GROUPING SETS phase-1 fusion WITHOUT the r16 checkpoint.
#: The r16 attempt died because the isq branch FILTERS pushed below the
#: windows into the two inlined copies of the grouping-set subtree,
#: killing exchange-subtree identity. Here no filter can descend:
#: the per-leg counts are conditional CASE projections (not filters),
#: the targets-side gq filter is blocked by the (flag)-partitioned
#: windows, and the picked join uses null-safe equality on the flag so
#: no IsNotNull(l_returnflag) is inferred into one copy only. The
#: exchange then carries |qty domain| + |bucket domain| rows (~5.4k at
#: sf0.1) instead of the 157k combined-key rows of variant B.
NEW2_SQL = f"""
WITH base AS (
    SELECT l_returnflag, l_quantity, bid, COUNT(*) AS cnt,
           GROUPING(bid) AS gq
    FROM (SELECT l_returnflag, l_quantity, {_BID} AS bid FROM lineitem)
    GROUP BY GROUPING SETS ((l_returnflag, l_quantity), (l_returnflag, bid))
),
w AS (
    SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qv, bid, gq,
           SUM(qcnt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS q_cum_end,
           SUM(qcnt) OVER (PARTITION BY l_returnflag, l_quantity) AS q_cnt,
           SUM(qcnt) OVER (PARTITION BY l_returnflag) AS qn,
           SUM(pcnt) OVER (PARTITION BY l_returnflag ORDER BY bid ASC NULLS LAST) AS p_cum_end,
           SUM(pcnt) OVER (PARTITION BY l_returnflag, bid) AS p_cnt,
           SUM(pcnt) OVER (PARTITION BY l_returnflag) AS pn
    FROM (SELECT *,
                 CASE WHEN gq = 1 THEN cnt ELSE 0L END AS qcnt,
                 CASE WHEN gq = 0 AND bid IS NOT NULL THEN cnt ELSE 0L END AS pcnt
          FROM base)
),
targets AS (
    SELECT l_returnflag, bid, p_cum_end - p_cnt AS cum_start, pn AS n
    FROM w
    WHERE gq = 0 AND (
          ((p_cum_end - p_cnt) <= FLOOR({_H90}) AND FLOOR({_H90}) < p_cum_end)
       OR ((p_cum_end - p_cnt) <= LEAST(FLOOR({_H90}) + 1, pn - 1)
           AND LEAST(FLOOR({_H90}) + 1, pn - 1) < p_cum_end))
),
picked AS (
    SELECT /*+ BROADCAST(t) */ p.l_returnflag, p.v, t.n,
           t.cum_start + ROW_NUMBER() OVER (PARTITION BY p.l_returnflag, p.bid
                                            ORDER BY p.v) - 1 AS grank
    FROM (SELECT l_returnflag, v, {log_bucket_id_sql("v")} AS bid
          FROM (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem)
          WHERE v IS NOT NULL) p
    JOIN targets t ON p.l_returnflag <=> t.l_returnflag AND p.bid = t.bid
),
united AS (
    SELECT l_returnflag, 1 AS isq, qv AS v,
           q_cum_end - q_cnt AS cum_start, q_cum_end AS cum_end, qn AS n
    FROM w WHERE gq = 1
    UNION ALL
    SELECT l_returnflag, 0 AS isq, v, grank AS cum_start,
           grank + 1 AS cum_end, n
    FROM picked
),
agg AS (
    SELECT l_returnflag,
           {", ".join(_pct_lohi_sql(p, a, "isq = 1") for p, a in _PCT_QTY)},
           {_pct_lohi_sql(0.9, "price_p90", "isq = 0")}
    FROM united GROUP BY l_returnflag
)
SELECT l_returnflag,
       {", ".join(_pct_interp_sql(p, a) for p, a in _PCT_QTY)},
       {_pct_interp_sql(0.9, "price_p90")}
FROM agg
"""


def _scan_count(df) -> int:
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len(re.findall(r"^\(\d+\) Scan parquet", txt, re.M))


def check() -> int:
    spark = get_spark("exp-r17-pct-check")
    ok = True
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        ensure_views(spark, sf_dir, "lineitem")
        old = sorted(map(tuple, spark.sql(_PCT_EXACT_SQL).collect()))
        new = sorted(map(tuple, spark.sql(NEW_SQL).collect()))
        same = old == new
        ok = ok and same
        print(f"{sf}: rows_equal={same} n={len(old)}")
        if not same:
            print(" old:", old)
            print(" new:", new)
    ensure_views(spark, DEFAULT_SF_DIR, "lineitem")
    n_old = _scan_count(spark.sql(_PCT_EXACT_SQL))
    n_new = _scan_count(spark.sql(NEW_SQL))
    print(f"lineitem scans (static plan): old={n_old} new={n_new}")
    spark.stop()
    return 0 if ok else 1


def timeit(rounds: int) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("exp-r17-pct-time")
    ensure_views(spark, sf_dir, "lineitem")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    res = interleaved_ab(
        {
            "pct::old": spark.sql(_PCT_EXACT_SQL),
            "pct::new": spark.sql(NEW_SQL),
        },
        rounds=rounds,
        warmup=1,
        post_run=lambda: spark.catalog.clearCache(),
    )
    for k, v in res.items():
        print(f"{k:12s} best={v['best']:.3f} runs={v['runs']}")
    spark.stop()
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "time":
        sys.exit(timeit(int(sys.argv[2]) if len(sys.argv) > 2 else 6))
    sys.exit(check())
