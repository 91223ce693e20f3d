#!/usr/bin/env python
"""Same-session A/B for the exact-percentile plans.

Variants (identical results asserted, bit-exact):
  hybrid        registered q_percentiles_exact (qty histogram+window,
                price via equi-width rank-select w/ min-max collect)
  fused         registered q_percentiles_rank_select (both columns in
                one equi-width rank-select pipeline)
  fused_log     rank-select with FIXED log-bucketing: bid from the
                value's (sign, exponent, 256ths-of-octave) — monotone
                by construction, so NO min/max pre-scan, no collect,
                no literal bounds; one fewer job and scan
  fused_log_nc  fused_log without the histogram localCheckpoint
  hybrid_folded round-5 fold attempt: BOTH legs' histogram keys stack
                through one inline() generator into ONE shared
                GROUP BY (one scan + one exchange builds both the qty
                value-histogram and the price log-bucket histogram),
                then the legs split post-histogram; phase-2 price
                probe unchanged

Usage: python scripts/exp_percentile.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aind_protein_data_transformation_spark.catalog import load_table  # noqa: E402
from aind_protein_data_transformation_spark.plans.scale import sorted_small  # noqa: E402
from aind_protein_data_transformation_spark.queries.scalar_packs import (  # noqa: E402
    q_percentiles_exact,
    q_percentiles_rank_select,
)
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402

SUB = 256  # sub-buckets per octave
OFF = 1 << 20


def _log_bid() -> F.Column:
    """Fixed monotone bucket id for double v: sign-split log2 octave x
    256 mantissa slots. Robust to +-1 float error in floor(log2): the
    two off-by-one encodings of a power of two collapse to the same id."""
    av = F.abs(F.col("v"))
    e = F.floor(F.log2(av)).cast("long")
    e = F.greatest(F.lit(-1100), F.least(F.lit(1100), e))
    frac = av / F.pow(F.lit(2.0), e.cast("double")) - F.lit(1.0)
    sub = F.floor(
        F.greatest(F.lit(-1.0), F.least(frac, F.lit(1.999))) * F.lit(SUB)
    ).cast("long")
    mag = e * F.lit(SUB) + sub
    return (
        F.when(F.col("v") == 0, F.lit(0))
        .when(F.col("v") > 0, mag + F.lit(OFF))
        .otherwise(F.lit(-OFF) - mag)
    )


def rank_select_log(
    df: DataFrame,
    group_cols: list[str],
    specs: dict[str, list[tuple[float, str]]],
    checkpoint: bool = True,
) -> DataFrame:
    cols = list(specs)
    k = len(cols)
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in cols)
    quoted_groups = [f"`{g}`" for g in group_cols]
    rows = df.selectExpr(
        *quoted_groups, f"stack({k}, {stack_args}) AS (cid, v)"
    ).where(F.col("v").isNotNull())
    keys = [*group_cols, "cid"]
    bucketed = rows.withColumn("bid", _log_bid())

    w_part = Window.partitionBy(*keys)
    w_cum = Window.partitionBy(*keys).orderBy("bid")
    bc = (
        bucketed.groupBy(*keys, "bid")
        .agg(F.count("*").alias("cnt"))
        .withColumn("n", F.sum("cnt").over(w_part))
        .withColumn("cum_end", F.sum("cnt").over(w_cum))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt"))
    )
    if checkpoint:
        bc = bc.localCheckpoint()
    hit = None
    for c, percentiles in specs.items():
        for p, _alias in percentiles:
            h = (F.col("n") - F.lit(1)).cast("double") * F.lit(p)
            lo = F.floor(h)
            hi = F.least(lo + 1, F.col("n") - 1)
            cond = (F.col("cid") == c) & (
                ((F.col("cum_start") <= lo) & (lo < F.col("cum_end")))
                | ((F.col("cum_start") <= hi) & (hi < F.col("cum_end")))
            )
            hit = cond if hit is None else (hit | cond)
    targets = bc.where(hit).select(*keys, "bid", "cum_start", "n")

    w_local = Window.partitionBy(*keys, "bid").orderBy("v")
    picked = bucketed.join(F.broadcast(targets), [*keys, "bid"]).withColumn(
        "grank", F.col("cum_start") + F.row_number().over(w_local) - F.lit(1)
    )
    aggs = []
    for c, percentiles in specs.items():
        is_c = F.col("cid") == c
        for p, alias in percentiles:
            h = (F.col("n") - F.lit(1)).cast("double") * F.lit(p)
            lo = F.floor(h)
            hi = F.least(lo + 1, F.col("n") - 1)
            aggs.extend(
                [
                    F.max(F.when(is_c & (F.col("grank") == lo), F.col("v"))).alias(
                        f"__lo_{alias}"
                    ),
                    F.max(F.when(is_c & (F.col("grank") == hi), F.col("v"))).alias(
                        f"__hi_{alias}"
                    ),
                    F.max(F.when(is_c, F.col("n"))).alias(f"__n_{alias}"),
                ]
            )
    agged = picked.groupBy(*group_cols).agg(*aggs)

    out = [F.col(c) for c in group_cols]
    for c, percentiles in specs.items():
        for p, alias in percentiles:
            h = (F.col(f"__n_{alias}") - F.lit(1)).cast("double") * F.lit(p)
            frac = h - F.floor(h).cast("double")
            v_lo = F.col(f"__lo_{alias}")
            v_hi = F.col(f"__hi_{alias}")
            out.append(
                F.when(frac > 0, v_lo * (F.lit(1.0) - frac) + v_hi * frac)
                .otherwise(v_lo)
                .alias(alias)
            )
    return agged.select(*out)


SPECS = {
    "l_quantity": [(0.25, "qty_p25"), (0.5, "qty_median"), (0.75, "qty_p75")],
    "l_extendedprice": [(0.9, "price_p90")],
}


def _folded_sql() -> str:
    from aind_protein_data_transformation_spark.operators.percentile import log_bucket_id_sql
    from aind_protein_data_transformation_spark.queries.scalar_packs import (
        _PCT_H90,
        _PCT_QTY,
        _pct_interp_sql,
        _pct_lohi_sql,
    )

    return f"""
WITH stacked AS (
    SELECT l_returnflag, cid, k
    FROM (SELECT l_returnflag,
                 CAST(l_quantity AS DOUBLE) AS qv,
                 CAST(l_extendedprice AS DOUBLE) AS pv
          FROM lineitem)
    LATERAL VIEW inline(array(
        named_struct('cid', 1, 'k', qv),
        named_struct('cid', 0,
                     'k', CAST({log_bucket_id_sql("pv")} AS DOUBLE)))) s AS cid, k
    WHERE k IS NOT NULL
),
hist AS (
    SELECT l_returnflag, cid, k, COUNT(*) AS cnt
    FROM stacked GROUP BY l_returnflag, cid, k
),
hw AS (
    SELECT *, SUM(cnt) OVER (PARTITION BY l_returnflag, cid) AS n,
           SUM(cnt) OVER (PARTITION BY l_returnflag, cid ORDER BY k) AS cum_end
    FROM hist
),
qre AS (
    SELECT l_returnflag, k AS v, cum_end - cnt AS cum_start, cum_end, n
    FROM hw WHERE cid = 1
),
targets AS (
    SELECT l_returnflag, CAST(k AS BIGINT) AS bid, cum_end - cnt AS cum_start, n
    FROM hw
    WHERE cid = 0
      AND (((cum_end - cnt) <= FLOOR({_PCT_H90}) AND FLOOR({_PCT_H90}) < cum_end)
        OR ((cum_end - cnt) <= LEAST(FLOOR({_PCT_H90}) + 1, n - 1)
            AND LEAST(FLOOR({_PCT_H90}) + 1, n - 1) < cum_end))
),
pb AS (
    SELECT l_returnflag, v, {log_bucket_id_sql("v")} AS bid
    FROM (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem)
    WHERE v IS NOT NULL
),
picked AS (
    SELECT /*+ BROADCAST(t) */ p.l_returnflag, p.v, t.n,
           t.cum_start + ROW_NUMBER() OVER (PARTITION BY p.l_returnflag, p.bid
                                            ORDER BY p.v) - 1 AS grank
    FROM pb p JOIN targets t ON p.l_returnflag = t.l_returnflag AND p.bid = t.bid
),
united AS (
    SELECT l_returnflag, 1 AS isq, v, cum_start, cum_end, n FROM qre
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


def _hybrid_folded(spark, sf_dir):
    from aind_protein_data_transformation_spark.catalog import ensure_views

    ensure_views(spark, sf_dir, "lineitem")
    return sorted_small(spark.sql(_folded_sql()), "l_returnflag")


def _fused_log(spark, sf_dir, checkpoint=True):
    li = load_table(spark, sf_dir, "lineitem")
    return sorted_small(
        rank_select_log(li, ["l_returnflag"], SPECS, checkpoint=checkpoint),
        "l_returnflag",
    )


VARIANTS = {
    "hybrid": q_percentiles_exact,
    "fused": q_percentiles_rank_select,
    "fused_log": lambda s, d: _fused_log(s, d, True),
    "fused_log_nc": lambda s, d: _fused_log(s, d, False),
    "hybrid_folded": _hybrid_folded,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("exp-percentile")
    import os

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    base = None
    for name, fn in VARIANTS.items():
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.catalog.clearCache()
        if base is None:
            base = rows
        else:
            assert rows == base, f"{name} diverges:\n{rows}\nvs\n{base}"
    print(f"# all variants agree bit-exact: {base}", flush=True)

    # shared interleaved order-alternated harness (the old loop never
    # rotated order across rounds — the last variant always ran
    # warmest). clearCache runs through post_run, outside the timed
    # window (ADVICE r7: billing it inflated absolute timings).
    from aind_protein_data_transformation_spark.measure import interleaved_ab

    res = interleaved_ab(
        {name: (lambda fn=fn: fn(spark, sf_dir)) for name, fn in VARIANTS.items()},
        rounds=rounds,
        warmup=0,  # the equality check above already warmed every variant
        post_run=spark.catalog.clearCache,
    )
    print(json.dumps({"sf_dir": sf_dir, "best": {k: v["best"] for k, v in res.items()}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
