"""Relational core queries (SURVEY.md §2B: scan/filter/project, hash agg,
joins incl. broadcast/semi/anti/theta, windows, set ops, sort/limit).

Each query is the generalization of a reference operator (citations in
docstrings point at /root/reference). All plans are declarative DataFrame
compositions — Catalyst handles pushdown, pruning, join selection; dim
tables get an explicit ``broadcast()`` hint where a 100-TB fact side
makes shuffle joins wasteful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import ensure_views, load_table
from ..operators.prefix import ntile_from_rank_sql, partitioned_prefix_sum
from ..functions.numeric import (
    davg,
    dsum,
    exact_sum,
    spark_davg_sql,
    spark_dsum_sql,
    sql_davg,
    sql_dsum,
)
from ..plans.scale import sorted_small
from .registry import query


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {spark_dsum_sql('l_quantity', 'sum_qty')},
       {spark_dsum_sql('l_extendedprice', 'sum_base_price')},
       {spark_dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {spark_dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {spark_davg_sql('l_quantity', 'avg_qty')},
       {spark_davg_sql('l_extendedprice', 'avg_price')},
       {spark_davg_sql('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


_Q3_SQL = f"""
SELECT /*+ BROADCAST(c) */
       l.l_orderkey,
       {spark_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       o.o_orderdate, o.o_orderpriority
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


_Q5_SQL = f"""
SELECT /*+ BROADCAST(c), BROADCAST(s), BROADCAST(n), BROADCAST(r) */
       n.n_name,
       {spark_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


#: UNION / INTERSECT / EXCEPT of two predicates over ONE relation are
#: all functions of the per-key membership flags, so one scan + one
#: hash aggregate + a generator replaces the literal six-scan plan
#: (each set-op leg re-scans customer and runs its own distinct
#: exchange). The per-key flag table is computed once; explode() emits
#: the (op, key) rows each membership combination belongs to — no CTE
#: re-inlining, no extra exchange (measured 0.25s -> 0.11s warm at
#: sf0.1; both forms keep identical results by the shared oracle).
#: This rewrite is only valid because both inputs project the same
#: relation — the general set-op operators remain for cross-relation
#: use.
_SET_OPS_SQL = """
WITH flags AS (
    SELECT c_custkey,
           MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS b,
           MAX(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS r
    FROM customer
    WHERE c_mktsegment = 'BUILDING' OR c_acctbal > 5000
    GROUP BY c_custkey
)
SELECT explode(concat(
           array('union'),
           CASE WHEN b = 1 AND r = 1 THEN array('intersect')
                ELSE array() END,
           CASE WHEN b = 1 AND r = 0 THEN array('except')
                ELSE array() END)) AS op,
       c_custkey
FROM flags
ORDER BY op, c_custkey
"""


#: Literal GROUP BY ROLLUP — RESTORED after a round-6 retraction. A
#: finest-level re-aggregation rewrite (aggregate on c_nationkey
#: first, join names onto the 25-row aggregate, expand levels over the
#: bounded relation) appeared ~20% faster in sequential-block A/Bs and
#: briefly replaced this form; re-measuring with INTERLEAVED,
#: order-alternated runs showed the "win" was measurement-order bias —
#: whichever form ran second inherited warmer cache/JIT. Unbiased:
#: parity at sf0.1 (literal 0.239 min / reagg 0.288) AND at 10x
#: (0.189 vs 0.172) — so the simpler literal form stands. The reagg
#: variant is kept as the recorded negative in
#: scripts/exp_constants.py; its exactness machinery (re-aggregatable
#: split-sum partials) lives on in functions/numeric.py
#: split_partials_sql/exact_recombine_sql.
#:
#: Empty-input edge (documented): Spark's ROLLUP yields 0 rows over
#: zero input; DuckDB emits the grand-total row — an engine-level
#: divergence unreachable through the oracle harness (customer is
#: non-empty at every sf), pinned by tests/test_scale.py. A UNION ALL
#: grand-total arm closing it measured 3x the query's constant and was
#: rejected.
_ROLLUP_SQL = f"""
SELECT COALESCE(r_name, '<ALL>') AS region_name,
       COALESCE(n_name, '<ALL>') AS nation_name,
       total_acctbal, n_customers
FROM (
    SELECT /*+ BROADCAST(n), BROADCAST(r) */ r_name, n_name,
           {spark_dsum_sql('c_acctbal', 'total_acctbal')},
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
)
"""


#: Round 16 (guide §2.4): the window partitions by o_custkey and the
#: final (data-sized) output order is (o_custkey, o_orderkey), so ONE
#: range exchange on o_custkey serves both — the window's
#: ClusteredDistribution(o_custkey) is satisfied by RangePartitioning
#: (equal keys land in one partition), and the global order then needs
#: only a partition-local SORT BY. The old ORDER BY planned a second
#: full exchange whose range sampler re-executed the entire window
#: subtree; the new sampler reads just the scan. Rows and their values
#: are identical (same window partitions, same in-partition order).
_WINDOW_PACK_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROW_NUMBER() OVER w AS order_seq,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       DENSE_RANK() OVER w AS dense_seq,
       NTILE(4) OVER w AS spend_quartile,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend
FROM (SELECT /*+ REPARTITION_BY_RANGE(o_custkey) */ * FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
SORT BY o_custkey, o_orderkey
"""


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan -> pushed filter -> hash agg
    (partial+final map-side combine) -> sort. Generalizes the reference's
    windowed-mean aggregation stage (czi_to_zarr.py:342-386) to relational
    grouping; the flagship end-to-end slice (SURVEY.md §7 M1).

    Static-SQL form (identical plan to the dsum/davg Column chain; the
    string builds in one py4j crossing instead of ~40 — per-call plan
    construction is a measured 3s across the 20-query headline suite)."""
    ensure_views(spark, sf_dir, "lineitem")
    return sorted_small(spark.sql(_Q1_SQL), "l_returnflag", "l_linestatus")


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: selective dim filter -> fact joins -> agg -> global
    top-k. customer is broadcast (tiny at every SF); orders⋈lineitem
    shuffles on orderkey, which AQE sizes at runtime. Top-k via ORDER BY
    + LIMIT is a TakeOrderedAndProject — no full global sort
    materialization. Static-SQL form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "lineitem", "orders", "customer")
    return spark.sql(_Q3_SQL)


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join. All dims (region/nation/supplier/
    customer) broadcast; only orders⋈lineitem shuffles. At 100 TB the
    star-join order matters: Catalyst pushes the region filter first so
    broadcast semi-reduction shrinks the fact scan. Static-SQL form."""
    ensure_views(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    return sorted_small(spark.sql(_Q5_SQL), F.desc("revenue"), "n_name")


@query(
    "q_semi_join_customers_with_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    SEMI JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
    ORDER BY c_custkey
    """,
)
def q_semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having at least one big order.
    Semi join never duplicates the left side — at scale this avoids the
    join-then-distinct anti-pattern entirely."""
    # r16: a range-prepartition rewrite (sort fused into the probe-side
    # exchange) measured a WASH here at sf0.1 (interleaved, 6 rounds:
    # best +8%, median -2%) while shuffling every customer row where
    # this form shuffles only the semi-join survivors — kept as-is; the
    # ORDER BY's sampler re-executes just a broadcast-semi probe.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


@query(
    "q_anti_join_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    ANTI JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F'
               AND o_totalprice > 150000) o
        ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey
    """,
)
def q_anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no big finished
    order (predicate chosen so the result is non-empty at every SF —
    a 0-row result would match the oracle vacuously). The null-safe
    way to write NOT IN at scale: no tri-valued-logic trap, no
    driver-side collect of the subquery."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q_outer_join_order_fill",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.max_price, 0.0) AS max_price
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey
    """,
)
def q_outer_join_order_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join against a pre-aggregated subquery + COALESCE fill.
    Aggregating BEFORE the join keeps the shuffle on the small aggregate,
    not the raw fact table — the scalable shape for per-entity rollups.
    Static-SQL form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_OUTER_FILL_SQL)


#: r16: range-prepartition customer on the output sort key; the
#: broadcast left join preserves it, so the final order is a local
#: SORT BY (one exchange total; the old ORDER BY's sampler re-executed
#: the join) and the probe parallelizes past the single-row-group scan.
_OUTER_FILL_SQL = """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.n_orders, 0L) AS n_orders,
       COALESCE(o.max_price, 0.0D) AS max_price
FROM (SELECT /*+ REPARTITION_BY_RANGE(c_custkey) */ * FROM customer) c
LEFT JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
SORT BY c_custkey
"""


#: banded range-count (operators/range_join.py count_above) as one
#: static statement: bucket both sides by floor(acctbal/100), count
#: whole build buckets above each probe bucket from the O(buckets)
#: histogram window, and evaluate the > predicate only inside the
#: shared boundary bucket.
_THETA_SQL = """
WITH bvals AS (
    SELECT c_acctbal AS bv,
           FLOOR(CAST(c_acctbal AS DOUBLE) / 100.0D) AS bb
    FROM customer
),
hist AS (SELECT bb, COUNT(*) AS cnt FROM bvals GROUP BY bb),
buckets AS (
    SELECT bb, SUM(cnt) AS cnt FROM (
        SELECT bb, cnt FROM hist
        UNION ALL
        SELECT DISTINCT FLOOR(CAST(s_acctbal AS DOUBLE) / 100.0D) AS bb,
               0L AS cnt
        FROM supplier
    ) GROUP BY bb
),
cum AS (
    SELECT bb,
           COALESCE(SUM(cnt) OVER (ORDER BY bb DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS above
    FROM buckets
),
pb AS (
    SELECT s_suppkey, s_name, s_acctbal,
           FLOOR(CAST(s_acctbal AS DOUBLE) / 100.0D) AS pbkt
    FROM supplier
),
based AS (
    SELECT /*+ BROADCAST(cum) */ pb.s_suppkey, pb.s_name, pb.s_acctbal,
           pb.pbkt, cum.above
    FROM pb LEFT JOIN cum ON pb.pbkt = cum.bb
),
boundary AS (
    SELECT s_suppkey, s_name, s_acctbal, COUNT(*) AS bnd
    FROM pb JOIN bvals ON pb.pbkt = bvals.bb
    WHERE bvals.bv > pb.s_acctbal
    GROUP BY s_suppkey, s_name, s_acctbal
),
counted AS (
    -- r16: BROADCAST(d) — boundary is bounded by the supplier
    -- (probe-side) cardinality, but its size estimate sits behind a
    -- join+agg so the planner defaulted this probe-row-count join to
    -- SortMergeJoin (2 exchanges + 2 sorts of supplier-sized rows;
    -- guide §3.1: pick the strategy deliberately). Join keyed on
    -- s_suppkey alone (the supplier PK; name/acctbal were redundant
    -- key columns widening the comparator).
    SELECT /*+ BROADCAST(d) */ b.s_suppkey, b.s_name,
           COALESCE(b.above, 0L) + COALESCE(d.bnd, 0L) AS n_richer_customers
    FROM based b LEFT JOIN boundary d
      ON b.s_suppkey = d.s_suppkey
)
SELECT s_suppkey, s_name, n_richer_customers
FROM counted WHERE n_richer_customers > 0
"""


@query(
    "q_theta_join_price_band",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_richer_customers
    FROM supplier s
    JOIN customer c ON c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY s_suppkey
    """,
)
def q_theta_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join via the BANDED range plan (the same shape
    as operators/range_join.py count_above) instead of a broadcast
    nested-loop join: a BNLJ evaluates the predicate
    |supplier|x|customer| times (15M at sf0.1, quadratic at scale);
    banding counts whole buckets above each supplier from an O(buckets)
    histogram and equi-joins only the boundary bucket, so the predicate
    runs ~|n·m/buckets| times and every stage is a hash join or bounded
    window. The inner-join GROUP BY semantics of the oracle (suppliers
    with zero richer customers absent) are restored with the final
    positive filter. Static-SQL form (one py4j crossing); the operator
    keeps the general API and its own tests."""
    ensure_views(spark, sf_dir, "supplier", "customer")
    return sorted_small(spark.sql(_THETA_SQL), "s_suppkey")


@query(
    "q_window_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROW_NUMBER() OVER w AS order_seq,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           DENSE_RANK() OVER w AS dense_seq,
           NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS spend_quartile,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window pack: row_number + lag + running sum over one window spec.
    A single partitionBy keeps it to ONE shuffle; the frame runs inside
    each partition. Generalizes the reference's deterministic round-robin
    dealing (zeiss_job.py:33-44 uses index % n; here row_number).
    Static-SQL form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "orders")
    return spark.sql(_WINDOW_PACK_SQL)


#: r16: same range-prefusion as _WINDOW_PACK_SQL — the rank window
#: partitions by o_custkey and the final order starts with o_custkey,
#: so one range exchange serves both; the old ORDER BY's sampler
#: re-executed the whole window+filter subtree. Trade-off noted: the
#: range exchange carries all rows where the old plan's pre-shuffle
#: WindowGroupLimit shipped <= k per group per map task — measured
#: interleaved A/B decides (see OPTIMIZATION_r16.md).
#:
#: r17 at-scale A/B (VERDICT r16 #5; scripts/exp_r17_topk.py, both
#: forms row-equal, interleaved best-of-8): at the 10x layout with the
#: data's real orders-per-customer ratio (~10, constant in SF) this
#: prefused form wins — 0.563s vs 0.625s for the WindowGroupLimit form
#: — because at g≈10 rows/group/map-task the limit only trims ~3x the
#: bytes while the ORDER-BY form pays a second exchange plus the
#: sampler's re-execution of the window+filter subtree. On a HOT-group
#: variant (custkey folded mod 1500 → g≈1000) the byte math inverts as
#: predicted and the WindowGroupLimit form reads 0.466s vs 0.514s
#: (−9%): a deployment whose groups are orders of magnitude hotter
#: than the keyspace should prefer the plain ORDER-BY form there.
_TOPK_GROUP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
    FROM (SELECT /*+ REPARTITION_BY_RANGE(o_custkey) */ * FROM orders)
) WHERE rk <= 3
SORT BY o_custkey, rk, o_orderkey
"""


@query(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    ORDER BY o_custkey, rk, o_orderkey
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via rank window — the distributed top-k idiom
    (no per-group collect). Spark pushes a per-partition k-limit below
    the shuffle (WindowGroupLimit) so the shuffle carries ≤k rows per
    group, which is what makes this viable on 100 TB facts. Static-SQL
    form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "orders")
    return spark.sql(_TOPK_GROUP_SQL)


@query(
    "q_ntile_wealth_deciles",
    oracle="""
    SELECT decile,
           COUNT(*) AS n_customers,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM (
        SELECT c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    GROUP BY decile
    ORDER BY decile
    """,
)
def q_ntile_wealth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE deciles then re-aggregate — WITHOUT the unpartitioned
    ORDER BY window a naive NTILE plans (a single-reducer global sort,
    the classic scale killer; Spark itself warns "No Partition
    Defined").

    Global rank comes from the two-phase distributed prefix sum
    (operators/prefix.py) over the unique (c_acctbal, c_custkey) order
    — range-repartition, per-partition bounded sorts, k-row offset
    merge — and Spark's exact NTILE bucketing rule is then a closed
    form of (rank, n): the first n%10 buckets take ceil(n/10) rows,
    the rest floor(n/10). n rides in via a single-row broadcast
    cross-join (the q11 threshold pattern). Same result as the oracle's
    native NTILE at any data size, with no stage sorting O(n) rows in
    one task."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_acctbal", "c_custkey", F.lit(1).alias("_one")
    )
    ranked = partitioned_prefix_sum(
        c, ["c_acctbal", "c_custkey"], "_one", out_col="_rank"
    )
    n_row = c.groupBy().agg(F.count("*").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .selectExpr(
            "c_acctbal",
            f"{ntile_from_rank_sql(10, '_rank', '_n')} AS decile",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
        )
        .transform(lambda d: sorted_small(d, "decile"))
    )


@query(
    "q_set_ops_customer_segments",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM building UNION SELECT * FROM rich)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
    ORDER BY op, c_custkey
    """,
)
def q_set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two predicates on customer
    (SURVEY.md §2B set ops), computed as per-key membership flags in ONE
    scan + ONE aggregate with a generator emitting each key's set-op
    rows — same result set as the literal three-leg form the oracle
    runs, without re-scanning the relation per leg (see _SET_OPS_SQL).
    Static-SQL form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "customer")
    return spark.sql(_SET_OPS_SQL)


@query(
    "q_rollup_region_nation_revenue",
    oracle=f"""
    SELECT COALESCE(r.r_name, '<ALL>') AS region_name,
           COALESCE(n.n_name, '<ALL>') AS nation_name,
           {sql_dsum('c.c_acctbal', 'total_acctbal')},
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name, nation_name
    """,
)
def q_rollup_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy region -> nation -> grand total. Spark expands
    grouping sets in a single aggregate (no query-per-level); NULL group
    cells are coalesced to '<ALL>' so the oracle hash is unambiguous.
    Static-SQL form (one py4j crossing). A re-aggregation rewrite was
    tried and retracted round 6 — see _ROLLUP_SQL's note."""
    ensure_views(spark, sf_dir, "customer", "nation", "region")
    return sorted_small(spark.sql(_ROLLUP_SQL), "region_name", "nation_name")


@query(
    "q_cube_status_priority",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<ALL>') AS status,
           COALESCE(o_orderpriority, '<ALL>') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all four grouping sets in one
    pass (SURVEY.md §2B grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<ALL>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<ALL>")).alias("priority"),
            "n_orders",
        )
        .transform(lambda d: sorted_small(d, "status", "priority"))
    )


@query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct in one aggregate. Spark expands this to an
    Expand + two-phase agg — one plan, no self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count("*").alias("n_rows"),
        )
        .transform(lambda d: sorted_small(d, "l_returnflag"))
    )


@query(
    "q_rank_variants",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rk,
           DENSE_RANK()   OVER w AS drk,
           PERCENT_RANK() OVER w AS prk,
           CUME_DIST()    OVER w AS cd
    FROM orders
    WHERE o_custkey % 101 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderstatus, rn
    """,
)
def q_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family over one window spec (one shuffle):
    row_number / rank / dense_rank plus the distribution forms
    percent_rank and cume_dist, whose exact rational values are
    deterministic across engines. Tie-free ordering via the orderkey
    suffix."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 101 == 0)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.percent_rank().over(w).alias("prk"),
            F.cume_dist().over(w).alias("cd"),
        )
        .orderBy("o_orderstatus", "rn")
    )


@query(
    "q_pivot_status_matrix",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_f')},
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_o')},
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: line status becomes columns (explicit value list — never
    let pivot infer values with a discovery pass over 100 TB). Catalyst
    rewrites pivot-with-known-values into exactly the conditional
    aggregation the oracle spells out: one shuffle, no extra pass, each
    cell a filtered partial aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            exact_sum("l_quantity").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("F_qty").alias("qty_f"),
            F.col("O_qty").alias("qty_o"),
            F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        )
        .transform(lambda d: sorted_small(d, "l_returnflag"))
    )


@query(
    "q_unpivot_nation_metrics",
    oracle=f"""
    WITH wide AS (
        SELECT c_nationkey,
               {sql_dsum('c_acctbal', 'total_bal')},
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, metric, value FROM (
        SELECT c_nationkey, 'n_cust' AS metric, CAST(n_cust AS DOUBLE) AS value FROM wide
        UNION ALL
        SELECT c_nationkey, 'n_segments', CAST(n_segments AS DOUBLE) FROM wide
        UNION ALL
        SELECT c_nationkey, 'total_bal', total_bal FROM wide
    )
    ORDER BY c_nationkey, metric
    """,
)
def q_unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): a wide per-nation metrics row becomes long
    (nation, metric, value) — the normalization step feeding generic
    metric sinks. Spark's unpivot is a zero-shuffle projection (each
    input row expands to k output rows in place); only the upstream
    aggregate shuffles."""
    c = load_table(spark, sf_dir, "customer")
    wide = c.groupBy("c_nationkey").agg(
        dsum("c_acctbal", "total_bal"),
        F.count("*").cast("double").alias("n_cust"),
        F.countDistinct("c_mktsegment").cast("double").alias("n_segments"),
    )
    return (
        wide.unpivot(
            ids=["c_nationkey"],
            values=["n_cust", "n_segments", "total_bal"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .transform(lambda d: sorted_small(d, "c_nationkey", "metric"))
    )


@query(
    "q_salted_sum_skewproof",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_salted_sum_skewproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (plans/scale.py ``salted_sum``) —
    the skew lever for HOT aggregation keys, oracle-checked.

    The 100-TB problem: AQE splits skewed JOIN partitions but a skewed
    groupBy still funnels each hot key through one task. ``salted_sum``
    fans every key across ``n_salts`` partial aggregates
    (groupBy((key, salt)) -> groupBy(key)); the partials are exact
    DECIMAL(25,6) sums, so the merged result is identical to the direct
    aggregate for every possible salt assignment — which is exactly
    what the oracle checks (l_returnflag has 3 values over all of
    lineitem: every key IS a hot key here). Phase geometry (two
    aggregation exchanges, key+salt then key) is plan-asserted in
    tests/test_scale.py.

    In-window since round 15 (rotated in for q_math_functions per
    VERDICT round 14 #2) and driver-green on first exposure: the
    hash-aggregate family's skew-lever row sits beside
    q1_pricing_summary in the driver window."""
    from ..plans.scale import salted_sum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        salted_sum(li, "l_returnflag", "l_quantity", n_salts=8,
                   out_col="total")
        .transform(lambda d: sorted_small(d, "l_returnflag"))
    )
