"""Deeper multi-join analytics (TPC-H q7/q8/q10 shapes, adapted to the
driver's star schema).

These exercise what the simpler joins don't: self-joined dimensions
(nation as both supplier- and customer-side), conditional aggregation
for ratio metrics, and a join spine long enough for Catalyst's join
reordering + AQE to matter. All dims broadcast; the fact table never
shuffles before its aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_views, load_table
from ..functions.numeric import (
    dsum,
    exact_sum,
    exact_sum_sql,
    spark_dsum_sql,
    sql_dsum,
)
from ..plans.scale import sorted_small
from .registry import query


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, ship_year,
       {spark_dsum_sql('volume', 'revenue')}
FROM (
    SELECT /*+ BROADCAST(s), BROADCAST(n1), BROADCAST(n2) */
           n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, ship_year
"""


_Q8_SQL = f"""
SELECT ship_year,
       {exact_sum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0D END")}
       / {exact_sum_sql('volume')} AS mkt_share
FROM (
    SELECT /*+ BROADCAST(n2), BROADCAST(r), BROADCAST(s), BROADCAST(n1) */
           year(o.o_orderdate) AS ship_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n1.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
)
GROUP BY ship_year
"""


_Q10_SQL = f"""
SELECT /*+ BROADCAST(n) */
       c.c_custkey, c.c_name,
       {spark_dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       n.n_name AS nation
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, ship_year,
           {sql_dsum('volume', 'revenue')}
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS ship_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: bilateral trade volume between two nations by
    ship year. Nation joins twice under different roles (supplier vs
    customer side) — the classic dimension self-role pattern; the
    OR-of-pairs predicate survives into a single broadcast spine.
    Static-SQL form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    return sorted_small(
        spark.sql(_Q7_SQL), "supp_nation", "cust_nation", "ship_year"
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT ship_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END
                         AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS ship_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n2.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
    )
    GROUP BY ship_year
    ORDER BY ship_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: one nation's supplier share of a region's order
    volume per year — conditional aggregation (CASE inside SUM) over a
    6-table join; numerator and denominator come from ONE pass, not two
    scans. Ratio of two decimal-exact sums divides as double on both
    engines. Static-SQL form (one py4j crossing)."""
    ensure_views(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    return sorted_small(spark.sql(_Q8_SQL), "ship_year")


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: customers ranked by revenue lost to returns in
    one year. Pushed flag+date filters shrink the fact scan before any
    join; TakeOrderedAndProject caps the result without a global sort.
    Static-SQL form (one py4j crossing)."""
    ensure_views(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return spark.sql(_Q10_SQL)


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag IN ('A', 'N')
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: priority-class line counts per status — CASE-in-
    SUM pivot counts plus IN-list filters pushed to both scans; the join
    carries only the two columns each side needs."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_returnflag").isin("A", "N")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .transform(lambda d: sorted_small(d, "l_linestatus"))
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT CAST(100.0 * SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: one-row promo revenue share — LIKE-prefixed
    conditional numerator over a broadcast part join, single pass,
    decimal-exact ratio. A global (group-less) aggregate, the one agg
    form no other query covered."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * exact_sum(
                "CASE WHEN p_type LIKE 'PROMO%'"
                " THEN l_extendedprice * (1 - l_discount) ELSE 0.0D END"
            )
            / exact_sum("l_extendedprice * (1 - l_discount)")
        ).alias("promo_revenue_pct")
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: correlated EXISTS with an inter-column predicate
    (lineitem shipped >60 days after the order date), realized as a
    LEFT SEMI join — the scale-correct EXISTS: no duplication of the
    orders side, one shuffle keyed on orderkey. (The reference schema
    lacks commit/receipt dates; late shipping stands in.)"""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .transform(lambda d: sorted_small(d, "o_orderpriority"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: the pure scan-filter-aggregate — every predicate
    pushes to the parquet scan (PushedFilters), the projection prunes to
    three columns, and the single global sum combines map-side. The
    simplest possible 100-TB query; its plan SHOULD be a one-exchange
    two-stage job, and is."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum("l_extendedprice * l_discount", "revenue"))
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS o_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity * 0.01',
                     'sum_profit')}
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped product profit: 5-way join where part/supplier/
    nation broadcast and the selective LIKE filter on part shrinks the
    build side BEFORE the fact join (semi-reduction through the
    broadcast hash table; at 100 TB this is the difference between
    scanning lineitem and scanning matching lineitem). The profit
    expression uses a fixed 1% cost factor in place of the missing
    partsupp supplycost."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum("l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.01D", "sum_profit"))
        .transform(lambda d: sorted_small(d, "nation", F.desc("o_year")))
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped customer order-count histogram: left outer join
    with an ON-clause predicate (NOT a WHERE — customers with zero
    surviving orders must remain), double aggregation. COUNT(col) vs
    COUNT(*) null semantics carry the zero bucket through both engines
    identically."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .transform(lambda d: sorted_small(d, F.desc("custdist"), F.desc("c_count")))
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           o.o_totalprice,
           {sql_dsum('l.l_quantity', 'total_qty')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume customers: HAVING subquery as a
    semi-join against a pre-aggregated key set (one extra pass over
    lineitem's two relevant columns, shuffled on the same orderkey as
    the main join so the exchanges line up), then top-100 via
    TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier: aggregate-of-aggregate where the
    scalar MAX over the per-supplier revenue relation joins back against
    that same relation. The revenue relation is computed once per branch
    from the same deterministic plan; the 1-row MAX side broadcasts, so
    the "scalar subquery" costs one extra reduction, never a second
    shuffle. Revenue equality across engines is safe because both sides
    sum in exact fixed-point (functions/numeric.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .transform(lambda d: sorted_small(d, "s_suppkey"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT p.p_brand,
           {sql_dsum('l.l_extendedprice', 'small_qty_revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#13', 'Brand#20')
      AND l.l_quantity < t.qty_threshold
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity revenue: the correlated AVG
    subquery (per-part 20%-of-average threshold) decorrelates into a
    per-part aggregate joined back on the SAME key as the main join, so
    the threshold pass and the probe pass share one hash partitioning
    (exchanges line up, AQE reuses the layout). The brand filter
    broadcasts through part and semi-reduces lineitem before the
    shuffle. The threshold itself (0.2 * AVG of integer-valued
    quantities) is bit-identical across engines: integer sums in double
    are exact and the one division is performed identically."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#13", "Brand#20")
    )
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice", "small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
        .transform(lambda d: sorted_small(d, "p_brand"))
    )


@query(
    "q19_disjunctive_pushdown",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1  AND 10
           AND l.l_quantity BETWEEN 1  AND 11)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 25 AND 40
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-ANDs: three disjuncts each constraining
    both sides of the join. Catalyst extracts the single-side residues
    of the disjunction — the brand/size union prunes the part build
    side and the quantity union pushes into the lineitem scan
    (PushedFilters) — before evaluating the full predicate post-join.
    At 100 TB that pre-join extraction is the difference between
    shuffling the whole fact table and shuffling ~nothing: the
    broadcast hash table holds only parts any disjunct can match."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    d1 = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(25, 40)
        & F.col("l_quantity").between(20, 35)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(d1 | d2 | d3)
        .agg(
            dsum("l_extendedprice * (1 - l_discount)", "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q22_dormant_customers",
    oracle=f"""
    WITH bal AS (
        SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c.c_acctbal', 'totacctbal')}
    FROM customer c, bal
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * bal.cnt > bal.cents
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped dormant high-balance customers: a global-average
    scalar subquery plus an anti join against recent orders. The
    above-average comparison is done in integer cents cross-multiplied
    by the count (acctbal*100*cnt > total_cents) so the threshold
    never exists as a float — engine-exact without decimal division.
    The 1-row balance aggregate broadcasts; the anti join shuffles on
    custkey (DuckDB instead scans orders per the NOT EXISTS — same
    semantics, different physical strategy, hence its cost profile)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(cents).alias("cents"), F.count("*").alias("cnt"))
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(bal))
        .filter(cents * F.col("cnt") > F.col("cents"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .transform(lambda d: sorted_small(d, "c_nationkey"))
    )


@query(
    "q2_min_acctbal_supplier",
    oracle="""
    SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 10
      AND s.s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          WHERE l2.l_partkey = p.p_partkey
      )
    GROUP BY ALL
    ORDER BY s.s_acctbal, p.p_partkey, s.s_name
    LIMIT 100
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: per-part minimum-cost supplier via a correlated
    scalar MIN subquery (s_acctbal standing in for the absent
    ps_supplycost). Spark side decorrelates by hand: the per-part MIN is
    one small aggregate broadcast back into the join spine — what
    Catalyst does internally for the SQL form, made explicit."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ls = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    min_bal = ls.groupBy("l_partkey").agg(F.expr("MIN(s_acctbal) AS min_bal"))
    return (
        ls.join(F.broadcast(p), ls.l_partkey == p.p_partkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(min_bal, "l_partkey")
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "n_name")
        .distinct()
        .orderBy("s_acctbal", "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q11_important_suppliers",
    oracle=f"""
    WITH v AS (
        SELECT l_suppkey AS s_suppkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'value')}
        FROM lineitem
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, value
    FROM v
    WHERE value > (
        SELECT CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) * 0.002 FROM v
    )
    ORDER BY value DESC, s_suppkey
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: groups filtered against a scalar fraction of the
    GLOBAL total (HAVING value > SUM(value) * f) — the one subquery form
    nothing else covers. The global total is a 1-row aggregate OVER the
    per-supplier aggregate, broadcast into the filter; lineitem is
    scanned once (the grouped subframe feeds both sides via exchange
    reuse). Exact scale-6 sums on both levels keep the knife-edge
    comparison engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        dsum("l_extendedprice * (1 - l_discount)", "value")
    )
    threshold = v.agg(
        F.expr(f"{exact_sum_sql('value')} * 0.002D AS threshold")
    )
    return (
        v.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("threshold"))
        .select("s_suppkey", "value")
        .orderBy(F.desc("value"), "s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%'
      )
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct-supplier counts per part attribute
    slice with a NOT IN exclusion subquery. NOT IN over a non-null key
    is a left-anti join (broadcast: the exclusion list is tiny); the
    count-distinct shuffles (brand, size, suppkey) partials — never a
    per-group set in one task."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, sf_dir, "lineitem")
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%77%"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.expr("CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt"))
        .transform(lambda d: sorted_small(d, F.desc("supplier_cnt"), "p_brand", "p_size"))
    )


@query(
    "q20_excess_share_suppliers",
    oracle=f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity', 'qty')}
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
        SELECT l_partkey,
               CAST(SUM(CAST(qty AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
        FROM ps GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM ps
    JOIN pt ON ps.l_partkey = pt.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.qty > CAST(0.15 AS DOUBLE) * pt.total_qty
    ORDER BY s.s_suppkey
    """,
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers holding an outsized share of some
    part's flow — a correlated comparison against a fraction of the
    per-part total (the q20 'excess stock' predicate; 0.15 rather than
    TPC-H's 0.5 so the slice is non-empty at every test SF). Two stacked aggregates
    over one lineitem scan; the per-part totals re-aggregate the
    (part, supplier) partials, never the raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(dsum("l_quantity", "qty"))
    pt = ps.groupBy("l_partkey").agg(
        F.expr(f"{exact_sum_sql('qty')} AS total_qty")
    )
    return (
        ps.join(pt, "l_partkey")
        .where(F.expr("qty > 0.15D * total_qty"))
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .transform(lambda d: sorted_small(d, "s_suppkey"))
    )


@query(
    "q21_sole_blame_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q21_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: the only-guilty-party pattern — EXISTS plus
    NOT EXISTS correlated on the SAME fact table ('another supplier is
    in the order' / 'no other supplier returned in it'), with
    l_returnflag = 'R' standing in for the absent receipt/commit dates.
    Spark side: a semi-join then an anti-join of lineitem against
    itself on (orderkey, suppkey<>), both shuffling on orderkey only."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    other = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    other_r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_key"), F.col("l_suppkey").alias("r_supp")
    )
    qualified = (
        l1.join(
            other,
            (l1.l_orderkey == other.o_key) & (l1.l_suppkey != other.o_supp),
            "left_semi",
        )
        .join(
            other_r,
            (l1.l_orderkey == other_r.r_key) & (l1.l_suppkey != other_r.r_supp),
            "left_anti",
        )
    )
    return (
        qualified.join(F.broadcast(s), qualified.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.expr("CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
