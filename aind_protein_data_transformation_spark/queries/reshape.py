"""Reshape + statistical-aggregate queries: PIVOT, UNPIVOT, the
corr/covar/regr aggregate family, and batch sessionization.

Rounds out the relational surface a reference user would expect beyond
SURVEY.md §2's explicit rows: wide<->long reshaping is the bread and
butter of feature tables, the regression aggregates are the cheapest
whole-corpus statistics a curation pipeline computes, and gap-based
sessionization is the batch twin of the streaming session window
(streaming_queries.py) — same semantics, expressed as a window +
running sum instead of state.

Scale notes:
- PIVOT with an explicit value list needs no values-discovery job;
  Catalyst plans it as a two-level aggregate — map-side partials on the
  fine (row, pivot) key, then a tiny pivotfirst aggregate per row key —
  so the exchanges carry combined cells, never raw rows.
- UNPIVOT is a generator projection (no shuffle); the input here is a
  3-row aggregate.
- corr/covar/regr are single-pass streaming co-moments (map-side
  partials). Inputs are integer-valued columns so both engines'
  incremental formulas agree far below the 6-decimal compare.
- Sessionization partitions by user: per-user event counts bound each
  window partition (the classic skew caveat: a bot user concentrates
  one task; salt by day first if that ever matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import ensure_views
from .registry import query

# ---------------------------------------------------------------- pivot

#: statuses x priorities cell counts. COALESCE matters: Spark's PIVOT
#: yields NULL for an empty cell (it is first-of-group under the hood)
#: where DuckDB's FILTER count yields 0.
_PIVOT_SQL = """
SELECT o_orderstatus,
       COALESCE(urgent, 0) AS urgent,
       COALESCE(high, 0) AS high,
       COALESCE(medium, 0) AS medium,
       COALESCE(not_specified, 0) AS not_specified,
       COALESCE(low, 0) AS low
FROM (SELECT o_orderstatus, o_orderpriority FROM orders)
PIVOT (COUNT(*) FOR o_orderpriority IN (
    '1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium,
    '4-NOT SPECIFIED' AS not_specified, '5-LOW' AS low))
ORDER BY o_orderstatus
"""


@query(
    "q_pivot_status_by_priority",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
               AS not_specified,
           COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted wide: one row per status, one column per
    priority. The explicit IN list avoids the values-discovery pass
    (Spark's dynamic pivot first collects distinct values to the
    driver); Catalyst plans the rest as a two-level aggregate whose
    exchanges carry combined (status, priority) cells, never raw rows.
    The oracle replays it as FILTERed counts."""
    ensure_views(spark, sf_dir, "orders")
    return spark.sql(_PIVOT_SQL)


# -------------------------------------------------------------- unpivot

_UNPIVOT_SQL = """
SELECT l_returnflag, measure, amount
FROM (
    SELECT l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag
)
UNPIVOT (amount FOR measure IN (sum_qty, min_qty, max_qty))
ORDER BY l_returnflag, measure
"""


@query(
    "q_unpivot_flag_measures",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, amount FROM (
        SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS amount FROM wide
        UNION ALL
        SELECT l_returnflag, 'min_qty', min_qty FROM wide
        UNION ALL
        SELECT l_returnflag, 'max_qty', max_qty FROM wide
    ) ORDER BY l_returnflag, measure
    """,
)
def q_unpivot_flag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-flag aggregates melted long: (l_returnflag, measure,
    amount). UNPIVOT is a generator projection — no shuffle beyond the
    feeding aggregate. l_quantity is integer-valued, so the double SUM
    is order-independent-exact on both engines. The oracle replays the
    melt as UNION ALL arms (portable across dialects)."""
    ensure_views(spark, sf_dir, "lineitem")
    return spark.sql(_UNPIVOT_SQL)


# ---------------------------------------------------- corr/covar/regr

_STATS_SQL = """
SELECT l_returnflag,
       corr(CAST(l_quantity AS DOUBLE), CAST(l_linenumber AS DOUBLE))
           AS corr_qty_line,
       covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_linenumber AS DOUBLE))
           AS covar_s,
       covar_pop(CAST(l_quantity AS DOUBLE), CAST(l_linenumber AS DOUBLE))
           AS covar_p,
       regr_slope(CAST(l_quantity AS DOUBLE), CAST(l_linenumber AS DOUBLE))
           AS slope_qty_on_line,
       regr_intercept(CAST(l_quantity AS DOUBLE),
                      CAST(l_linenumber AS DOUBLE)) AS intercept_qty_on_line
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@query("q_corr_regr_aggregates", oracle=_STATS_SQL)
def q_corr_regr_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, sample/population covariance, and the
    regr_slope/regr_intercept pair per return flag — single-pass
    streaming co-moments with map-side partials (never a self-join or a
    two-pass mean-then-moment plan). Both columns are integer-valued,
    so the engines' incremental update formulas agree to ~1e-14 —
    orders of magnitude inside the 6-decimal compare; the oracle is the
    identical statement (DuckDB shares the function names and the
    (y, x) regr argument order)."""
    ensure_views(spark, sf_dir, "lineitem")
    return spark.sql(_STATS_SQL)


# -------------------------------------------------------- sessionize

#: 6-hour inactivity gap; micros arithmetic on both engines
#: (unix_micros / epoch_us) so sub-second timestamps can't straddle a
#: seconds-truncation boundary differently per engine.
_SESSION_GAP_US = 6 * 3600 * 1_000_000

#: r16 range-prefusion (guide §2.4, same proof as q_window_running_
#: totals): every window and the session aggregate key on user_id and
#: the final order starts with user_id, so ONE range exchange up front
#: serves the whole query and the final ORDER BY becomes a local
#: SORT BY (the old plan's range sampler re-executed the entire
#: window+aggregate subtree).
_SESSIONIZE_SQL = f"""
WITH gapped AS (
    SELECT user_id, ts, event_id,
           CASE WHEN unix_micros(ts) - LAG(unix_micros(ts)) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id)
                     > {_SESSION_GAP_US}
                  OR LAG(ts) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM (SELECT /*+ REPARTITION_BY_RANGE(user_id) */ * FROM events)
),
numbered AS (
    SELECT user_id, ts, event_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM gapped
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(MAX(unix_micros(ts)) - MIN(unix_micros(ts)) AS DOUBLE) / 1e6
           AS duration_s
FROM numbered
GROUP BY user_id, session_id
SORT BY user_id, session_id
"""


@query(
    "q_sessionize_events",
    oracle=f"""
    WITH gapped AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                         > {_SESSION_GAP_US}
                      OR LAG(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gapped
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS DOUBLE) / 1e6
               AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a session breaks after 6 h of user
    inactivity — lag marks boundaries, a running sum numbers sessions,
    one aggregate summarizes each. The batch twin of
    streaming_session_window (same gap semantics, window+prefix-sum
    instead of state); ties on ts break by event_id on both engines.
    The groupBy reuses the window's (user_id) partitioning — one
    exchange for the whole query."""
    ensure_views(spark, sf_dir, "events")
    return spark.sql(_SESSIONIZE_SQL)


# ----------------------------------------------------------- histogram

#: fixed-width 50k bins over o_totalprice (domain ~[1k, 500k]); FIXED
#: edges mean the binning is a pure projection — no min/max pre-scan,
#: no driver-side bounds collect, one map-side-combined aggregate.
_HIST_BIN_W = 50_000

_HISTOGRAM_SQL = f"""
SELECT CAST(FLOOR(o_totalprice / {_HIST_BIN_W}) AS BIGINT) AS bin,
       CAST(FLOOR(o_totalprice / {_HIST_BIN_W}) AS BIGINT) * {_HIST_BIN_W}.0
           AS bin_lo,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       {{dsum}}
FROM orders
GROUP BY 1
ORDER BY bin
"""


@query(
    "q_histogram_equi_width",
    oracle=_HISTOGRAM_SQL.format(
        dsum="CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)"
        " AS sum_price"
    ),
)
def q_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram of order totals: fixed 50k-wide bins,
    per-bin count/min/max and the exact-decimal sum. Fixed edges make
    the bin id a projection expression (contrast the rank-select
    percentile operator, whose log-buckets earn their keep when the
    domain is unknown); the whole query is one map-side-combined
    aggregate over O(bins) groups at any data size."""
    from ..functions.numeric import spark_dsum_sql

    ensure_views(spark, sf_dir, "orders")
    return spark.sql(
        _HISTOGRAM_SQL.format(dsum=spark_dsum_sql("o_totalprice", "sum_price"))
    )


# ------------------------------------------- interval range window

#: oracle form: portable ANSI, shared verbatim with DuckDB.
_ROLLING_SQL = """
SELECT user_id, event_id, ts,
       SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW) AS rolling_1h
FROM events
ORDER BY user_id, event_id
"""

#: Spark form — r16 range-prefusion: window keys on user_id, output
#: order starts with user_id: one range exchange, local final sort
#: (see _SESSIONIZE_SQL note). Identical rows and order; the hint and
#: SORT BY are Spark-only syntax, so the oracle keeps the portable
#: statement above.
_ROLLING_SPARK_SQL = """
SELECT user_id, event_id, ts,
       SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                              AND CURRENT ROW) AS rolling_1h
FROM (SELECT /*+ REPARTITION_BY_RANGE(user_id) */ * FROM events)
SORT BY user_id, event_id
"""


@query("q_window_interval_range", oracle=_ROLLING_SQL)
def q_window_interval_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding aggregate in batch: each event's sum of
    `value` over the trailing hour for its user, via a RANGE frame with
    a calendar-interval boundary — the frame boundary is data-dependent
    per row, which ROWS frames cannot express. Same statement runs on
    both engines (RANGE peers on tied ts included identically). One
    exchange on user_id; per-user frames are the bounded batch twin of
    streaming_sliding_window's state."""
    ensure_views(spark, sf_dir, "events")
    return spark.sql(_ROLLING_SPARK_SQL)
