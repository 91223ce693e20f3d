"""As-of join queries over the events stream table.

Precision contract: events.ts is nanos in parquet; Spark reads micros
(catalog.py truncates) while DuckDB reads full nanos — comparing raw
timestamps across engines would flip matches that sit within the same
microsecond. Both sides therefore join and emit integer MICROSECONDS
(Spark ``unix_micros``, DuckDB ``epoch_ns(ts) // 1000`` — both floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_views, load_table
from ..operators.asof import asof_join, asof_join_banded
from .registry import query

#: union-sort as-of (operators/asof.py asof_join) as one static SQL
#: statement over the normalized events view: both sides tagged into one
#: relation, ONE shuffle on (user_id), last-ignoreNulls window carries
#: the latest click at-or-before each purchase (right rows sort first at
#: equal time -> inclusive match, same as DuckDB ASOF).
_ASOF_CLICK_SQL = """
WITH ev AS (
    SELECT event_id, user_id, event_type, unix_micros(ts) AS us, value
    FROM events
),
merged AS (
    SELECT *,
           last(_r, true) OVER (PARTITION BY user_id ORDER BY _t, _is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _asof
    FROM (
        SELECT user_id, us AS _t, 1 AS _is_left,
               struct(event_id, user_id, us, value) AS _l,
               CAST(NULL AS struct<click_id:bigint,click_us:bigint>) AS _r
        FROM ev WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, us AS _t, 0 AS _is_left,
               CAST(NULL AS
                   struct<event_id:bigint,user_id:bigint,us:bigint,value:double>)
                   AS _l,
               struct(event_id AS click_id, us AS click_us) AS _r
        FROM ev WHERE event_type = 'click'
    )
)
SELECT _l.event_id AS event_id, _l.user_id AS user_id, _l.us AS us,
       _l.value AS value,
       _asof.click_id AS asof_click_id, _asof.click_us AS asof_click_us
FROM merged WHERE _is_left = 1
ORDER BY event_id
"""


@query(
    "asof_purchase_last_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.us, p.value,
           c.click_id AS asof_click_id,
           c.us AS asof_click_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.us >= c.us
    ORDER BY p.event_id
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before it
    (attribution join). Spark side: union-sort as-of (one shuffle; the
    static-SQL twin of operators/asof.py asof_join, which stays the
    general API); oracle: DuckDB's native ASOF LEFT JOIN."""
    ensure_views(spark, sf_dir, "events")
    return spark.sql(_ASOF_CLICK_SQL)


@query(
    "asof_inner_error_context",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'error'
    ),
    v AS (
        SELECT user_id, epoch_ns(ts) // 1000 AS us, value
        FROM events WHERE event_type = 'view'
    )
    SELECT e.user_id,
           COUNT(*) AS n_errors,
           SUM(v.value) IS NOT NULL AS has_context,
           CAST(SUM(CAST(v.value AS DECIMAL(25,6))) AS DOUBLE) AS sum_view_value
    FROM e ASOF JOIN v
      ON e.user_id = v.user_id AND e.us >= v.us
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def asof_inner_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner as-of: errors matched to the latest prior view of the same
    user, aggregated per user — the 'what was the user looking at when
    it broke' query. Errors with no prior view drop out (inner)."""
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "us"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("us").alias("view_us"), "value"
    )
    joined = asof_join(
        errors,
        views,
        on="user_id",
        left_time="us",
        right_time="view_us",
        right_values=["value"],
        how="inner",
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").alias("n_errors"),
            F.sum("asof_value").isNotNull().alias("has_context"),
            F.sum(F.col("asof_value").cast("decimal(25,6)"))
            .cast("double")
            .alias("sum_view_value"),
        )
        .orderBy("user_id")
    )


BANDED_WIDTH_US = 3_600_000_000  # 1-hour bands


@query(
    "asof_banded_last_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS click_id, user_id, epoch_ns(ts) // 1000 AS us
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.us, p.value,
           c.click_id AS asof_click_id,
           c.us AS asof_click_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.us >= c.us
    ORDER BY p.event_id
    """,
)
def asof_banded_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution join again, through the SKEW-RESISTANT banded
    as-of operator (operators/asof.py:asof_join_banded, 1-hour bands):
    identical answers to asof_purchase_last_click — same oracle — but a
    hot user's events spread over per-(user, hour) tasks instead of one
    per-user window partition. This is the plan to pick when a key
    holds millions of rows; the plain union-sort form stays cheaper
    (one shuffle) when keys are well spread."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros("ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("us").alias("click_us"),
    )
    return (
        asof_join_banded(
            purchases,
            clicks,
            on="user_id",
            left_time="us",
            right_time="click_us",
            right_values=["click_id", "click_us"],
            band_width=BANDED_WIDTH_US,
            how="left",
        )
        .select(
            "event_id",
            "user_id",
            "us",
            "value",
            "asof_click_id",
            F.col("asof_click_us").alias("asof_click_us"),
        )
        .orderBy("event_id")
    )
