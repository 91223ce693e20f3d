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

from ..catalog import load_table
from ..operators.asof import asof_join, asof_join_banded
from .registry import query


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
    (attribution join). Spark side: union-sort as-of (operators/asof.py,
    one shuffle); oracle: DuckDB's native ASOF LEFT JOIN."""
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
        asof_join(
            purchases,
            clicks,
            on="user_id",
            left_time="us",
            right_time="click_us",
            right_values=["click_id", "click_us"],
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
