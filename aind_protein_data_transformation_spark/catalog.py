"""Test-table catalog: parquet loaders + temp-view registration.

The driver's tables (TESTDATA.md / FIXTURES.md §1) are one parquet file
per table under ``/root/testdata/sf{0.001,0.01,0.1}/``. At 100 TB these
would be partitioned datasets; ``spark.read.parquet`` takes either shape
unchanged, and every query in ``queries/`` is written against the scan so
Catalyst pushes filters/projections into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in parquet, which Spark's reader rejects
        # outright; nanosAsLong is runtime-settable, so set it here too
        # (the grading driver builds its own session without session.py).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # With nanosAsLong, ts arrives as nanos-since-epoch LONG. Truncate
        # to micros — the same direction DuckDB takes casting TIMESTAMP_NS
        # -> TIMESTAMP. Fail loudly on any other shape.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif not ts_type.startswith("timestamp"):
            raise TypeError(f"unexpected events.ts type {ts_type!r}")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
