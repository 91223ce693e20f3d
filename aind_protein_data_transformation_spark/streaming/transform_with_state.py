"""Spark 4 ``transformWithStateInPandas`` stateful operator (import-
gated — see note below).

``streaming_stateful_totals`` (queries/streaming_queries.py) exercises
the original arbitrary-state API, ``applyInPandasWithState``. Spark 4
ships its successor, ``transformWithStateInPandas``: typed state
variables (value/list/map), per-state TTL, timers, and initial-state
bootstrap, all backed by the (RocksDB-capable) state store. This module
provides the same per-user running-totals operator on the NEW API so a
deployment on a full Spark distribution gets the production-grade
state machinery.

ENVIRONMENT GATE: the new API's Python worker speaks protobuf to the
JVM state server (``pyspark.sql.streaming.proto``), and this container
has no ``google.protobuf`` — the stream fails at Python-runner init
with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. The operator is
therefore not a registered query (the driver's container is the same
environment);
``tests/test_streaming_multibatch.py::test_transform_with_state``
runs it end-to-end when protobuf is importable and SKIPs otherwise,
exactly like the optional-zarr sink gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import read_events_stream, run_stream_to_memory


def protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def tws_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user (count, exact micro-sum, last event time) via a
    ``StatefulProcessor`` with a typed ``ValueState`` — update-mode
    emission, final row per key equals the batch GROUP BY exactly
    (integer micro-unit accumulation, arrival-order independent)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n BIGINT, micros BIGINT, last_us BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, micros, last_us = (
                self._totals.get() if self._totals.exists() else (0, 0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                micros += int(round((pdf["value"] * 1_000_000).round().sum()))
                last_us = max(last_us, int(pdf["us"].max()))
            self._totals.update((n, micros, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [micros / 1_000_000],
                    "last_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir).withColumn("us", F.unix_micros("ts"))
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType=(
            "user_id long, n_events long, total_value double, last_us long"
        ),
        outputMode="Update",
        timeMode="None",
    )
    from pyspark.sql.window import Window

    totals_df = run_stream_to_memory(out, "tws", output_mode="update")
    # one update row per key per batch: keep the final (max n_events)
    latest = totals_df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("n_events"))
        ),
    )
    return (
        latest.filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "last_us")
        .orderBy("user_id")
    )
