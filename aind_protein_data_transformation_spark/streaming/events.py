"""Structured Streaming surface over the events table (SURVEY.md §2B
Streaming; §1.4 — the reference is batch-only, this is the engine's
extension for the north_star streaming requirement).

The driver's events table is a parquet file; the stream source replays
it file-by-file (at production scale: a directory the ingest keeps
appending to, or Kafka — the query shapes below are source-agnostic).
Every streaming query here is checked by REPLAY EQUIVALENCE: run with
``availableNow`` to completion into a memory sink and compare against
the equivalent batch query (the DuckDB oracle) on the same data —
deterministic because the queries are event-time-only (no
processing-time dependence).
"""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

#: Extra options applied to every events file-stream source — set via
#: :func:`stream_replay_options` (tests use it to force
#: ``maxFilesPerTrigger=1`` so a multi-file fixture replays as one
#: micro-batch per file, exercising watermark/state advancement across
#: batch boundaries instead of a single availableNow mega-batch).
_STREAM_READ_OPTIONS: dict[str, str] = {}

#: Batch count of the most recent :func:`run_stream_to_memory` replay
#: (``lastProgress.batchId + 1``); lets tests assert a replay really
#: crossed N micro-batch boundaries.
LAST_REPLAY_BATCHES: int = 0


@contextlib.contextmanager
def stream_replay_options(**options: str | int):
    """Scoped extra source options for events streams (e.g.
    ``maxFilesPerTrigger=1``). Not thread-safe — test-only."""
    global _STREAM_READ_OPTIONS
    prev = _STREAM_READ_OPTIONS
    _STREAM_READ_OPTIONS = {k: str(v) for k, v in options.items()}
    try:
        yield
    finally:
        _STREAM_READ_OPTIONS = prev


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over events, normalized to TimestampType ts.

    Parquet stream sources need an explicit schema, and the physical
    encoding of ``ts`` has drifted across driver data generations
    (nanos-long in round 1, TIMESTAMP_NTZ micros in round 2) — so probe
    the footer with a one-off batch read and adapt, exactly mirroring
    ``catalog._normalize_events_ts``. A hardcoded schema here silently
    misreads when the encoding flips (NTZ micros read as a LongType
    column yields raw micros where nanos are assumed: every timestamp
    1000x too small).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(events_path).schema
    # The file-stream source needs a DIRECTORY (it watches for new
    # files). The driver ships events.parquet as a single FILE — select
    # it out of sf_dir via glob; but when a fixture provides
    # events.parquet as a DIRECTORY of part files (the multi-micro-batch
    # replay tests), stream that directory itself so each part file can
    # become its own micro-batch under maxFilesPerTrigger.
    reader = spark.readStream.schema(schema)
    for k, v in _STREAM_READ_OPTIONS.items():
        reader = reader.option(k, v)
    if os.path.isdir(events_path):
        raw = reader.parquet(events_path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def run_stream_to_memory(
    sdf: DataFrame, name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the result as a batch DataFrame.

    availableNow processes everything currently in the source and
    stops — the replay-equivalence harness. Memory sinks are
    per-session; names are uniquified so repeated calls don't collide.
    """
    qname = f"{name or 'stream'}_{uuid.uuid4().hex[:8]}"
    query = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    global LAST_REPLAY_BATCHES
    progress = query.lastProgress
    LAST_REPLAY_BATCHES = (progress["batchId"] + 1) if progress else 0
    return sdf.sparkSession.table(qname)
