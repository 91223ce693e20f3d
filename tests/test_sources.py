"""Scan-source coverage (SURVEY.md §2B scan rows): CSV and JSON readers
round-trip the driver's tables; binaryFile is covered in test_arraylib.

These verify the *source adapters*, not query logic: schema inference,
header handling, nested-JSON access — each against the parquet truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.catalog import load_table
from aind_protein_data_transformation_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
)


@pytest.fixture(scope="module")
def nation_pdf(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_csv_scan_roundtrip(spark, sf_dir, nation_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("csv") / "nation_csv")
    nation_pdf.coalesce(1).write.option("header", True).csv(out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    assert sorted(back.columns) == sorted(nation_pdf.columns)
    assert back.count() == nation_pdf.count()
    a = {r.n_nationkey: r.n_name for r in nation_pdf.collect()}
    b = {r.n_nationkey: r.n_name for r in back.collect()}
    assert a == b
    # inferSchema must type the key as integer, not string
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_json_scan_roundtrip_and_nested(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events").limit(200)
    out = str(tmp_path_factory.mktemp("json") / "events_json")
    # Nest the props map so the JSON scan exercises nested access.
    ev.select(
        "event_id",
        "event_type",
        F.struct(
            F.from_json("props", "map<string,bigint>").alias("m"),
            F.col("value").alias("v"),
        ).alias("payload"),
    ).coalesce(1).write.json(out)
    back = spark.read.json(out)
    assert back.count() == 200
    # JSON has no map type: the map comes back as a struct; nested field
    # access still reaches the value.
    k_vals = back.select("event_id", F.col("payload.m.k").alias("k"))
    src = ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
    assert {(r.event_id, r.k) for r in k_vals.collect()} == {
        (r.event_id, r.k) for r in src.collect()
    }


# --- events.ts physical-encoding contract -------------------------------
#
# The driver's events.parquet has drifted between data generations:
# TIMESTAMP(NANOS) in round 1, TIMESTAMP(MICROS, isAdjustedToUTC=false)
# (TIMESTAMP_NTZ to Spark) in round 2. The loader contract is that ALL
# of nanos-long / TIMESTAMP_NTZ / TIMESTAMP produce identical
# TimestampType micros, for both the batch loader (catalog.load_table)
# and the stream source (streaming.events.read_events_stream). These
# fixtures pin that so the next regeneration can't silently flip results.

# Distinct micro epochs incl. sub-millisecond precision; nanos adds
# a sub-micro tail that both engines truncate toward zero.
_TS_MICROS = [1_700_000_000_000_000, 1_700_000_000_123_456, 1_700_003_600_999_999]


def _write_events_fixture(tmpdir, encoding):
    import pyarrow as pa
    import pyarrow.parquet as pq

    if encoding == "nanos":
        ts = pa.array([m * 1000 + 789 for m in _TS_MICROS], pa.timestamp("ns"))
    elif encoding == "ntz":
        ts = pa.array(_TS_MICROS, pa.timestamp("us"))
    elif encoding == "utc":
        ts = pa.array(_TS_MICROS, pa.timestamp("us", tz="UTC"))
    else:
        raise ValueError(encoding)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(['{"k":1}', '{"k":2}', '{"k":3}']),
        }
    )
    pq.write_table(table, str(tmpdir / "events.parquet"), version="2.6")
    return str(tmpdir)


@pytest.mark.parametrize("encoding", ["nanos", "ntz", "utc"])
def test_events_ts_encoding_batch(spark, tmp_path_factory, encoding):
    d = _write_events_fixture(tmp_path_factory.mktemp(f"ev_{encoding}"), encoding)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.us for r in df.select(F.unix_micros("ts").alias("us")).orderBy("event_id").collect()]
    assert got == _TS_MICROS
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


@pytest.mark.parametrize("encoding", ["nanos", "ntz", "utc"])
def test_events_ts_encoding_stream(spark, tmp_path_factory, encoding):
    d = _write_events_fixture(tmp_path_factory.mktemp(f"evs_{encoding}"), encoding)
    sdf = read_events_stream(spark, d).select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    out = run_stream_to_memory(sdf, name=f"ts_{encoding}", output_mode="append")
    got = [r.us for r in out.orderBy("event_id").collect()]
    assert got == _TS_MICROS


def test_events_ts_matches_duckdb_micros(spark, sf_dir, duck):
    """Whatever the current physical encoding, Spark's unix_micros(ts)
    must equal DuckDB's epoch_ns(ts)//1000 row-for-row (the precision
    contract every asof/streaming oracle relies on)."""
    got = {
        r.event_id: r.us
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    }
    want = dict(
        duck.execute(
            "SELECT event_id, epoch_ns(ts) // 1000 FROM events"
        ).fetchall()
    )
    assert got == want


def test_json_single_document_scan(spark, tmp_path_factory):
    """A22: read a config-style JSON document (the acquisition.json
    pattern, zeiss_job.py:64-89) and pull a nested filtered field."""
    doc = {
        "tiles": [
            {
                "coordinate_transformations": [
                    {"type": "translation", "translation": [0, 0, 0]},
                    {"type": "scale", "scale": ["0.75", "0.5", "0.5"]},
                ]
            }
        ]
    }
    import json

    p = tmp_path_factory.mktemp("doc") / "acquisition.json"
    p.write_text(json.dumps(doc))
    df = spark.read.option("multiLine", True).json(str(p))
    scale = df.select(
        F.filter(
            F.col("tiles")[0]["coordinate_transformations"],
            lambda t: t["type"] == "scale",
        )[0]["scale"].alias("scale")
    ).first()["scale"]
    assert [float(s) for s in scale] == [0.75, 0.5, 0.5]


def test_ensure_views_switches_sf_dirs(spark, sf_dir, tmp_path_factory):
    """The (session, sf_dir, table) view memo must re-register when the
    SAME view name points at a DIFFERENT sf_dir — a stale view would
    silently serve the wrong dataset to every SQL-form query — and must
    skip re-registration (the whole point) when the sf_dir repeats."""
    from aind_protein_data_transformation_spark import catalog

    other = tmp_path_factory.mktemp("ensure_views_sf")
    spark.range(3).selectExpr(
        "id AS r_regionkey", "concat('X', id) AS r_name", "'c' AS r_comment"
    ).write.parquet(str(other / "region.parquet"))

    catalog.ensure_views(spark, sf_dir, "region")
    n_real = spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"]
    assert n_real == 5

    catalog.ensure_views(spark, str(other), "region")
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == 3

    # back again — and the memo must dedupe repeat registration
    catalog.ensure_views(spark, sf_dir, "region")
    reg = catalog._VIEW_MEMO[spark]
    before = dict(reg)
    catalog.ensure_views(spark, sf_dir, "region")
    assert catalog._VIEW_MEMO[spark] == before
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == 5

    # clear_plan_memo invalidates the view memo (data-rewrite path)
    catalog.clear_plan_memo()
    assert spark not in catalog._VIEW_MEMO or not catalog._VIEW_MEMO[spark]
    catalog.ensure_views(spark, sf_dir, "region")
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == 5
