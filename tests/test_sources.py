"""Scan-source coverage (SURVEY.md §2B scan rows): CSV and JSON readers
round-trip the driver's tables; binaryFile is covered in test_arraylib.

These verify the *source adapters*, not query logic: schema inference,
header handling, nested-JSON access — each against the parquet truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.catalog import load_table


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
