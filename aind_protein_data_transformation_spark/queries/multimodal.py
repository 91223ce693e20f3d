"""Multimodal-column queries: binary payloads + typed metadata
(north_star; the reference's own data model is exactly this — opaque
CZI bytes + extracted metadata, zeiss_job.py:145-153).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.multimodal import (
    attach_payload,
    decode_image_stub,
    extract_features_stub,
    frame_sample,
)
from .registry import query


@query(
    "multimodal_payload_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(octet_length(encode(text))) AS min_bytes,
           MAX(octet_length(encode(text))) AS max_bytes,
           COUNT(DISTINCT sha256(text)) AS n_distinct_payloads
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary payload accounting per source: byte sizes and
    content-hash distinctness — the storage-audit query of a media
    corpus, touching payloads only through byte length + hash."""
    d = load_table(spark, sf_dir, "documents")
    media = attach_payload(d).join(d.select("doc_id", "source", "text"), "doc_id")
    return (
        media.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.min("meta.n_bytes").alias("min_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
            F.countDistinct(F.sha2("text", 256)).alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    -- the corpus is pure ASCII, so ascii() of a character equals the
    -- payload byte at that position and the byte-bucket histogram is
    -- reproducible in SQL
    WITH d AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n
        FROM documents WHERE octet_length(encode(text)) > 0
    ),
    e AS (
        SELECT doc_id, n,
               CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) // 16 AS BIGINT)
                   AS bucket
        FROM d, LATERAL (SELECT unnest(generate_series(1, n)) AS i)
    ),
    c AS (
        SELECT doc_id, bucket, COUNT(*) AS cnt FROM e GROUP BY doc_id, bucket
    ),
    g AS (
        SELECT d.doc_id, d.n, b.bucket
        FROM d CROSS JOIN
             (SELECT unnest(generate_series(0, 15)) AS bucket) b
    )
    SELECT g.doc_id,
           CAST(g.bucket AS BIGINT) AS bucket,
           CAST(COALESCE(c.cnt, 0) AS DOUBLE) / g.n AS frac
    FROM g LEFT JOIN c ON g.doc_id = c.doc_id AND g.bucket = c.bucket
    ORDER BY g.doc_id, g.bucket
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction through the Arrow-batched numpy kernel
    (operators/multimodal.py extract_features_stub): per-payload
    16-bucket byte histograms as fractions, long form — the shape a
    real embedding/CNN forward pass drops into. Deterministic, so the
    oracle replays it from the ASCII text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        extract_features_stub(attach_payload(d))
        .orderBy("doc_id", "bucket")
    )


@query("multimodal_decode_stub", oracle=None)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode through mapInPandas (STUB kernel — see
    operators/multimodal.py): the real plumbing a production decoder
    plugs into. Not SQL-expressible (pandas UDF), so rows-only checked
    here; exact end-to-end values asserted in tests/test_multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    decoded = decode_image_stub(attach_payload(d))
    return (
        decoded.groupBy("mime", "n_channels")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
            F.sum("checksum").alias("checksum_sum"),
        )
        .orderBy("mime", "n_channels")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    -- DuckDB cannot substring BLOBs; the corpus is pure ASCII (verified:
    -- octet_length(encode(text)) == length(text) for every row), so the
    -- byte at a position equals ascii() of the character there.
    WITH frames AS (
        SELECT doc_id, frame_idx,
               ascii(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 1)) AS frame_byte
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0,
                 CAST(floor(octet_length(encode(text)) / 64.0) AS BIGINT) - 1)) AS frame_idx)
        WHERE octet_length(encode(text)) >= 64
    )
    SELECT doc_id,
           COUNT(*) AS n_frames,
           CAST(SUM(frame_byte) AS BIGINT) AS byte_sum,
           MIN(frame_byte) AS min_byte,
           MAX(frame_byte) AS max_byte
    FROM frames
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (video-pipeline stand-in):
    one byte per 64-byte stride via JVM binary slicing — no Python in
    the loop; explode streams into the aggregate."""
    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_payload(d), every_n_bytes=64)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("frame_byte").alias("byte_sum"),
            F.min("frame_byte").alias("min_byte"),
            F.max("frame_byte").alias("max_byte"),
        )
        .orderBy("doc_id")
    )
