"""Multimodal column operators (north_star: image/audio/video as opaque
binary columns + typed metadata).

The container has no image/audio codecs, so the decode kernel is a
deterministic fake behind ``decode_image_stub`` (clearly marked; a real
deployment swaps in PIL/ffmpeg inside the same ``mapInPandas`` shape).
Everything AROUND the kernel — schema contract, Arrow batch transfer,
partition-parallel execution, binary payload handling — is real and
tested (tests/test_multimodal.py).

Data model (SURVEY.md §1.1, mirroring the reference's lazy 5-D stacks,
zeiss_job.py:145-153: bytes on storage + typed metadata extracted at
read time):
    payload: binary            -- opaque media bytes
    meta:    struct<mime:string, n_bytes:long>
Decode output adds width/height/n_channels/checksum — at scale each
batch decodes ~arrow-batch-size media items per task, embarrassingly
parallel, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_channels", LongType()),
        StructField("checksum", LongType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata struct —
    the multimodal column contract used by every operator here."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """STUB decode kernel — deterministic fake standing in for a real
    image decoder (PIL/libvips not available in this container).
    Derives plausible dimensions from the byte content so tests can
    assert exact values end-to-end through the Arrow batch path.
    """
    n = len(payload)
    width = 16 + (payload[0] if n else 0) % 240
    height = 16 + (payload[-1] if n else 0) % 240
    channels = 1 + (n % 3)
    checksum = sum(payload[:64]) + n
    return width, height, channels, checksum


def decode_image_stub(media: DataFrame) -> DataFrame:
    """Decode binary payloads via mapInPandas (Arrow-batched).

    Input: (doc_id, payload, meta); output: DECODED_SCHEMA. The pandas
    kernel sees whole batches — the exact shape a real decoder (or a
    GPU preprocessing step) plugs into; per-row Python UDFs are never
    used. The kernel is self-contained (no module globals) so it
    pickles by value — executors don't need this package installed.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _decode(payload: bytes) -> tuple[int, int, int, int]:
            n = len(payload)
            width = 16 + (payload[0] if n else 0) % 240
            height = 16 + (payload[-1] if n else 0) % 240
            channels = 1 + (n % 3)
            checksum = sum(payload[:64]) + n
            return width, height, channels, checksum

        for pdf in batches:
            decoded = [_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["width", "height", "n_channels", "checksum"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "mime", [m["mime"] for m in pdf["meta"]])
            out.insert(2, "n_bytes", [m["n_bytes"] for m in pdf["meta"]])
            yield out

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bucket", LongType()),
        StructField("frac", DoubleType()),
    ]
)


def extract_features_stub(media: DataFrame) -> DataFrame:
    """Feature extraction via mapInPandas + numpy: per payload, the
    16-bucket byte-value histogram as fractions — long form
    ``(doc_id, bucket, frac)``, all FEATURE_DIM buckets per document.

    The kernel is the realistic extractor shape (whole Arrow batches
    into vectorized numpy; a real deployment swaps in a CNN/CLIP
    forward pass over the same batch). Deterministic, so the DuckDB
    oracle reproduces it byte-for-byte from the ASCII payload text.
    Empty payloads drop out (no histogram to normalize).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, buckets, fracs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if b.size == 0:
                    continue
                counts = np.bincount(b >> 4, minlength=16)
                ids.extend([doc_id] * 16)
                buckets.extend(range(16))
                fracs.extend(counts / b.size)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "bucket": pd.Series(buckets, dtype="int64"),
                    "frac": pd.Series(fracs, dtype="float64"),
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_stub(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' via mapInPandas: deterministic stride-resample of each
    payload to exactly ``target_bytes`` (nearest-byte sampling — the
    1-D stand-in for nearest-neighbor image resize; PIL/libvips absent
    here). Exercises the binary-IN/binary-OUT Arrow path the decode and
    feature kernels don't: resized payloads flow back as a binary
    column for downstream operators. Empty payloads drop out.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if b.size == 0:
                    continue
                idx = (np.arange(target_bytes) * b.size) // target_bytes
                ids.append(doc_id)
                payloads.append(b[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                }
            )

    return media.mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over a binary payload: take one byte every
    ``every_n_bytes`` as a stand-in for video frame extraction. Pure
    JVM (no UDF): binary substring + explode — the explode output
    streams into downstream operators without materializing."""
    n_frames = (F.length("payload") / every_n_bytes).cast("long")
    # sequence(0, -1) would yield a DESCENDING [0, -1] (Spark auto-steps),
    # silently inventing frames for payloads shorter than the stride.
    return media.filter(n_frames > 0).select(
        "doc_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "doc_id",
        "frame_idx",
        F.expr(
            f"CAST(conv(hex(substr(payload, frame_idx * {every_n_bytes} + 1, 1)),"
            " 16, 10) AS BIGINT)"
        ).alias("frame_byte"),
    )
