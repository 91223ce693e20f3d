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
