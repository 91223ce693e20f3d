"""Multimodal operator kernels end-to-end through the Arrow batch path
(SURVEY.md §2B 'LLM: multimodal'; decode/feature-extract/resize/
frame-sample plumbing with deterministic stub kernels — the codecs
themselves are absent in this container by design)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.operators.multimodal import (
    attach_payload,
    decode_image_stub,
    extract_features_stub,
    fake_decode,
    frame_sample,
    resize_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello multimodal world"),
            (2, "x" * 200),
            (3, "a"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    return attach_payload(docs)


def test_attach_payload_contract(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert bytes(rows[1].payload) == b"hello multimodal world"
    assert rows[1].meta.mime == "application/octet-stream"
    assert rows[1].meta.n_bytes == 22
    assert rows[4].meta.n_bytes == 0


def test_decode_stub_matches_kernel(media):
    """Values through mapInPandas equal the reference kernel applied
    driver-side — the Arrow round trip is lossless."""
    got = {r.doc_id: r for r in decode_image_stub(media).collect()}
    for doc_id, payload in [(1, b"hello multimodal world"), (2, b"x" * 200), (3, b"a"), (4, b"")]:
        w, h, c, ck = fake_decode(payload)
        row = got[doc_id]
        assert (row.width, row.height, row.n_channels, row.checksum) == (w, h, c, ck)
        assert row.n_bytes == len(payload)


def test_extract_features_all_buckets_sum_to_one(media):
    out = extract_features_stub(media).collect()
    by_doc: dict[int, dict[int, float]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.frac
    # empty payload drops out; every survivor has all 16 buckets
    assert set(by_doc) == {1, 2, 3}
    for doc_id, fracs in by_doc.items():
        assert set(fracs) == set(range(16))
        assert abs(sum(fracs.values()) - 1.0) < 1e-12
    # doc 2 is 200 x 'x' (0x78 -> bucket 7): a point mass
    assert by_doc[2][7] == 1.0
    # doc 1 golden via numpy
    b = np.frombuffer(b"hello multimodal world", dtype=np.uint8)
    counts = np.bincount(b >> 4, minlength=16)
    for j in range(16):
        assert by_doc[1][j] == counts[j] / b.size


def test_resize_stub_exact_stride_sample(media):
    got = {r.doc_id: r for r in resize_stub(media, target_bytes=8).collect()}
    assert set(got) == {1, 2, 3}  # empty payload drops out
    for doc_id, payload in [(1, b"hello multimodal world"), (2, b"x" * 200), (3, b"a")]:
        b = np.frombuffer(payload, dtype=np.uint8)
        idx = (np.arange(8) * b.size) // 8
        assert bytes(got[doc_id].payload) == b[idx].tobytes()
        assert got[doc_id].n_bytes == 8
    # resized payloads are a real binary column: chainable into the
    # JVM-side frame sampler
    resized = resize_stub(media, target_bytes=128)
    frames = frame_sample(resized.select("doc_id", "payload"), every_n_bytes=64)
    assert frames.groupBy("doc_id").count().count() == 3


def test_frame_sample_short_payloads_excluded(media):
    out = frame_sample(media, every_n_bytes=64).collect()
    # only doc 2 (200 bytes) has >= 64 bytes -> floor(200/64) = 3 frames
    assert {r.doc_id for r in out} == {2}
    assert sorted(r.frame_idx for r in out) == [0, 1, 2]
    assert all(r.frame_byte == ord("x") for r in out)


def test_feature_extract_batch_shape(spark):
    """The kernel consumes WHOLE Arrow batches (many rows per pandas
    DataFrame), not row-at-a-time — the property that makes the slot a
    real vectorized-extractor seam."""
    docs = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(1000)],
        "doc_id long, text string",
    ).coalesce(1)
    out = extract_features_stub(attach_payload(docs))
    assert out.count() == 16000
    assert out.select("doc_id").distinct().count() == 1000
