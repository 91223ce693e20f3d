"""Dedup-at-ingest: Structured Streaming + the incremental MinHash
index — the composition a 100-TB training-data pipeline actually runs.

Each arriving micro-batch is (1) near-dup-probed against the persisted
corpus index (``incremental_minhash_pairs`` — history never re-scanned,
bucketed band join), (2) deduplicated within itself with the batch LSH
pipeline (the shard is not yet indexed, so batch-internal pairs are the
batch's own business), then (3) folded into the index
(``append_minhash_shard`` — crash-benign sigs-first ordering), so the
NEXT batch probes against everything that has ever arrived.

Claim pinned: after a multi-micro-batch replay, the union of all
detected pairs (cross-history + within-batch) equals EXACTLY what the
full batch pipeline finds over seed∪stream — minus seed-internal pairs,
which dedup-at-ingest deliberately never revisits (the seed was indexed
as-is; re-deduplicating history is a compaction job, not an ingest
job). Same jaccards, exact doubles.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.operators.dedup import (
    append_minhash_shard,
    incremental_minhash_pairs,
    jaccard_for_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_set,
    write_minhash_index,
)
from aind_protein_data_transformation_spark.streaming.events import (
    stream_replay_options,
)

THRESHOLD = 0.4
N_FILES = 3


@pytest.fixture(scope="module")
def seed_and_stream(spark, sf_dir, tmp_path_factory):
    """Seed corpus (2/5 of documents) + a stream directory holding the
    remaining 3/5 as three mtime-ordered part files (one micro-batch
    each under maxFilesPerTrigger=1)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    seed = docs.filter("pmod(hash(doc_id), 5) IN (0, 1)")
    root = tmp_path_factory.mktemp("dedup_ingest")
    stream_dir = os.path.join(str(root), "incoming")
    base_mtime = 1_700_000_000
    for i, bucket in enumerate((2, 3, 4)):
        before = (set(os.listdir(stream_dir))
                  if os.path.isdir(stream_dir) else set())
        (docs.filter(f"pmod(hash(doc_id), 5) = {bucket}")
             .coalesce(1).write.mode("append").parquet(stream_dir))
        for name in set(os.listdir(stream_dir)) - before:
            if name.endswith(".parquet"):
                os.utime(os.path.join(stream_dir, name),
                         (base_mtime + i, base_mtime + i))
    yield seed, stream_dir
    shutil.rmtree(str(root), ignore_errors=True)


def _batch_pairs(docs):
    """Full batch pipeline: verified unordered pairs with jaccards."""
    sh = shingle_set(docs)
    verified = jaccard_for_pairs(
        lsh_candidate_pairs(minhash_signatures(sh)), sh
    ).filter(f"jaccard >= {THRESHOLD}")
    return {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)): r.jaccard
        for r in verified.collect()
    }


def test_stream_dedup_against_growing_index(spark, seed_and_stream,
                                            tmp_path):
    seed, stream_dir = seed_and_stream
    name = "t_stream_ingest_idx"
    write_minhash_index(seed, name, path=str(tmp_path / "idx"))
    state = {"pairs": {}, "batches": 0}

    def land(batch_df, batch_id):
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return
        state["batches"] += 1
        # foreachBatch executes on a CLONED session; the appends below
        # invalidate the CLONE's relation cache, not this session's —
        # refresh before probing or the probe replays a stale file
        # listing of the bands/sigs tables (documented footgun in
        # append_minhash_shard)
        spark.catalog.refreshTable(f"{name}_bands")
        spark.catalog.refreshTable(f"{name}_sigs")
        # (1) probe against everything that has arrived before
        for r in incremental_minhash_pairs(
            spark, batch, name, threshold=THRESHOLD
        ).collect():
            key = (min(r.new_id, r.index_id), max(r.new_id, r.index_id))
            state["pairs"][key] = r.jaccard
        # (2) within-batch dedup (the shard is not in the index yet)
        state["pairs"].update(_batch_pairs(batch))
        # (3) fold the batch into the index for later batches
        append_minhash_shard(spark, batch, name)

    schema = spark.read.parquet(stream_dir).schema
    try:
        with stream_replay_options(maxFilesPerTrigger=1):
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(stream_dir)
                .writeStream.foreachBatch(land)
                .trigger(availableNow=True)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start()
            )
            q.awaitTermination()

        assert state["batches"] >= N_FILES  # real multi-batch replay

        stream_docs = spark.read.parquet(stream_dir).select("doc_id", "text")
        want = _batch_pairs(seed.unionByName(stream_docs))
        seed_ids = {r.doc_id for r in seed.select("doc_id").collect()}
        # ingest never revisits seed-internal pairs
        want = {k: j for k, j in want.items()
                if not (k[0] in seed_ids and k[1] in seed_ids)}

        assert set(state["pairs"]) == set(want)
        assert want, "degenerate: no near-dup pairs straddle the replay"
        for key, j in want.items():
            assert state["pairs"][key] == pytest.approx(j, abs=1e-9)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {name}_sigs")
