"""Incremental SimHash index: batch equivalence + lifecycle.

The third family on the shared index-lifecycle core — these tests pin
that the config-not-module claim holds end to end: probing a new shard
against a persisted corpus index finds EXACTLY the shard-corpus pairs
the batch chunk-blocked pipeline (simhash_near_pairs) finds over
corpus+shard together, restricted to straddling pairs; appends are
crash-benign under the sigs-first ordering and the dangerous inverse
is detected; compaction drops crash-re-append duplicates without
changing any probe and without an Exchange off the bucketed reads.
(The swap promotion is covered for this family in
tests/test_swap_index.py alongside the other two.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.operators.dedup import (
    simhash,
    simhash_near_pairs,
)
from aind_protein_data_transformation_spark.operators.simhash_index import (
    _chunk_rows,
    append_simhash_shard,
    compact_simhash_index,
    incremental_simhash_pairs,
    verify_simhash_index,
    write_simhash_index,
)

MAX_HAMMING = 3


@pytest.fixture(scope="module")
def split_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs
    # near-dup shard: first word dropped (the registered query's mutant
    # construction) — small hamming against the source document
    shard = docs.filter("doc_id % 10 = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    return corpus, shard


def _batch_cross_pairs(corpus, shard):
    """Batch chunk-blocked pipeline over corpus+shard, restricted to
    directed shard->corpus pairs."""
    sims = simhash(corpus.unionByName(shard))
    pairs = simhash_near_pairs(sims, max_hamming=MAX_HAMMING)
    shard_ids = {r.doc_id for r in shard.select("doc_id").collect()}
    out = {}
    for r in pairs.collect():
        in_a, in_b = r.doc_a in shard_ids, r.doc_b in shard_ids
        if in_a != in_b:  # straddling only
            new_id, index_id = (r.doc_a, r.doc_b) if in_a else (r.doc_b, r.doc_a)
            out[(new_id, index_id)] = r.hamming
    return out


def _probe(spark, shard, name, **kw):
    return {
        (r.new_id, r.index_id): r.hamming
        for r in incremental_simhash_pairs(
            spark, shard, name, max_hamming=MAX_HAMMING, **kw
        ).collect()
    }


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_max_hamming_beyond_pigeonhole_guarantee_raises(spark, split_docs):
    """Round-9 review: hamming > chunks-1 would silently UNDER-RECALL
    (pairs whose flips straddle all four chunks never share a blocking
    key) — both the batch and incremental APIs raise instead."""
    corpus, shard = split_docs
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_pairs(simhash(corpus.limit(10)), max_hamming=4)
    with pytest.raises(ValueError, match="pigeonhole"):
        incremental_simhash_pairs(spark, shard, "t_whatever", max_hamming=4)


def test_incremental_probe_equals_batch_pipeline(spark, split_docs, tmp_path):
    corpus, shard = split_docs
    expected = _batch_cross_pairs(corpus, shard)
    assert expected, "degenerate: no cross pairs on this fixture"
    try:
        write_simhash_index(corpus, "t_shi", path=str(tmp_path / "shi"))
        assert _probe(spark, shard, "t_shi") == expected
        # plan pin for the round-9 fan-out fix: the probe's chunk rows
        # repartition to the session width before the candidate join
        # (AQE coalesces the tiny checkpointed shard to one partition;
        # with the bands table broadcast the collision join would run
        # single-task and drag every collision row through one core —
        # measured 3.3x at the 10x text layout, BENCH.md round 9)
        plan = (
            incremental_simhash_pairs(spark, shard, "t_shi")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "RoundRobinPartitioning" in plan, plan[:2000]
    finally:
        _drop(spark, "t_shi_bands", "t_shi_sigs")


def test_append_crash_states_and_compaction(spark, split_docs, tmp_path):
    corpus, shard = split_docs
    half_corpus = corpus.filter("doc_id % 2 = 0")
    appended = corpus.filter("doc_id % 2 = 1")
    try:
        write_simhash_index(half_corpus, "t_shc", path=str(tmp_path / "shc"))
        before = _probe(spark, shard, "t_shc")
        # crash after the first (sigs) write: benign — probe unchanged,
        # verify counts the orphans instead of raising
        sims = simhash(appended).localCheckpoint()
        from aind_protein_data_transformation_spark.operators.index_lifecycle import (
            table_num_buckets,
        )

        (
            sims.write.mode("append")
            .bucketBy(table_num_buckets(spark, "t_shc_sigs"), "doc_id")
            .saveAsTable("t_shc_sigs")
        )
        assert _probe(spark, shard, "t_shc") == before
        health = verify_simhash_index(spark, "t_shc")
        assert health["orphan_sig_docs"] == appended.count()
        # completing the append == a rebuilt index, and the dangerous
        # inverse (bands without sigs) raises through the shared core
        append_simhash_shard(spark, appended, "t_shc")
        write_simhash_index(corpus, "t_shc_full", path=str(tmp_path / "shcf"))
        full = _probe(spark, shard, "t_shc_full")
        assert _probe(spark, shard, "t_shc") == full
        assert verify_simhash_index(spark, "t_shc")["orphan_sig_docs"] == 0
        extra = spark.createDataFrame(
            [(77_000_001, "only bands no sig")], "doc_id long, text string"
        )
        (
            _chunk_rows(simhash(extra), "doc_id")
            .write.mode("append")
            .bucketBy(table_num_buckets(spark, "t_shc_bands"), "chunk", "val")
            .sortBy("chunk", "val")
            .saveAsTable("t_shc_bands")
        )
        with pytest.raises(ValueError, match="no signature row"):
            verify_simhash_index(spark, "t_shc")
        with pytest.raises(ValueError, match="no signature row"):
            incremental_simhash_pairs(spark, shard, "t_shc", verify=True)
        # heal per the recovery rule, then crash-re-append duplicates
        # and compact them away without changing any probe
        append_simhash_shard(spark, extra, "t_shc")
        append_simhash_shard(spark, appended, "t_shc")  # duplicate rows
        dup_probe = _probe(spark, shard, "t_shc")
        stats = compact_simhash_index(spark, "t_shc")
        assert stats["bands_after"] < stats["bands_before"]
        assert stats["sigs_after"] < stats["sigs_before"]
        assert _probe(spark, shard, "t_shc") == dup_probe
        # zero-shuffle claim: the compaction dedup plans without an
        # Exchange off the bucketed reads (shared-core contract)
        plan = (
            spark.table("t_shc_bands")
            .dropDuplicates(["chunk", "val", "doc_id"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        # conflicting payload (re-signed doc under a reused id) raises
        conflict = spark.createDataFrame(
            [(77_000_001, "different text entirely now")],
            "doc_id long, text string",
        )
        append_simhash_shard(spark, conflict, "t_shc")
        with pytest.raises(ValueError, match="conflicting simhash"):
            compact_simhash_index(spark, "t_shc")
    finally:
        _drop(
            spark,
            "t_shc_bands",
            "t_shc_sigs",
            "t_shc_full_bands",
            "t_shc_full_sigs",
        )
