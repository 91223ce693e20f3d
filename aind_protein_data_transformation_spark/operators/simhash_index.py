"""Incremental SimHash index — the THIRD bucketed two-table index
family, and the payoff of the shared lifecycle core (VERDICT r8 #5):
verify / compact / swap are one :class:`~.index_lifecycle.IndexSpec`
config plus thin wrappers; only the family-specific signing (the
32-bit SimHash vote aggregate, operators/dedup.py:401) and the probe
join live here.

Two plain bucketed parquet tables per index, same trade-offs and
non-transactional caveats as the minhash/SRP twins:

- ``{name}_bands``: (doc_id, chunk, val) — each document's four 8-bit
  hash chunks, bucketed AND sorted by (chunk, val): the pigeonhole
  blocking key (hamming <= 3 over 32 bits guarantees at least one
  equal chunk), so a probe's candidate join exchanges only the shard's
  chunk rows while the corpus side reads co-located and pre-sorted.
- ``{name}_sigs``: (doc_id, simhash) bucketed by doc_id — the full
  hash the verify stage recomputes hamming distance from (bit_count of
  XOR; no text is re-read).

Crash contract, unchanged from the minhash twin: appends write sigs
FIRST, bands second, so every partial state is benign (orphan sig rows
affect no probe); the dangerous inverse is detected by
:func:`verify_simhash_index`. Append-only over immutable doc_ids —
duplicate rows from a crash re-run change no probe result (pairs
aggregate per (new_id, index_id)) and are dropped from storage by
:func:`compact_simhash_index`; promote a compact-into-target build
with :func:`swap_simhash_index` (metadata-only renames, no overwrite
window — see index_lifecycle's runbook).

Scale envelope (measured round 9, BENCH.md): chunk blocking over
SIMHASH_CHUNKS fixed 8-bit values yields ~n/256 candidates per chunk
per probe doc — linear in the corpus, unlike minhash's banded keys.
At corpus sizes where the candidate join dominates probes, widen the
chunks (e.g. 16-bit chunks over a 64-bit hash: pigeonhole still covers
hamming <= chunks-1, buckets shrink 256x) — a constants change here,
not a structural one. The probe fans its chunk rows to the session
width before the candidate join for exactly this reason.

The first-match-chunk trick the BATCH pair join uses
(simhash_near_pairs — emit each pair only from its first agreeing
chunk, skipping the DISTINCT) does not carry over: against an index
holding duplicate rows the join output is not unique by construction,
so the probe uses the same DISTINCT-candidates-then-verify shape as
the minhash/SRP probes.

No counterpart in the reference (conversion-only array layer); part of
the SURVEY.md §2 training-pipeline addendum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import SIMHASH_CHUNKS, simhash
from .index_lifecycle import (
    IndexSpec,
    compact_index,
    swap_index,
    table_num_buckets,
    verify_index,
)

SIMHASH_MAX_HAMMING = 3

SIMHASH_SPEC = IndexSpec(
    kind="simhash",
    sidecar_suffix="sigs",
    band_keys=("chunk", "val"),
    payload_cols=("simhash",),
    payload_noun="simhash values",
    sidecar_noun="signature row",
    entity="document",
    banded_key="banded_docs",
    stored_key="signed_docs",
    orphan_key="orphan_sig_docs",
    append_fn="append_simhash_shard",
    write_fn="write_simhash_index",
    compact_fn="compact_simhash_index",
)


def _chunk_rows(sims: DataFrame, id_col: str) -> DataFrame:
    """(id, chunk, val) blocking rows — each document's 8-bit chunks."""
    return sims.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), 8 * c)
                        .bitwiseAND(255)
                        .alias("val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "ck.chunk", "ck.val")


def write_simhash_index(
    docs: DataFrame,
    name: str,
    n_buckets: int = 16,
    path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Index ``docs`` for incremental hamming-distance probes: one
    SimHash vote aggregate over the corpus, persisted as the chunk
    blocking table + full-hash sidecar described in the module notes.
    Build order bands -> sigs: a fresh build that crashes before the
    LAST write leaves the sigs table missing, so every partial state
    fails loudly (probes cannot read ``{name}_sigs``)."""
    # persist: the vote aggregate (the expensive pass) feeds BOTH
    # writes; without it each saveAsTable recomputes it from the raw
    # text (round-9 review). Bounded lifetime: released before return.
    sims = simhash(docs, text_col=text_col, id_col=id_col).persist()
    try:
        bw = (
            _chunk_rows(sims, id_col)
            .write.mode("overwrite")
            .bucketBy(n_buckets, "chunk", "val")
            .sortBy("chunk", "val")
        )
        if path:
            bw = bw.option("path", f"{path}/bands")
        bw.saveAsTable(f"{name}_bands")
        sw = sims.write.mode("overwrite").bucketBy(n_buckets, id_col)
        if path:
            sw = sw.option("path", f"{path}/sigs")
        sw.saveAsTable(f"{name}_sigs")
    finally:
        sims.unpersist()


def append_simhash_shard(
    spark,
    docs: DataFrame,
    name: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold an (already-deduplicated) shard into the persisted index —
    a bucketed APPEND of the shard's own chunk/sig rows; the history is
    never read or re-signed. Sigs FIRST, bands second (the minhash
    ordering contract): a crash between the writes leaves orphan sig
    rows, which no probe can reach; re-running completes the index and
    duplicate rows change no probe result."""
    band_buckets = table_num_buckets(spark, f"{name}_bands")
    sig_buckets = table_num_buckets(spark, f"{name}_sigs")
    sims = simhash(docs, text_col=text_col, id_col=id_col).localCheckpoint()
    (
        sims.write.mode("append")
        .bucketBy(sig_buckets, id_col)
        .saveAsTable(f"{name}_sigs")
    )
    (
        _chunk_rows(sims, id_col)
        .write.mode("append")
        .bucketBy(band_buckets, "chunk", "val")
        .sortBy("chunk", "val")
        .saveAsTable(f"{name}_bands")
    )


def verify_simhash_index(spark, name: str, id_col: str = "doc_id") -> dict[str, int]:
    """Consistency audit — :func:`index_lifecycle.verify_index` with
    :data:`SIMHASH_SPEC`: banded docs without a signature row raise
    (probes would silently drop their candidates at the hamming
    verify); orphan sig rows (the benign sigs-first partial state) are
    counted, not raised."""
    return verify_index(spark, name, SIMHASH_SPEC, id_col)


def compact_simhash_index(
    spark,
    name: str,
    id_col: str = "doc_id",
    target: str | None = None,
    path: str | None = None,
) -> dict[str, int]:
    """Drop duplicate rows from both tables — shared
    :func:`index_lifecycle.compact_index` (zero-shuffle off the
    bucketed reads, conflict check on the simhash payload, in-place or
    compact-into-target modes; promote a verified target with
    :func:`swap_simhash_index`)."""
    return compact_index(spark, name, SIMHASH_SPEC, id_col, target=target, path=path)


def swap_simhash_index(spark, name: str, target: str) -> dict:
    """Promote a verified compact-into-``target`` build via
    metadata-only rename pairs — :func:`index_lifecycle.swap_index`
    with :data:`SIMHASH_SPEC`; verifies the target first."""
    return swap_index(
        spark,
        name,
        target,
        SIMHASH_SPEC,
        verify_fn=lambda s, n: verify_simhash_index(s, n),
    )


def incremental_simhash_pairs(
    spark,
    new_docs: DataFrame,
    name: str,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = False,
) -> DataFrame:
    """Near-dup pairs between ``new_docs`` and the indexed corpus:
    (new_id, index_id, hamming), hamming <= ``max_hamming`` over the
    chunk-collision candidates.

    Scale shape, identical to the minhash/SRP probes: the shard is
    signed in one vote-aggregate pass (localCheckpoint — it feeds the
    blocking join AND the verify); its chunk rows join the bucketed
    bands table (index side co-located and pre-sorted, only the
    shard's rows exchange); the DISTINCT candidate pairs then join the
    sig sidecar for the exact bit_count(XOR) verify. History is never
    re-scanned. Batch equivalence against simhash_near_pairs over
    corpus+shard is pinned by tests/test_simhash_index.py.

    ``verify=True`` runs :func:`verify_simhash_index` first — the one
    offline audit before probing a possibly-interrupted index.

    Output aggregates ``min(hamming)`` per (new_id, index_id): pure
    row dedup under the append-only contract (duplicates carry the
    identical hash, hence the identical hamming), and the
    deterministic LOWER bound under an out-of-band contract violation
    — the same adjudication as the other two probes' max(score), with
    the inequality flipped because smaller hamming = nearer.

    ``max_hamming`` is capped at SIMHASH_CHUNKS - 1, like the batch
    twin: beyond the pigeonhole guarantee the chunk blocking silently
    under-recalls, so the API raises instead."""
    if max_hamming > SIMHASH_CHUNKS - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the chunk-blocking "
            f"recall guarantee (pigeonhole over {SIMHASH_CHUNKS} chunks "
            f"covers hamming <= {SIMHASH_CHUNKS - 1}); pairs beyond it "
            f"would be silently MISSING from the probe, not slower to "
            f"find."
        )
    if verify:
        verify_simhash_index(spark, name, id_col=id_col)
    sims = simhash(new_docs, text_col=text_col, id_col=id_col).localCheckpoint()
    # Fan the shard's chunk rows out to the session's width BEFORE the
    # candidate join (measured round 9 at the 10x text layout): AQE
    # coalesces the tiny checkpointed shard to ONE partition, and when
    # the bands table fits a broadcast the collision join runs on the
    # STREAM side's partitioning — one task dragging every collision
    # row (7.9M for a 250-doc shard there: 8-bit chunk buckets hold
    # ~n/256 docs each, so candidates grow with the corpus). The
    # 1000-row exchange is free; the join's output work spreads across
    # the cluster. At index sizes past the broadcast threshold the
    # bucketed SMJ repartitions the probe side anyway — this makes the
    # small/medium regime behave the same way.
    from ..plans.scale import fanout_width

    probe = _chunk_rows(sims, id_col).repartition(fanout_width(spark))
    idx = spark.table(f"{name}_bands")
    cand = (
        probe.join(
            idx,
            (probe["chunk"] == idx["chunk"]) & (probe["val"] == idx["val"]),
        )
        .select(probe[id_col].alias("new_id"), idx[id_col].alias("index_id"))
        .distinct()
    )
    new_sig = sims.select(
        F.col(id_col).alias("new_id"), F.col("simhash").alias("sh_new")
    )
    idx_sig = spark.table(f"{name}_sigs").select(
        F.col(id_col).alias("index_id"), F.col("simhash").alias("sh_idx")
    )
    return (
        cand.join(new_sig, "new_id")
        .join(idx_sig, "index_id")
        .select(
            "new_id",
            "index_id",
            F.bit_count(
                F.col("sh_new").bitwiseXOR(F.col("sh_idx"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("new_id", "index_id")
        .agg(F.min("hamming").alias("hamming"))
    )
