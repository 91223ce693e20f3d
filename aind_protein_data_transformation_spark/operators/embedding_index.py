"""Incremental SRP-LSH embedding index — the embedding twin of the
bucketed MinHash index lifecycle (operators/dedup.py:497-862): write /
append / probe / verify / compact, for the production shape of
embedding near-dup at corpus scale. New embedding shards arrive
continuously and must be near-dup-checked against an indexed history
WITHOUT re-signing, re-scanning, or re-shuffling that history.

Two plain bucketed parquet tables per index (same trade-offs and the
same non-transactional caveats as the minhash index — an ACID table
format would supply cross-table atomicity):

- ``{name}_bands``: (vec_id, band, band_val) bucketed AND sorted by
  (band, band_val) — a probe's candidate join exchanges only the
  shard's band rows; the index side reads co-located.
- ``{name}_vecs``: (vec_id, en array<double>) bucketed by vec_id —
  UNIT-NORMALIZED vectors, so the probe's verify stage is a plain dot
  product (no norms recomputed per candidate pair).

Signatures default to the Arrow GEMM signer
(:func:`~aind_protein_data_transformation_spark.operators.similarity.srp_band_vals_gemm`):
the round-8 calibration ladder found NO fold-favorable regime for this
family (the fold does O(n_bits x dim) interpreted multiply-adds per
row — kernel 2x at dim-64, ~226x at dim-1024; BENCH.md round 8).
``use_gemm=False`` falls back to the oracle-replayable fold, and the
two signers are agreement-pinned at the band-table level by
tests/test_embedding_index.py.

Crash contract (the VERDICT-r6 ordering lesson, applied unchanged):
appends write the VECS table first, band rows second, so every partial
state is benign — orphan vector rows affect no probe (no band row
references them); the dangerous inverse (band rows whose vec_id has no
vector row, whose candidates the verify join would SILENTLY drop) can
no longer be produced by this module and is detected by
:func:`verify_srp_index`. Append-only over immutable vec_ids: a
changed embedding is a NEW vec_id; duplicate rows from a crash re-run
change no probe result (pairs aggregate per (new_id, index_id)), and
:func:`compact_srp_index` drops them from storage.

No counterpart exists in the reference (its array layer is
conversion-only); the lifecycle mirrors this repo's minhash index so
operators run one playbook for both text and embedding near-dup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import spark_dot_sql
from .similarity import (
    PAIR_COSINE_UDF_MIN_DIM,
    dispatch_by_dim,
    pair_cosine_batch_col,
    srp_band_vals,
    srp_band_vals_gemm,
)

SRP_INDEX_THRESH = 0.9


def _en_expr(vec_col: str) -> str:
    """Unit-normalize ``vec_col`` JVM-side — the SHARED try_divide
    normalize (functions/vector.py): one definition for the signer
    fold and the stored vectors, so they cannot drift apart."""
    from ..functions.vector import spark_try_unit_normalize_sql

    return spark_try_unit_normalize_sql(vec_col)


def _sig_bands(
    vectors: DataFrame,
    vec_id: str,
    vec_col: str,
    n_bits: int,
    n_bands: int,
    use_gemm: bool,
) -> DataFrame:
    """(vec_id, band, band_val) rows for ``vectors`` — the signer's
    packed band values exploded one row per band. Derived straight
    from the raw vectors (both signers normalize internally), so bands
    and the vecs-table lineage share one source frame with NO join."""
    signer = srp_band_vals_gemm if use_gemm else srp_band_vals
    sig = signer(vectors, vec_id, vec_col, n_bits=n_bits, n_bands=n_bands)
    return sig.select(
        vec_id, F.posexplode("band_vals").alias("band", "band_val")
    )


def _stamp_srp_params(spark, name: str, n_bits: int, n_bands: int) -> None:
    """Record the signer geometry on the bands table — it is part of
    the index identity (band_val collisions across different widths
    are meaningless), so appends and probes validate against it."""
    spark.sql(
        f"ALTER TABLE {name}_bands SET TBLPROPERTIES "
        f"('sparkgraft.srp.n_bits' = '{n_bits}', "
        f"'sparkgraft.srp.n_bands' = '{n_bands}')"
    )


def _check_srp_params(spark, name: str, n_bits: int, n_bands: int) -> None:
    """Raise when the caller's signer geometry disagrees with the
    index's stamped one: a mismatched probe emits band rows for the
    wrong band set / bit width, so candidate pairs silently go MISSING
    instead of failing — the same silent-drop class the dimension
    guard closes. Unstamped tables (not built by write_srp_index) pass
    unvalidated."""
    props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}_bands").collect()
    }
    bits = props.get("sparkgraft.srp.n_bits")
    bands = props.get("sparkgraft.srp.n_bands")
    if bits is None or bands is None:
        return
    if (int(bits), int(bands)) != (n_bits, n_bands):
        raise ValueError(
            f"srp index {name!r} was built with n_bits={bits}/"
            f"n_bands={bands} but the caller passed n_bits={n_bits}/"
            f"n_bands={n_bands} — band values across different signer "
            f"geometries never collide meaningfully, so the probe/append "
            f"would silently lose near-dup pairs. Pass the index's own "
            f"geometry (it is stamped in the bands table's properties)."
        )


def _table_dim(spark, name: str) -> int | None:
    first = (
        spark.table(f"{name}_vecs").select(F.size("en").alias("d")).limit(1).collect()
    )
    return first[0]["d"] if first else None


def _check_dim(spark, name: str, vectors: DataFrame, vec_col: str) -> None:
    """Raise on a shard whose dimension disagrees with the index:
    zip_with over mismatched lengths pads with NULL, so a mismatched
    probe would SILENTLY emit no pairs instead of failing."""
    idx_dim = _table_dim(spark, name)
    first = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()
    shard_dim = first[0]["d"] if first else None
    if idx_dim is not None and shard_dim is not None and idx_dim != shard_dim:
        raise ValueError(
            f"srp index {name!r} holds dim-{idx_dim} vectors but the "
            f"shard is dim-{shard_dim} — a mismatched probe/append would "
            f"silently drop every candidate at the verify join "
            f"(embeddings-table fixed-dimension contract)"
        )


def write_srp_index(
    vectors: DataFrame,
    name: str,
    n_buckets: int = 16,
    path: str | None = None,
    n_bits: int = 32,
    n_bands: int = 4,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    use_gemm: bool = True,
) -> None:
    """Index ``vectors`` for incremental near-dup probes: persist the
    band and normalized-vector tables described in the module notes.
    ``n_bits``/``n_bands`` are part of the index identity (band_val
    collisions across different signer geometries are meaningless), so
    they are STAMPED into the bands table's properties and validated
    by every append and probe — a mismatch raises instead of silently
    losing pairs, exactly like the dimension guard."""
    bands = _sig_bands(vectors, vec_id, vec_col, n_bits, n_bands, use_gemm)
    vecs = vectors.select(F.col(vec_id), F.expr(_en_expr(vec_col)).alias("en"))
    # build order: bands -> stamp -> vecs. A fresh build that crashes
    # anywhere before the LAST write leaves the vecs table missing, so
    # every partial state fails LOUDLY (probes can't read {name}_vecs;
    # verify_srp_index raises) — in particular a complete-LOOKING index
    # whose geometry stamp is missing (which would silently bypass
    # _check_srp_params' unstamped pass) cannot be produced by a crash
    # in this function. (Appends order vecs-first for the opposite
    # reason — there the benign partial state is the goal.)
    bw = (
        bands.write.mode("overwrite")
        .bucketBy(n_buckets, "band", "band_val")
        .sortBy("band", "band_val")
    )
    if path:
        bw = bw.option("path", f"{path}/bands")
    bw.saveAsTable(f"{name}_bands")
    _stamp_srp_params(vectors.sparkSession, name, n_bits, n_bands)
    vw = vecs.write.mode("overwrite").bucketBy(n_buckets, vec_id)
    if path:
        vw = vw.option("path", f"{path}/vecs")
    vw.saveAsTable(f"{name}_vecs")


def append_srp_shard(
    spark,
    vectors: DataFrame,
    name: str,
    n_bits: int = 32,
    n_bands: int = 4,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    use_gemm: bool = True,
) -> None:
    """Fold an (already-deduplicated) shard into the persisted index —
    a bucketed APPEND of the shard's own band/vector rows; the
    historical corpus is never read or re-signed. Bucket counts come
    from the existing table metadata (a mismatched spec would poison
    the bucketed join silently), and the shard's dimension is checked
    against the index up front (:func:`_check_dim`).

    Ordering contract (see module notes): vecs FIRST, bands second —
    a crash between the writes leaves orphan vector rows, which no
    probe can reach; re-running the append completes the index and the
    duplicate rows change no probe result."""
    from .dedup import _table_num_buckets

    band_buckets = _table_num_buckets(spark, f"{name}_bands")
    vec_buckets = _table_num_buckets(spark, f"{name}_vecs")
    _check_dim(spark, name, vectors, vec_col)
    _check_srp_params(spark, name, n_bits, n_bands)
    base = vectors.select(vec_id, vec_col).localCheckpoint()
    (
        base.select(F.col(vec_id), F.expr(_en_expr(vec_col)).alias("en"))
        .write.mode("append")
        .bucketBy(vec_buckets, vec_id)
        .saveAsTable(f"{name}_vecs")
    )
    (
        _sig_bands(base, vec_id, vec_col, n_bits, n_bands, use_gemm)
        .write.mode("append")
        .bucketBy(band_buckets, "band", "band_val")
        .sortBy("band", "band_val")
        .saveAsTable(f"{name}_bands")
    )


def verify_srp_index(spark, name: str, vec_id: str = "vec_id") -> dict[str, int]:
    """Consistency audit, the :func:`verify_minhash_index` twin: every
    banded vec_id must hold a vector row, else probes silently drop its
    candidates at the verify join — raises with the recovery rule if
    any do. Orphan VECTOR rows (the benign state the vecs-first
    ordering can leave) are counted, not raised. Cost: two distinct
    aggregates + one anti-join — an offline audit, not a per-probe
    tax."""
    band_ids = spark.table(f"{name}_bands").select(vec_id).distinct()
    vec_ids = spark.table(f"{name}_vecs").select(vec_id).distinct()
    n_band = band_ids.count()
    n_vec = vec_ids.count()
    n_unbacked = band_ids.join(vec_ids, vec_id, "left_anti").count()
    if n_unbacked:
        raise ValueError(
            f"srp index {name!r} is inconsistent: {n_unbacked} of "
            f"{n_band} banded vectors have no vector row — probes are "
            f"silently dropping their candidates. Recover by re-running "
            f"append_srp_shard for the affected shard (its vector rows "
            f"make the orphan band rows valid; duplicate rows change no "
            f"probe result) or rebuilding with write_srp_index."
        )
    n_orphan_vecs = vec_ids.join(band_ids, vec_id, "left_anti").count()
    return {
        "banded_vecs": n_band,
        "stored_vecs": n_vec,
        "orphan_vec_rows": n_orphan_vecs,
    }


def compact_srp_index(
    spark,
    name: str,
    vec_id: str = "vec_id",
    target: str | None = None,
    path: str | None = None,
) -> dict[str, int]:
    """Drop the duplicate rows crash re-appends accumulate — the
    :func:`compact_minhash_index` twin, with the same two modes
    (in-place overwrite for quiesced maintenance — external tables are
    rewritten at their own catalog location so they stay external and
    no stale copy is stranded; ``target=`` for the
    streaming compact-into-fresh-index production shape; a crash mid
    target build leaves a half-built target a re-run refuses to
    overwrite — drop both ``{target}_*`` tables and re-run, the source
    is untouched throughout), the same
    stamped-geometry preservation, and the same
    ZERO-shuffle property: both dedup keys are supersets of their
    table's bucket columns, so Catalyst plans the dropDuplicates
    without an Exchange off the bucketed reads (plan-asserted in
    tests/test_embedding_index.py).

    Contract check first: a vec_id carrying CONFLICTING normalized
    vectors means the append-only/immutable-vec_id contract was
    violated (an embedding re-signed under a reused id) — compaction
    raises rather than silently picking a version."""
    from .dedup import _table_num_buckets

    band_buckets = _table_num_buckets(spark, f"{name}_bands")
    vec_buckets = _table_num_buckets(spark, f"{name}_vecs")
    bands = spark.table(f"{name}_bands")
    vecs = spark.table(f"{name}_vecs")
    n_conflicts = (
        vecs.groupBy(vec_id)
        .agg(F.count_distinct(F.col("en")).alias("n_versions"))
        .filter(F.col("n_versions") > 1)
        .count()
    )
    if n_conflicts:
        raise ValueError(
            f"srp index {name!r} holds conflicting vectors for "
            f"{n_conflicts} vec_ids — the append-only/immutable-vec_id "
            f"contract was violated (an embedding was re-signed under a "
            f"reused id); compaction cannot pick a version. Rebuild with "
            f"write_srp_index or remove the stale shard's rows."
        )
    bands_before = bands.count()
    vecs_before = vecs.count()
    # the stamped signer geometry must survive the rewrite (overwrite
    # recreates the table without its properties)
    src_props = {
        r.key: r.value
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}_bands").collect()
        if r.key in ("sparkgraft.srp.n_bits", "sparkgraft.srp.n_bands")
    }
    comp_bands = bands.dropDuplicates(["band", "band_val", vec_id])
    comp_vecs = vecs.dropDuplicates([vec_id])
    if target is None:
        if path is not None:
            raise ValueError(
                "compact_srp_index: path= is only meaningful with "
                "target= — in-place compaction always rewrites each "
                "table at its own catalog location; rewriting in place "
                "to a DIFFERENT path would strand the stale "
                "pre-compaction files at the old location. Compact "
                "into a target to relocate."
            )
        from .dedup import _table_external_location

        comp_bands = comp_bands.localCheckpoint()
        comp_vecs = comp_vecs.localCheckpoint()
        out = name
        mode = "overwrite"
        # an EXTERNAL source table keeps its own location (else the
        # rewrite silently goes MANAGED and strands the stale external
        # files — same guard as compact_minhash_index)
        vec_path = _table_external_location(spark, f"{name}_vecs")
        band_path = _table_external_location(spark, f"{name}_bands")
    else:
        out = target
        mode = "errorifexists"
        vec_path = f"{path}/vecs" if path else None
        band_path = f"{path}/bands" if path else None
    # same bands -> stamp -> vecs ordering as write_srp_index: a
    # target-mode crash before the LAST write leaves the target's vecs
    # table missing (loud), never a complete-looking unstamped index
    bw = (
        comp_bands.write.mode(mode)
        .bucketBy(band_buckets, "band", "band_val")
        .sortBy("band", "band_val")
    )
    if band_path:
        bw = bw.option("path", band_path)
    bw.saveAsTable(f"{out}_bands")
    if len(src_props) == 2:
        _stamp_srp_params(
            spark,
            out,
            int(src_props["sparkgraft.srp.n_bits"]),
            int(src_props["sparkgraft.srp.n_bands"]),
        )
    vw = comp_vecs.write.mode(mode).bucketBy(vec_buckets, vec_id)
    if vec_path:
        vw = vw.option("path", vec_path)
    vw.saveAsTable(f"{out}_vecs")
    return {
        "bands_before": bands_before,
        "bands_after": spark.table(f"{out}_bands").count(),
        "vecs_before": vecs_before,
        "vecs_after": spark.table(f"{out}_vecs").count(),
    }


def incremental_srp_pairs(
    spark,
    new_vectors: DataFrame,
    name: str,
    threshold: float = SRP_INDEX_THRESH,
    n_bits: int = 32,
    n_bands: int = 4,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    use_gemm: bool = True,
    verify: bool = False,
    verify_batch: bool | None = False,
    pair_min_dim: int = PAIR_COSINE_UDF_MIN_DIM,
) -> DataFrame:
    """Near-dup pairs between ``new_vectors`` and the indexed corpus:
    (new_id, index_id, cosine), exact cosine >= ``threshold`` over the
    SRP band collisions.

    Scale shape: the shard is signed in one map-only pass (GEMM by
    default); its band rows join the bucketed band index (index side
    co-located and pre-sorted — only the shard's rows exchange); the
    DISTINCT candidate pairs then join the shard's normalized vectors
    and the bucketed vecs table for the exact verify. The history is
    never re-scanned. Batch equivalence (the pair set equals what the
    banded batch pipeline finds between the same shard and corpus) is
    pinned by tests/test_embedding_index.py.

    ``verify=True`` runs :func:`verify_srp_index` first — one offline
    audit before probing a possibly-interrupted index. ``verify_batch``
    mirrors ``ivf_topk``: False = JVM dot-product fold (both sides are
    stored/derived unit vectors, so the dot IS the cosine); True = the
    Arrow pair-cosine kernel; None = dispatch on the index dimension
    against ``pair_min_dim``.

    Output aggregates ``max(cosine)`` per (new_id, index_id) — row
    dedup under the append-only contract, and the deterministic upper
    bound under an out-of-band contract violation (the ADVICE-r7
    adjudication, unchanged from the minhash probe)."""
    if verify:
        verify_srp_index(spark, name, vec_id=vec_id)
    _check_dim(spark, name, new_vectors, vec_col)
    _check_srp_params(spark, name, n_bits, n_bands)
    if verify_batch is None:
        verify_batch = (
            dispatch_by_dim(_table_dim(spark, name), pair_min_dim) == "kernel"
        )
    base = new_vectors.select(vec_id, vec_col).localCheckpoint()
    probe = _sig_bands(base, vec_id, vec_col, n_bits, n_bands, use_gemm)
    idx = spark.table(f"{name}_bands")
    cand = (
        probe.join(
            idx,
            (probe["band"] == idx["band"])
            & (probe["band_val"] == idx["band_val"]),
        )
        .select(probe[vec_id].alias("new_id"), idx[vec_id].alias("index_id"))
        .distinct()
    )
    new_en = base.select(
        F.col(vec_id).alias("new_id"), F.expr(_en_expr(vec_col)).alias("en_new")
    )
    idx_en = spark.table(f"{name}_vecs").select(
        F.col(vec_id).alias("index_id"), F.col("en").alias("en_idx")
    )
    paired = cand.join(new_en, "new_id").join(idx_en, "index_id")
    if verify_batch:
        # two-step projection: the UDF lands in its own column FIRST so
        # the NaN->null map cannot double-evaluate it (the round-6
        # when()-guard lesson, same as ivf_topk's verify stage)
        scored = paired.select(
            "new_id",
            "index_id",
            pair_cosine_batch_col()(F.col("en_new"), F.col("en_idx")).alias("_raw"),
        ).select(
            "new_id",
            "index_id",
            F.when(F.isnan("_raw"), F.lit(None))
            .otherwise(F.col("_raw"))
            .alias("cosine"),
        )
    else:
        scored = paired.select(
            "new_id",
            "index_id",
            F.expr(spark_dot_sql("en_new", "en_idx")).alias("cosine"),
        )
    return (
        scored.filter(F.col("cosine") >= threshold)
        .groupBy("new_id", "index_id")
        .agg(F.max("cosine").alias("cosine"))
    )
