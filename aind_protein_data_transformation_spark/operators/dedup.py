"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All are pure DataFrame compositions (no Python UDFs) so they scale with
the cluster and stay inside WholeStageCodegen. Hashes use the portable
md5-based ``hash64`` (functions/text.py) so the DuckDB oracle reproduces
every value bit-for-bit; swap in ``xxhash64`` for production throughput.

Scale design (100 TB corpus):
- exact dedup: one shuffle on the normalized hash; map-side partial agg.
- MinHash: signatures are ONE aggregation pass (NUM_PERM min-columns,
  partial+final) — never a row-per-permutation explosion on the Spark
  side; only LSH band buckets shuffle, and candidate verification
  touches only bucket-collision pairs (the oracle replays the same
  arithmetic row-expanded, which is fine at check scale).
- SimHash: token-bit matrix aggregates map-side; banding by 8-bit
  chunks bounds the pair join (pigeonhole: hamming<=3 over 4 chunks
  guarantees a shared chunk).
- Jaccard: candidate pairs via shared-shingle equi-join (exact for
  J>0), then one count per pair — skew-prone on stopword shingles, so
  hot shingles can be dropped by document frequency before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import hash64, normalize_text, tokens

# MinHash parameters — shared verbatim with the SQL oracle
# (queries/llm_dedup.py interpolates the same constants).
MINHASH_PERMS = 32
LSH_BAND_SIZE = 4
MINHASH_PRIME = 2147483647  # 2^31 - 1; (a*h + b) stays under 2^62


def minhash_coeffs(i: int) -> tuple[int, int]:
    """Deterministic LCG-derived coefficients for permutation ``i``.

    Same closed form on both engines; a is forced nonzero.
    """
    a = (1664525 * (i + 1) + 1013904223) % MINHASH_PRIME
    b = (22695477 * (i + 1) + 7) % MINHASH_PRIME
    return (a or 1, b)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on normalized text: keep the smallest id per group.

    Returns (doc_id, content_hash, group_size, is_kept). One shuffle on
    the 256-bit content hash; survivors are chosen deterministically.
    """
    norm = normalize_text(text_col)
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        docs.select(id_col, F.sha2(norm, 256).alias("content_hash"))
        .withColumn("group_size", F.count("*").over(Window.partitionBy("content_hash")))
        .withColumn("is_kept", F.row_number().over(w) == 1)
    )


def shingle_set(docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word-k-shingle hashes per document: (doc_id, h).

    Plan choices (3-4x, measured):
    - tokens materialize in their own projection first — inlining the
      split+filter expression into each element_at would re-tokenize
      the document once per shingle position;
    - shingles assemble positionally (explode positions, then concat)
      instead of inside a ``transform`` lambda, keeping the hot path in
      whole-stage codegen rather than the interpreted HOF evaluator.

    Distinct runs on the shingle STRING, before hashing: the portable
    md5 hash is the single most expensive expression in the pipeline,
    and deduplicating first cuts its evaluations from one-per-occurrence
    to one-per-distinct-shingle (~6x here — measured 1.28s -> 0.75s for
    the full shingle pass at sf0.1). The exchange carries short strings
    instead of longs (~3x bytes); with a cheap production hash
    (xxhash64) the better order flips back to hash-then-distinct. The
    SQL oracles replay the same order, so the ~2^-61 hash-collision
    knife edge is identical on both engines and every downstream join
    stays numeric.
    """
    # Built as selectExpr strings: the composed-Column form of this plan
    # costs hundreds of py4j round-trips (~0.4s of pure driver-side
    # construction per call at any SF); the SQL-string form builds the
    # IDENTICAL plan in a handful of crossings.
    parts = ", ".join(f"element_at(tk, i + {j})" for j in range(k))
    return (
        docs.selectExpr(
            f"`{id_col}`", f"filter(split(`{text_col}`, '\\\\s+'), t -> t <> '') AS tk"
        )
        .where(f"size(tk) >= {k}")
        .selectExpr(f"`{id_col}`", "tk", f"explode(sequence(1, size(tk) - {k - 1})) AS i")
        .selectExpr(f"`{id_col}`", f"concat_ws(' ', {parts}) AS s")
        .distinct()
        .selectExpr(
            f"`{id_col}`",
            "CAST(CONV(SUBSTRING(MD5(s), 1, 15), 16, 10) AS BIGINT) "
            f"% {MINHASH_PRIME} AS h",
        )
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """MinHash signature as MINHASH_PERMS columns m0..m{n-1}, plus the
    per-document distinct-shingle count ``n``.

    One aggregation pass: each permutation is an independent
    min((a_i*h + b_i) mod P) — partial aggregation combines map-side,
    so the shuffle carries one row per document regardless of corpus
    size. This is the reason signatures are agg columns, not an
    exploded (doc, perm) table. ``n`` rides along as a 33rd aggregate so
    the Jaccard-verify step doesn't need its own pass over the shingle
    relation for set sizes.
    """
    aggs = []
    for i in range(MINHASH_PERMS):
        a, b = minhash_coeffs(i)
        aggs.append(F.expr(f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS m{i}"))
    aggs.append(F.expr("count(*) AS n"))
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """LSH banding -> distinct candidate pairs (doc_a < doc_b).

    Band key is the band's signature values as a numeric tuple —
    documents sharing any band collide. Numeric keys (vs joined
    strings) keep the codegen small and the exchange compact; the
    self-join shuffles on (band, k0..k3), bucket-local, so cost tracks
    collision count, not corpus^2.
    """
    n_bands = MINHASH_PERMS // LSH_BAND_SIZE
    structs = ", ".join(
        "struct({b} AS band, {ks})".format(
            b=b,
            ks=", ".join(
                f"m{b * LSH_BAND_SIZE + j} AS k{j}" for j in range(LSH_BAND_SIZE)
            ),
        )
        for b in range(n_bands)
    )
    banded = signatures.selectExpr(f"`{id_col}`", f"inline(array({structs}))")
    a = banded.alias("a")
    b = banded.alias("b")
    key_eq = " AND ".join(
        ["a.band = b.band", f"a.`{id_col}` < b.`{id_col}`"]
        + [f"a.k{j} = b.k{j}" for j in range(LSH_BAND_SIZE)]
    )
    return (
        a.join(b, F.expr(key_eq))
        .selectExpr(f"a.`{id_col}` AS doc_a", f"b.`{id_col}` AS doc_b")
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame,
    shingles: DataFrame,
    id_col: str = "doc_id",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate pairs via shared-shingle-hash
    counting (the 8-byte hash column replaces the shingle string in
    every join — same result modulo the negligible hash-collision case,
    identical on both engines).

    ``pairs`` is hinted broadcast: LSH candidate pairs are the bucket
    collisions, orders of magnitude smaller than the shingle relation
    (533 pairs vs 273k shingles at sf0.1), so shipping them to every
    executor turns both Jaccard joins into map-side hash probes of the
    big shingle scan — no shuffle of the shingle relation at all. If a
    pathological corpus ever made the candidate set non-broadcastable,
    drop the hint and AQE falls back to a shuffled join; the verify cost
    is then proportional to collisions either way.

    ``sizes`` (doc_id, n distinct shingles) can be supplied when the
    caller already aggregated it (minhash_signatures emits it for free);
    otherwise it costs one more pass over ``shingles``."""
    if sizes is None:
        sizes = shingles.groupBy(id_col).agg(F.expr("count(*) AS n"))
    sa = shingles.selectExpr(f"`{id_col}` AS doc_a", "h")
    sb = shingles.selectExpr(f"`{id_col}` AS doc_b", "h")
    shared = (
        F.broadcast(pairs).join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.expr("count(*) AS shared"))
    )
    na = sizes.selectExpr(f"`{id_col}` AS doc_a", "n AS n_a")
    nb = sizes.selectExpr(f"`{id_col}` AS doc_b", "n AS n_b")
    return (
        shared.join(na, "doc_a")
        .join(nb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(shared AS DOUBLE) / (n_a + n_b - shared) AS jaccard",
        )
    )


SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4  # 8-bit chunks; pigeonhole covers hamming <= 3


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash per document from distinct-token votes.

    The per-bit votes are 32 conditional SUM columns in ONE aggregation
    over the token relation — the same shape as minhash_signatures, and
    for the same reason: the earlier tokens×bits row expansion (explode
    to 32 rows per token, groupBy (doc, bit), then a second groupBy)
    pushed a 32×-inflated relation through the partial aggregate and
    needed two shuffles; as 32 agg columns the relation is never
    inflated, partials combine map-side, and ONE shuffle carries one
    row per document (measured 8.6s → ~1s on the registered query at
    sf0.1 together with the corpus fan-out). The final bigint assembles
    in a projection: bit j is set iff vote_j > 0 — identical values to
    the row-expanded form.
    """
    tok = docs.select(
        id_col, F.explode(F.array_distinct(tokens(text_col))).alias("token")
    ).withColumn("h", hash64("token"))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.expr(f"shiftright(h, {j}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    assemble = " + ".join(
        f"IF(s{j} > 0, CAST({1 << j} AS BIGINT), CAST(0 AS BIGINT))"
        for j in range(SIMHASH_BITS)
    )
    return votes.selectExpr(f"`{id_col}`", f"{assemble} AS simhash")


def simhash_near_pairs(sims: DataFrame, max_hamming: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by hamming distance over 8-bit chunk blocking.

    A pair whose hashes agree on k of the 4 chunks would surface from k
    join buckets; instead of DISTINCT-ing the (up to 4x-duplicated)
    pair stream — a full exchange + hash-dedup over the join output,
    the widest relation in the query — each pair is emitted ONLY from
    its FIRST matching chunk: a join residual checks that every earlier
    chunk differs (cheap bit math on the two hashes already in the join
    row). The output row set is identical by construction and already
    unique, so no dedup stage exists at all (measured 4.9s -> 3.4s on
    the registered query at sf0.1, where hamming-0 mutant pairs match
    all four chunks)."""
    chunked = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), 8 * c).bitwiseAND(255).alias("val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ck"),
    ).select(id_col, "simhash", "ck.chunk", "ck.val")
    a, b = chunked.alias("a"), chunked.alias("b")

    def _chunk(side: str, j: int):
        return F.shiftright(F.col(f"{side}.simhash"), 8 * j).bitwiseAND(255)

    first_match = F.lit(False)
    for c in range(SIMHASH_CHUNKS):
        earlier_differ = F.lit(True)
        for j in range(c):
            earlier_differ = earlier_differ & (_chunk("a", j) != _chunk("b", j))
        first_match = first_match | ((F.col("a.chunk") == c) & earlier_differ)
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & first_match,
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
