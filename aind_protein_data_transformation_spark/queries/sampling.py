"""Deterministic corpus sampling / sharding (training-data pipeline ops).

A 100-TB training pipeline needs reproducible subsetting long before it
needs randomness: the same document must land in the same split, sample,
or shard on every run, on any cluster size, with no RNG state to ship.
Everything here keys on the portable 60-bit ``hash64`` (functions/
text.py) of a stable document key, so membership is a pure projection —
no shuffle is introduced by the *decision*, only by the reporting
aggregation. DuckDB reproduces every hash bit-for-bit, which is what
makes these queries oracle-checkable.

Reference scope note: the reference pipeline (zeiss_job.py) processes
whole stacks and has no corpus-sampling stage; these operators extend
the engine for LLM-corpus work per SURVEY.md §2's training-pipeline
addendum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import SQL_HASH64, hash64
from .registry import query

#: Per-language keep rates in basis points (downsample the dominant
#: language, keep the tail) — the classic corpus-rebalancing move.
STRATIFIED_BPS: dict[str, int] = {
    "en": 3000,
    "de": 5000,
    "es": 6000,
    "fr": 7000,
    "zh": 8000,
}

_SPLIT_HASH = SQL_HASH64.format(expr="CAST(doc_id AS VARCHAR)")
_STRAT_HASH = SQL_HASH64.format(expr="CAST(d.doc_id AS VARCHAR) || ':' || d.lang")


def _split_bucket() -> F.Column:
    return F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(100))


@query(
    "sample_hash_split",
    oracle=f"""
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT lang, n_chars,
               CASE WHEN {_SPLIT_HASH} % 100 < 80 THEN 'train'
                    WHEN {_SPLIT_HASH} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split: bucket =
    hash64(doc_id) mod 100. The split decision is a stateless
    projection evaluated inside the scan stage — at 100 TB the split
    costs nothing beyond the read, parallelizes perfectly, and is
    stable under repartitioning, retries, and incremental reruns
    (a new document never moves existing ones between splits, unlike
    row_number- or rand()-based splits). The one shuffle here is the
    reporting groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _split_bucket()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@query(
    "sample_stratified",
    oracle=f"""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
    FROM documents d
    JOIN (VALUES {', '.join(f"('{lang}', {bps})" for lang, bps in STRATIFIED_BPS.items())})
         AS r(lang, bps) ON r.lang = d.lang
    WHERE {_STRAT_HASH} % 10000 < r.bps
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli-by-hash sampling with per-language rates
    (downsample English, keep low-resource tails): keep iff
    hash64(doc_id:lang) mod 10000 < rate_bps(lang). The rate table is
    a broadcast dimension; the keep decision again evaluates in the
    scan stage, so sampling 1% of 100 TB reads 100 TB once and writes
    1 TB with zero extra shuffles. Hash-keyed membership makes the
    sample a deterministic function of the corpus — reruns and
    downstream joins see the same subset."""
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [(lang, bps) for lang, bps in STRATIFIED_BPS.items()], "r_lang string, bps int"
    )
    keep_key = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))),
        F.lit(10000),
    )
    return (
        docs.join(F.broadcast(rates), docs.lang == rates.r_lang)
        .filter(keep_key < F.col("bps"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("lang")
    )


@query(
    "shard_assign_balanced",
    oracle=f"""
    SELECT {_SPLIT_HASH} % 16 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY shard
    ORDER BY shard
    """,
)
def shard_assign_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-balanced shard assignment (the write-side twin of the
    split): shard = hash64(doc_id) mod 16. This is exactly the key a
    partitioned writer would `repartition(16, shard)` on —
    hash-uniform, so shard sizes stay within sampling noise of each
    other regardless of doc_id distribution (contrast range-sharding
    on doc_id, which inherits whatever skew ingestion had). The
    aggregate reports per-shard row/char totals — the balance check
    itself."""
    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(hash64(F.col("doc_id").cast("string")), F.lit(16))
    return (
        docs.select(shard.alias("shard"), "n_chars", "doc_id")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


#: Target output shares for the mixing query — only listed sources
#: participate; weights sum to 1.
MIX_TARGETS: dict[str, float] = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}

_MIX_HASH = SQL_HASH64.format(expr="CAST(d.doc_id AS VARCHAR) || ':' || d.source")


@query(
    "sample_mix_to_target",
    oracle=f"""
    WITH t(source, w) AS (VALUES
        {', '.join(f"('{s}', {w})" for s, w in sorted(MIX_TARGETS.items()))}),
    c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY source
    ),
    j AS (
        SELECT c.source, c.cnt, CAST(t.w AS DOUBLE) AS w
        FROM c JOIN t ON t.source = c.source
    ),
    m AS (SELECT MIN(cnt / w) AS m FROM j),
    r AS (
        SELECT source, LEAST(10000,
               CAST(FLOOR(w * m.m / cnt * 10000) AS BIGINT)) AS bps
        FROM j CROSS JOIN m
    )
    SELECT d.source, r.bps AS rate_bps, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents d JOIN r ON r.source = d.source
    WHERE {_MIX_HASH} % 10000 < r.bps
    GROUP BY d.source, r.bps
    ORDER BY d.source
    """,
)
def sample_mix_to_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to TARGET domain proportions — the data-dependent
    sampler: per-source keep rates are COMPUTED from the corpus (the
    largest feasible output respecting every target share is
    min(cnt_s / w_s); rate_s = w_s * m / cnt_s), then membership is the
    usual deterministic hash-Bernoulli. Two passes: a counts aggregate
    (tiny, broadcast back) and the filtered scan — at 100 TB the
    decision still evaluates inside the scan stage, and the rate table
    is O(domains). Every arithmetic step is replayed identically by the
    oracle, so the computed basis-point rates match exactly."""
    docs = load_table(spark, sf_dir, "documents")
    t = spark.createDataFrame(
        sorted(MIX_TARGETS.items()), "t_source string, w double"
    )
    counts = docs.groupBy("source").agg(F.expr("CAST(COUNT(*) AS BIGINT) AS cnt"))
    j = counts.join(F.broadcast(t), counts.source == t.t_source).select(
        "source", "cnt", "w"
    )
    m = j.agg(F.expr("MIN(cnt / w) AS m"))
    rates = (
        j.join(F.broadcast(m))
        .selectExpr(
            "source AS r_source",
            "LEAST(10000, CAST(FLOOR(w * m / cnt * 10000) AS BIGINT)) AS bps",
        )
    )
    keep = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))),
        F.lit(10000),
    )
    return (
        docs.join(F.broadcast(rates), docs.source == F.col("r_source"))
        .filter(keep < F.col("bps"))
        .groupBy("source", F.col("bps").alias("rate_bps"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT) AS n_kept"))
        .orderBy("source")
    )


_TEMP_HASH = SQL_HASH64.format(expr="CAST(d.doc_id AS VARCHAR) || '#' || d.lang")


@query(
    "sample_temperature_alpha",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY lang
    ),
    w AS (SELECT lang, cnt, sqrt(CAST(cnt AS DOUBLE)) AS w FROM c),
    m AS (SELECT MIN(cnt / w) AS m FROM w),
    r AS (
        SELECT lang, cnt, LEAST(10000,
               CAST(FLOOR(w.w * m.m / cnt * 10000) AS BIGINT)) AS bps
        FROM w CROSS JOIN m
    )
    SELECT d.lang, r.cnt AS n_docs, r.bps AS rate_bps,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents d JOIN r ON r.lang = d.lang
    WHERE {_TEMP_HASH} % 10000 < r.bps
    GROUP BY d.lang, r.cnt, r.bps
    ORDER BY d.lang
    """,
)
def sample_temperature_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling at alpha=0.5 — the multilingual-LM
    rebalancing scheme (sample languages proportional to p^alpha, so
    dominant languages shrink and tails survive; alpha=0.5 is the
    square-root smoothing case). Normalization cancels, so the weight
    is simply sqrt(cnt); the largest feasible output keeps the SMALLEST
    language whole (its rate is exactly 1) and downsamples the rest
    toward sqrt proportions: rate_l = sqrt(cnt_l) * min_k(sqrt(cnt_k))
    / cnt_l.

    Same two-pass scale shape as sample_mix_to_target: a tiny per-lang
    counts aggregate broadcast back, then the deterministic
    hash-Bernoulli keep decision evaluated inside the scan stage.
    alpha=0.5 is deliberate for the oracle: sqrt, *, / are all
    IEEE-754 correctly-rounded in both engines, so the computed
    basis-point rates are bit-identical (a pow()-based alpha would
    differ in the last ulp between libm implementations)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.expr("CAST(COUNT(*) AS BIGINT) AS cnt"))
    w = counts.selectExpr("lang", "cnt", "sqrt(CAST(cnt AS DOUBLE)) AS w")
    m = w.agg(F.expr("MIN(cnt / w) AS m"))
    rates = w.join(F.broadcast(m)).selectExpr(
        "lang AS r_lang",
        "cnt",
        "LEAST(10000, CAST(FLOOR(w * m / cnt * 10000) AS BIGINT)) AS bps",
    )
    keep = F.pmod(
        hash64(F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("lang"))),
        F.lit(10000),
    )
    return (
        docs.join(F.broadcast(rates), docs.lang == F.col("r_lang"))
        .filter(keep < F.col("bps"))
        .groupBy("lang", F.col("cnt").alias("n_docs"), F.col("bps").alias("rate_bps"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT) AS n_kept"))
        .orderBy("lang")
    )


# --------------------------------------------------- weighted reservoir

#: 2^60 — hash64's range; u = (h + 1) / 2^60 lies in (0, 1].
_H_RANGE = 1 << 60


@query(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               ln(CAST(({_SPLIT_HASH}) + 1 AS DOUBLE) / {_H_RANGE}.0)
                   / CAST(n_chars AS DOUBLE) AS k
        FROM documents
    ),
    ranked AS (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY k DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT lang, doc_id, n_chars, rk
    FROM ranked WHERE rk <= 5
    ORDER BY lang, rk
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis-Spirakis
    A-ES): keep the top-5 documents per language with probability
    proportional to weight (here n_chars — 'sample proportional to
    content'). Each doc's uniform u = (hash64(doc_id)+1)/2^60 is
    hash-derived, so the 'random' sample is reproducible on any cluster
    with no RNG state; the A-ES key ln(u)/w gives exactly the weighted
    inclusion probabilities.

    Scale shape: the key is a stateless projection in the scan; top-k
    per group is a rank window that WindowGroupLimit trims to k rows
    per partition BEFORE the shuffle — a 100-TB corpus ships only
    k x groups rows. This is the streaming-compatible way to subsample
    'the best k per domain' without a global sort.

    Cross-engine note: ranking compares ln() outputs, which the two
    engines may round differently in the last ulp — a flip needs two
    keys within ~1e-16 relative, vanishing under 60-bit hashing (same
    determinism class as the cosine-fold rankings)."""
    docs = load_table(spark, sf_dir, "documents")
    u = (hash64(F.col("doc_id").cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(_H_RANGE))
    key = F.ln(u) / F.col("n_chars").cast("double")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 5)
        .orderBy("lang", "rk")
    )
