#!/usr/bin/env python
"""Same-session A/B experiments for dedup_minhash_lsh (VERDICT r3 ask #7).

VM timing noise is +-50% across sessions, so every variant here runs
best-of-N inside ONE session, interleaved round-robin so slow drift
hits all variants equally. Variants (same final result, asserted):

  current        registered query (distinct-before-hash shingles,
                 4-key band join)
  hash_first     md5 every shingle occurrence, distinct on the numeric
                 (doc_id, h) instead of the string (doc_id, shingle)
  packed_bands   band self-join key packed bijectively: p01 = k0*P+k1,
                 p23 = k2*P+k3 (2 bigints instead of 4; identical
                 collision set since the packing is injective)
  packed_hash    both of the above

Usage: python scripts/exp_minhash.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from aind_protein_data_transformation_spark.operators.dedup import (  # noqa: E402
    LSH_BAND_SIZE,
    MINHASH_PERMS,
    MINHASH_PRIME,
    minhash_signatures,
)
from aind_protein_data_transformation_spark.plans.scale import sorted_small  # noqa: E402
from aind_protein_data_transformation_spark.queries.llm_dedup import (  # noqa: E402
    _corpus_near,
    dedup_minhash_lsh,
)
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402

N_BANDS = MINHASH_PERMS // LSH_BAND_SIZE


def shingles_hash_first(corpus: DataFrame, k: int = 3) -> DataFrame:
    parts = ", ".join(f"element_at(tk, i + {j})" for j in range(k))
    return (
        corpus.selectExpr(
            "doc_id", "filter(split(text, '\\\\s+'), t -> t <> '') AS tk"
        )
        .where(f"size(tk) >= {k}")
        .selectExpr("doc_id", "tk", f"explode(sequence(1, size(tk) - {k - 1})) AS i")
        .selectExpr(
            "doc_id",
            f"CAST(CONV(SUBSTRING(MD5(concat_ws(' ', {parts})), 1, 15), 16, 10) "
            f"AS BIGINT) % {MINHASH_PRIME} AS h",
        )
        .distinct()
    )


_PACKED_STRUCTS = ", ".join(
    "struct({b} AS band, "
    "m{i0} * CAST({p} AS BIGINT) + m{i1} AS p01, "
    "m{i2} * CAST({p} AS BIGINT) + m{i3} AS p23)".format(
        b=b,
        p=MINHASH_PRIME,
        i0=b * LSH_BAND_SIZE,
        i1=b * LSH_BAND_SIZE + 1,
        i2=b * LSH_BAND_SIZE + 2,
        i3=b * LSH_BAND_SIZE + 3,
    )
    for b in range(N_BANDS)
)

_UNPACKED_STRUCTS = ", ".join(
    "struct({b} AS band, {ks})".format(
        b=b,
        ks=", ".join(
            f"m{b * LSH_BAND_SIZE + j} AS k{j}" for j in range(LSH_BAND_SIZE)
        ),
    )
    for b in range(N_BANDS)
)

#: the pre-round-4 registered verify: exploded-join Jaccard, 4 raw band keys
_UNPACKED_VERIFY_SQL = f"""
    WITH banded AS (
        SELECT doc_id, inline(array({_UNPACKED_STRUCTS})) FROM _mh_sig
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND {" AND ".join(f"a.k{j} = b.k{j}" for j in range(LSH_BAND_SIZE))}
         AND a.doc_id < b.doc_id
    ),
    shared AS (
        SELECT /*+ BROADCAST(p) */ p.doc_a, p.doc_b, COUNT(*) AS shared
        FROM pairs p
        JOIN _mh_shingles sa ON sa.doc_id = p.doc_a
        JOIN _mh_shingles sb ON sb.doc_id = p.doc_b AND sb.h = sa.h
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared AS DOUBLE) / (na.n + nb.n - s.shared) AS jaccard
    FROM shared s
    JOIN _mh_sig na ON na.doc_id = s.doc_a
    JOIN _mh_sig nb ON nb.doc_id = s.doc_b
    WHERE CAST(s.shared AS DOUBLE) / (na.n + nb.n - s.shared) >= 0.4
"""

_PACKED_VERIFY_SQL = f"""
    WITH banded AS (
        SELECT doc_id, inline(array({_PACKED_STRUCTS})) FROM _mh_sig
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.p01 = b.p01 AND a.p23 = b.p23
         AND a.doc_id < b.doc_id
    ),
    shared AS (
        SELECT /*+ BROADCAST(p) */ p.doc_a, p.doc_b, COUNT(*) AS shared
        FROM pairs p
        JOIN _mh_shingles sa ON sa.doc_id = p.doc_a
        JOIN _mh_shingles sb ON sb.doc_id = p.doc_b AND sb.h = sa.h
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT s.doc_a, s.doc_b,
           CAST(s.shared AS DOUBLE) / (na.n + nb.n - s.shared) AS jaccard
    FROM shared s
    JOIN _mh_sig na ON na.doc_id = s.doc_a
    JOIN _mh_sig nb ON nb.doc_id = s.doc_b
    WHERE CAST(s.shared AS DOUBLE) / (na.n + nb.n - s.shared) >= 0.4
"""


def _variant(spark: SparkSession, sf_dir: str, hash_first: bool, packed: bool):
    from aind_protein_data_transformation_spark.operators.dedup import shingle_set

    # Both A/B legs use the script's own exploded-join verify
    # (_PACKED_VERIFY_SQL / _UNPACKED_VERIFY_SQL): the registered
    # query's _MH_VERIFY_SQL switched to array_intersect over an ``hs``
    # column that minhash_signatures doesn't emit, so the operator
    # composition exercises the exploded fallback path here.
    corpus = _corpus_near(spark, sf_dir)
    sh = (shingles_hash_first(corpus) if hash_first else shingle_set(corpus, k=3)).persist()
    sh.createOrReplaceTempView("_mh_shingles")
    minhash_signatures(sh).persist().createOrReplaceTempView("_mh_sig")
    sql = _PACKED_VERIFY_SQL if packed else _UNPACKED_VERIFY_SQL
    return spark.sql(sql).transform(lambda d: sorted_small(d, "doc_a", "doc_b"))


def _mapside_docs_sql() -> str:
    """Doc-level relation with the ENTIRE signature computed map-side:
    per-doc shingle array -> array_distinct (replaces the string-shuffle
    DISTINCT) -> md5 hash array -> 32 array_min transforms. Zero
    exchanges; one scan of documents. Same arithmetic as the current
    plan (distinct on the STRING then hash, so duplicate h values from
    md5 collisions survive in hs exactly as they do in the exploded
    relation)."""
    from aind_protein_data_transformation_spark.operators.dedup import (
        minhash_coeffs,
    )

    p = MINHASH_PRIME
    mins = ", ".join(
        f"array_min(transform(hs, h -> ({a} * h + {b}) % {p})) AS m{i}"
        for i, (a, b) in ((i, minhash_coeffs(i)) for i in range(MINHASH_PERMS))
    )
    return f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               regexp_replace(text, '^\\\\S+\\\\s+', '') AS text
        FROM documents WHERE doc_id % 20 = 0
    ),
    toks AS (
        SELECT doc_id, filter(split(text, '\\\\s+'), t -> t <> '') AS tk
        FROM corpus
    ),
    hashed AS (
        SELECT doc_id,
               transform(
                   array_distinct(transform(sequence(1, size(tk) - 2),
                       i -> concat_ws(' ', element_at(tk, i),
                                      element_at(tk, i + 1),
                                      element_at(tk, i + 2)))),
                   s -> CAST(CONV(SUBSTRING(MD5(s), 1, 15), 16, 10)
                             AS BIGINT) % {p}) AS hs
        FROM toks WHERE size(tk) >= 3
    )
    SELECT doc_id, hs, size(hs) AS n, {mins} FROM hashed
    """


def _variant_mapside(spark: SparkSession, sf_dir: str):
    from aind_protein_data_transformation_spark.catalog import ensure_views

    ensure_views(spark, sf_dir, "documents")
    docs = spark.sql(_mapside_docs_sql()).persist()
    docs.createOrReplaceTempView("_mh_docs")
    spark.sql("SELECT doc_id, explode(hs) AS h FROM _mh_docs").createOrReplaceTempView(
        "_mh_shingles"
    )
    spark.sql(
        "SELECT doc_id, n, "
        + ", ".join(f"m{i}" for i in range(MINHASH_PERMS))
        + " FROM _mh_docs"
    ).createOrReplaceTempView("_mh_sig")
    return spark.sql(_UNPACKED_VERIFY_SQL).transform(
        lambda d: sorted_small(d, "doc_a", "doc_b")
    )


VARIANTS = {
    "current": lambda s, d: dedup_minhash_lsh(s, d),
    "hash_first": lambda s, d: _variant(s, d, True, False),
    "packed_bands": lambda s, d: _variant(s, d, False, True),
    "mapside": _variant_mapside,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("exp-minhash")
    import os

    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    # result equality across variants (once, warm-up doubling as check)
    base = None
    for name, fn in VARIANTS.items():
        rows = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.catalog.clearCache()
        if base is None:
            base = rows
        else:
            assert rows == base, f"{name} diverges: {len(rows)} vs {len(base)}"
    print(f"# all variants agree: {len(base)} pairs", flush=True)

    # shared interleaved order-alternated harness (the old loop
    # interleaved but never rotated the order, so the last-listed
    # variant always sat in the warmest slot). Plans rebuild per run
    # (callable form); the cache clear runs through post_run, OUTSIDE
    # the timed window (ADVICE r7 — billing it inflated the absolute
    # per-variant timings), matching the replaced loop's semantics.
    from aind_protein_data_transformation_spark.measure import interleaved_ab

    res = interleaved_ab(
        {name: (lambda fn=fn: fn(spark, sf_dir)) for name, fn in VARIANTS.items()},
        rounds=rounds,
        warmup=0,  # the equality check above already warmed every variant
        post_run=spark.catalog.clearCache,
    )
    best = {k: v["best"] for k, v in res.items()}
    print(json.dumps({"sf_dir": sf_dir, "best": best}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
