#!/usr/bin/env python
"""Round-17: minhash verify tail — band-GROUP aggregate candidate vs
the kept band self-join (the last unmeasured idea from VERDICT r16 #7).

Candidate: instead of joining the banded signature relation with
itself on the packed band keys and DISTINCT-ing the (doc_a, doc_b)
pairs, GROUP BY the band key, collect the (sorted) doc_ids per bucket,
and explode the i<j pairs — the band exchange then carries ONE row per
(doc, band) instead of two join sides, and the self-join disappears.
The pair set is identical by construction (a bucket's pairs ARE the
join's matches under doc_id < doc_id), the cross-band DISTINCT stays.

Same-session interleaved order-alternated A/B, bench prepared-statement
model with the eager-RDD rebuild rule (both sides carry the signature
localCheckpoint, so both rebuild per run, exactly like bench.py).

Usage: python scripts/exp_r17_bandagg.py [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.catalog import DEFAULT_SF_DIR
from aind_protein_data_transformation_spark.measure import interleaved_ab
from aind_protein_data_transformation_spark.session import get_spark

import aind_protein_data_transformation_spark.queries as q
from aind_protein_data_transformation_spark.queries import llm_dedup as md
from aind_protein_data_transformation_spark.plans.scale import (
    fanout_width,
    materialize,
    sorted_small,
)
from aind_protein_data_transformation_spark.catalog import ensure_views

_BANDAGG_PAIRS = f"""
                SELECT DISTINCT pair.a AS doc_a, pair.b AS doc_b
                FROM (
                    SELECT sort_array(collect_list(doc_id)) AS ids
                    FROM {md._MH_BANDED_SUB}
                    GROUP BY band, p01, p23
                    HAVING count(*) > 1
                )
                LATERAL VIEW explode(
                    flatten(transform(sequence(1, size(ids) - 1),
                        i -> transform(sequence(i + 1, size(ids)),
                            j -> struct(element_at(ids, i) AS a,
                                        element_at(ids, j) AS b))))
                ) t AS pair
"""

_VERIFY_BANDAGG_SQL = f"""
    SELECT doc_a, doc_b,
           CAST(shared AS DOUBLE) / (na + nb - shared) AS jaccard
    FROM (
        SELECT w.doc_a, w.doc_b, w.na, d.n AS nb,
               size(array_intersect(w.ha, d.hs)) AS shared
        FROM (
            SELECT /*+ BROADCAST(p) */ p.doc_a, p.doc_b, d.hs AS ha, d.n AS na
            FROM (
{_BANDAGG_PAIRS}
            ) p JOIN _mh_sig d ON d.doc_id = p.doc_a
        ) w JOIN _mh_sig d ON d.doc_id = w.doc_b
    )
    WHERE CAST(shared AS DOUBLE) / (na + nb - shared) >= 0.4
"""


def bandagg_form(spark, sf_dir):
    ensure_views(spark, sf_dir, "documents")
    spark.sql(
        md._MH_SHINGLES_SQL.format(fan=fanout_width(spark))
    ).createOrReplaceTempView("_mh_shingles")
    materialize(spark.sql(md._MH_SIG_SQL)).createOrReplaceTempView("_mh_sig")
    return spark.sql(_VERIFY_BANDAGG_SQL).transform(
        lambda d: sorted_small(d, "doc_a", "doc_b")
    )


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("exp-r17-bandagg")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    def post_run():
        q.cache.release_caches()
        spark.catalog.clearCache()

    join_fn = q.REGISTRY["dedup_minhash_lsh"].fn

    post_run()
    a = sorted(map(tuple, join_fn(spark, sf_dir).collect()))
    post_run()
    b = sorted(map(tuple, bandagg_form(spark, sf_dir).collect()))
    post_run()
    equal = a == b
    print(f"rows equal: {equal} ({len(a)} vs {len(b)})")
    if not equal:
        spark.stop()
        return 1

    res = interleaved_ab(
        {
            "minhash::join": lambda: join_fn(spark, sf_dir),
            "minhash::bandagg": lambda: bandagg_form(spark, sf_dir),
        },
        rounds=rounds,
        warmup=1,
        post_run=post_run,
    )
    for k, v in res.items():
        print(
            f"{k:20s} best {v['best']:.3f} runs {[round(x, 3) for x in v['runs']]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
