#!/usr/bin/env python
"""Round-16 minhash materialization A/B: how should the signature frame
be shared by its four consumers (two band-join sides + two verify
probes)?

Variants (identical results, oracle-identical):
- old:   pre-r16 form — WITH-CTE verify whose persist silently never
         substituted; the four inlined pipelines shared work only via
         runtime exchange-stage reuse below the (doc_id, h) distinct.
- persist: r16 batch-1 — nested-subquery verify + persist() (cache
         substitution works; cache build pays columnar compression of
         the per-doc hash-set arrays).
- ckpt:  localCheckpoint instead of persist.
- exch:  NO cache at all — an explicit REPARTITION(doc_id) exchange on
         top of the signature aggregate; the four consumer subtrees are
         identical below it, so AQE stage reuse computes the pipeline
         once and the consumers re-read the shuffle files.

Usage: python scripts/exp_r16_minhash.py [rounds] (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.catalog import DEFAULT_SF_DIR, ensure_views
from aind_protein_data_transformation_spark.measure import interleaved_ab
from aind_protein_data_transformation_spark.plans.scale import fanout_width, sorted_small
from aind_protein_data_transformation_spark.session import get_spark

import aind_protein_data_transformation_spark.queries as q
import aind_protein_data_transformation_spark.queries.registry as reg
from aind_protein_data_transformation_spark.queries.llm_dedup import (
    _MH_SHINGLES_SQL,
    _MH_SIG_SQL,
    _MH_VERIFY_SQL,
)
from aind_protein_data_transformation_spark.queries.cache import tracked_persist


def load_old():
    full = "aind_protein_data_transformation_spark.queries._old_llm_dedup"
    real = reg.REGISTRY
    reg.REGISTRY = {}
    try:
        spec = importlib.util.spec_from_file_location(full, "/tmp/old_llm_dedup.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    finally:
        reg.REGISTRY = real
    return mod


_SIG_EXCH_SQL = _MH_SIG_SQL.replace(
    "SELECT doc_id, ", "SELECT /*+ REPARTITION(doc_id) */ doc_id, ", 1
)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    old_mod = load_old()

    spark = get_spark("exp-r16-minhash")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ensure_views(spark, sf_dir, "documents")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    def post_run():
        q.cache.release_caches()
        spark.catalog.clearCache()

    def shingles():
        spark.sql(
            _MH_SHINGLES_SQL.format(fan=fanout_width(spark))
        ).createOrReplaceTempView("_mh_shingles")

    def v_old():
        return old_mod.dedup_minhash_lsh(spark, sf_dir)

    def v_persist():
        shingles()
        tracked_persist(spark.sql(_MH_SIG_SQL)).createOrReplaceTempView("_mh_sig")
        return spark.sql(_MH_VERIFY_SQL).transform(
            lambda d: sorted_small(d, "doc_a", "doc_b")
        )

    def v_ckpt():
        shingles()
        spark.sql(_MH_SIG_SQL).localCheckpoint().createOrReplaceTempView("_mh_sig")
        return spark.sql(_MH_VERIFY_SQL).transform(
            lambda d: sorted_small(d, "doc_a", "doc_b")
        )

    def v_exch():
        shingles()
        spark.sql(_SIG_EXCH_SQL).createOrReplaceTempView("_mh_sig")
        return spark.sql(_MH_VERIFY_SQL).transform(
            lambda d: sorted_small(d, "doc_a", "doc_b")
        )

    frames = {
        "mh::old": v_old,
        "mh::persist": v_persist,
        "mh::ckpt": v_ckpt,
        "mh::exch": v_exch,
    }
    res = interleaved_ab(frames, rounds=rounds, warmup=1, post_run=post_run)
    for k, v in res.items():
        print(f"{k:14s} best={v['best']:.3f} median={v['median']:.3f} runs={v['runs']}")

    # sanity: exch variant must show ReusedExchange at runtime
    df = v_exch()
    df.write.format("noop").mode("overwrite").save()
    p = df._jdf.queryExecution().executedPlan().toString()
    print("exch ReusedExchange:", p.count("ReusedExchange"))
    post_run()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
