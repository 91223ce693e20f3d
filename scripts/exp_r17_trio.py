#!/usr/bin/env python
"""Round-17 same-session interleaved A/B for the full-registry heavy
trio (VERDICT r16 #4): dedup_cluster_components,
similarity_kmeans_assign, dedup_semantic_keep (+ any extra names given
on the command line).

Old module sources are dumped via ``git show HEAD:<path>`` (run this
BEFORE committing the round's change, or pass a sha) to /tmp and exec'd
with a scratch registry, exactly the exp_r16_ab.py pattern. Both sides
use the bench prepared-statement model (DataFrame built once, noop per
run, caches released between runs) unless the plan carries an eager
RDD, in which case the side is a rebuild-per-run callable, mirroring
bench.py's ``_plan_has_eager_rdd`` rule.

Usage: python scripts/exp_r17_trio.py [rounds] [query ...]
Prereq: /tmp/old_op_similarity.py, /tmp/old_llm_similarity.py,
/tmp/old_llm_dedup.py, /tmp/old_op_graph.py dumped from the pre-change
tree (git show <sha>:<path>).
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.catalog import DEFAULT_SF_DIR
from aind_protein_data_transformation_spark.measure import interleaved_ab
from aind_protein_data_transformation_spark.session import get_spark

import aind_protein_data_transformation_spark.queries as q
import aind_protein_data_transformation_spark.queries.registry as reg


def load_old(name: str, path: str):
    full = f"aind_protein_data_transformation_spark.queries._old_{name}"
    real = reg.REGISTRY
    reg.REGISTRY = {}
    try:
        spec = importlib.util.spec_from_file_location(full, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
    finally:
        reg.REGISTRY = real
    return mod


def _patch_old_operators():
    """Exec the OLD operator modules and rebind them inside the old
    query module's import graph: the old llm_* modules import
    assign_buckets etc. at module top level, so exec'ing them AFTER
    the operator modules are patched in sys.modules picks up the old
    operator code."""
    import aind_protein_data_transformation_spark.operators.similarity as cur_sim
    import aind_protein_data_transformation_spark.operators.graph as cur_graph

    saved = {}
    for modname, path in (
        ("aind_protein_data_transformation_spark.operators.similarity", "/tmp/old_op_similarity.py"),
        ("aind_protein_data_transformation_spark.operators.graph", "/tmp/old_op_graph.py"),
    ):
        if not os.path.exists(path):
            continue
        saved[modname] = sys.modules[modname]
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules[modname] = mod
    return saved


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or [
        "dedup_cluster_components",
        "similarity_kmeans_assign",
        "dedup_semantic_keep",
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    # Old side: patch old operator modules in, exec old query modules,
    # then restore so the NEW side uses the live tree.
    saved = _patch_old_operators()
    old_mods = {}
    for name, path in (
        ("llm_similarity", "/tmp/old_llm_similarity.py"),
        ("llm_dedup", "/tmp/old_llm_dedup.py"),
    ):
        if os.path.exists(path):
            old_mods[name] = load_old(name, path)
    sys.modules.update(saved)

    module_of = {
        "dedup_cluster_components": "llm_dedup",
        "dedup_minhash_lsh": "llm_dedup",
        "dedup_ngram_jaccard": "llm_dedup",
        "similarity_kmeans_assign": "llm_similarity",
        "dedup_semantic_keep": "llm_similarity",
        "dedup_embedding_cosine": "llm_similarity",
        "similarity_ivf_ann": "llm_similarity",
        "dedup_embedding_srp": "llm_similarity",
    }

    spark = get_spark("exp-r17-trio")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    def post_run():
        q.cache.release_caches()
        spark.catalog.clearCache()

    def side(fn):
        """Prepared-statement side, falling back to rebuild-per-run
        when the plan carries an eager RDD (bench.py's rule)."""
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if "LogicalRDD" in plan or "ExistingRDD" in plan:
            return lambda: fn(spark, sf_dir)
        return df

    frames = {}
    results = {}
    for name in names:
        old_fn = getattr(old_mods[module_of[name]], name)
        new_fn = q.REGISTRY[name].fn
        # result equality first (collected, sorted)
        post_run()
        old_rows = sorted(map(tuple, old_fn(spark, sf_dir).collect()))
        post_run()
        new_rows = sorted(map(tuple, new_fn(spark, sf_dir).collect()))
        post_run()
        results[name] = old_rows == new_rows
        frames[f"{name}::old"] = side(old_fn)
        frames[f"{name}::new"] = side(new_fn)

    res = interleaved_ab(frames, rounds=rounds, warmup=1, post_run=post_run)
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'delta%':>8s} equal")
    for name in names:
        o = res[f"{name}::old"]["best"]
        n = res[f"{name}::new"]["best"]
        print(
            f"{name:34s} {o:8.3f} {n:8.3f} {100*(n-o)/o:7.1f}% {results[name]}"
        )
        print(f"   old runs: {[round(x, 2) for x in res[f'{name}::old']['runs']]}")
        print(f"   new runs: {[round(x, 2) for x in res[f'{name}::new']['runs']]}")
    spark.stop()
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
