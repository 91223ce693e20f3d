#!/usr/bin/env python
"""Round-16 same-session interleaved A/B: old (pre-optimization) vs new
query forms for the queries this round touched.

Old module sources are dumped via ``git show <old-commit>:<path>`` to
/tmp and exec'd into throwaway module objects with a SCRATCH registry
swapped in (the shared registry rejects duplicate names), so the old
fns run their original plans in the SAME session as the new ones — the
only comparison this VM's drift respects (measure.interleaved_ab:
interleaved, order-alternated, best-of). Both sides use the UNWRAPPED
module-level fns so neither pays the registry wrapper's cache-clear
inside the timing; clearing happens in post_run for both.

Usage: python scripts/exp_r16_ab.py [rounds] [query ...]
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
from aind_protein_data_transformation_spark.queries import (
    llm_dedup as new_llm_dedup,
    llm_text as new_llm_text,
    relational as new_relational,
    scalar_packs as new_scalar_packs,
)


def load_old(name: str, path: str):
    """Exec a dumped old module under the queries package with a scratch
    registry so its @query calls don't collide with the live one."""
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


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    old_mods = {
        "llm_dedup": load_old("llm_dedup", "/tmp/old_llm_dedup.py"),
        "scalar_packs": load_old("scalar_packs", "/tmp/old_scalar_packs.py"),
        "llm_text": load_old("llm_text", "/tmp/old_llm_text.py"),
        "relational": load_old("relational", "/tmp/old_relational.py"),
    }
    new_mods = {
        "llm_dedup": new_llm_dedup,
        "scalar_packs": new_scalar_packs,
        "llm_text": new_llm_text,
        "relational": new_relational,
    }

    cases = {
        "q_percentiles_exact": "scalar_packs",
        "dedup_minhash_lsh": "llm_dedup",
        "q_theta_join_price_band": "relational",
        "q_window_running_totals": "relational",
        "text_quality_stats": "llm_text",
        "pipeline_clean_corpus": "llm_text",
        # batch 2
        "q_topk_per_group": "relational",
        "q_semi_join_customers_with_orders": "relational",
        "q_outer_join_order_fill": "relational",
    }
    if only:
        cases = {k: v for k, v in cases.items() if k in only}

    spark = get_spark("exp-r16-ab")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    def post_run():
        q.cache.release_caches()
        spark.catalog.clearCache()

    frames = {}
    for name, mod_name in cases.items():
        old_fn = getattr(old_mods[mod_name], name)
        new_fn = getattr(new_mods[mod_name], name)
        frames[f"{name}::old"] = (lambda f=old_fn: f(spark, sf_dir))
        frames[f"{name}::new"] = (lambda f=new_fn: f(spark, sf_dir))

    res = interleaved_ab(frames, rounds=rounds, warmup=1, post_run=post_run)
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'delta%':>8s}")
    for name in cases:
        o = res[f"{name}::old"]["best"]
        n = res[f"{name}::new"]["best"]
        print(f"{name:42s} {o:8.3f} {n:8.3f} {100*(n-o)/o:7.1f}%")
        print(f"   old runs: {res[f'{name}::old']['runs']}")
        print(f"   new runs: {res[f'{name}::new']['runs']}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
