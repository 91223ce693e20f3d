#!/usr/bin/env python
"""Round-robin conf experiment over the headline suite.

Runs the full headline suite under several RUNTIME-settable conf
variants, interleaved round-robin within ONE session so VM drift hits
every variant equally (the harness VM moves ±50% between minutes).
Reports per-variant suite totals (best-of-N per query).

Usage: python scripts/exp_conf.py [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.catalog import DEFAULT_SF_DIR
from aind_protein_data_transformation_spark.session import get_spark

VARIANTS: dict[str, dict[str, str]] = {
    "aqe_on": {"spark.sql.adaptive.enabled": "true"},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
}


def main() -> int:
    # even default: with direction alternation both pair sides lead
    # the same number of rounds
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    import aind_protein_data_transformation_spark.queries as q
    from bench import HEADLINE

    spark = get_spark("exp-conf")
    # warmup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()

    # shared interleaved order-alternated harness: each candidate is a
    # (variant conf, query) pair whose thunk pins the conf right before
    # the run (confs are runtime-settable; plans are lazy, so the conf
    # in force at action time is the one that governs execution)
    from aind_protein_data_transformation_spark.measure import interleaved_ab

    def make_thunk(conf, name):
        def thunk():
            for k, v in conf.items():
                spark.conf.set(k, v)
            return q.REGISTRY[name].fn(spark, sf_dir)

        return thunk

    # query-OUTER / variant-INNER (ADVICE r7): the A/B sides of each
    # query must sit adjacent within every interleaved round — built
    # variant-outer, all aqe_on::* candidates still ran as a block
    # before all aqe_off::* and the rotation only shifted the boundary
    # by 1-2 positions, recreating the sequential-block bias the shared
    # harness exists to prevent. Adjacency alone is NOT sufficient
    # either: round 8 measured a ~0.1 s/query second-in-pair advantage
    # (the harness's odd-round reversal now alternates the pair order;
    # use an EVEN rounds count so both sides lead equally often).
    # clearCache goes through post_run so the absolute timings don't
    # include the clear cost (same advice).
    frames = {
        f"{vname}::{name}": make_thunk(conf, name)
        for name in HEADLINE
        for vname, conf in VARIANTS.items()
    }
    res = interleaved_ab(
        frames, rounds=rounds, warmup=1, post_run=spark.catalog.clearCache
    )
    best = {
        (key.split("::")[0], key.split("::")[1]): v["best"]
        for key, v in res.items()
    }

    for vname in VARIANTS:
        total = sum(best[(vname, n)] for n in HEADLINE)
        print(f"{vname}: {total:.2f}s")
        for n in HEADLINE:
            print(f"  {n:38s} {best[(vname, n)]:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
