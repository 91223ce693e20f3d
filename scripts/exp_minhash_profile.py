#!/usr/bin/env python
"""Stage-split profile of dedup_minhash_lsh (VERDICT r8 #4).

The driver recorded 0.777s (r7) then 0.957s (r8) for the suite's
heaviest row on BYTE-IDENTICAL code — this one-session interleaved
profile splits the query into its cumulative stages to adjudicate
drift vs session noise with data:

  shingles   corpus union + tokenize + shingle + md5 + distinct
  sig        + the 32-min-agg signature pass (unpersisted)
  full       the registered query (persisted sig -> band self-join ->
             broadcast-keyed array_intersect verify -> ORDER BY)

All three run as callables through measure.interleaved_ab (order-
alternated, construction billed per run); the persisted signature
frame is dropped after every run so no candidate inherits a warm
cache. Compare 'full' against the r4/r5 same-session recordings
(0.82-0.91s) and the driver pair: inside that band = noise (the
documented adjudication); the stage split shows WHERE time went if it
is not.

The default is rounds=6 — a MULTIPLE of the candidate count, stated
explicitly because interleaved_ab silently rounds odd requests UP to
equalize slot occupancy (a rounds=4 request actually runs 6; the
printed protocol must match what ran — round-9 review).

Usage: python scripts/exp_minhash_profile.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.measure import interleaved_ab  # noqa: E402
from aind_protein_data_transformation_spark.plans.scale import fanout_width  # noqa: E402
from aind_protein_data_transformation_spark.queries.llm_dedup import (  # noqa: E402
    _MH_SHINGLES_SQL,
    _MH_SIG_SQL,
    dedup_minhash_lsh,
)
from aind_protein_data_transformation_spark.catalog import ensure_views  # noqa: E402
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(argv[2]) if len(argv) > 2 else 6
    spark = get_spark("exp-minhash-profile")
    try:
        ensure_views(spark, sf_dir, "documents")
        fan = fanout_width(spark)

        def shingles():
            return spark.sql(_MH_SHINGLES_SQL.format(fan=fan))

        def sig():
            shingles().createOrReplaceTempView("_mh_shingles")
            return spark.sql(_MH_SIG_SQL)

        def full():
            return dedup_minhash_lsh(spark, sf_dir)

        frames = {"shingles": shingles, "sig": sig, "full": full}
        # mirror interleaved_ab's equalization from the ACTUAL candidate
        # count so the printed protocol always matches what runs (a
        # hardcoded count would drift the moment a stage is added)
        if rounds % len(frames):
            rounds += len(frames) - rounds % len(frames)
        res = interleaved_ab(
            frames,
            rounds=rounds,
            post_run=spark.catalog.clearCache,
        )
        out = {k: round(v["best"], 3) for k, v in res.items()}
        out["band_join_plus_verify_approx"] = round(
            out["full"] - out["sig"], 3
        )
        print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, **out}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
