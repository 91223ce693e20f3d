#!/usr/bin/env python
"""Adjudicate the q7_nation_volume WATCH (VERDICT r10 #4) with data.

r9 -> r10 the driver read q7 at 0.365s -> 0.513s (+40%) on plans the
judge verified unchanged except one session conf:
``spark.sql.parquet.pushdown.inFilterThreshold`` 10 (Spark default) ->
1024. This runs q7 alone in ONE session, interleaved A/B/A/B (5 runs
per arm, conf flipped between runs — it is a runtime SQL conf), so
session-level drift cancels. If the 1024 arm is consistently slower,
the conf is the cause; if the arms are indistinguishable, the r10
reading was session noise and the WATCH closes.

Prints one JSON line with per-arm runs + medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CONF = "spark.sql.parquet.pushdown.inFilterThreshold"


def main() -> int:
    from aind_protein_data_transformation_spark.queries import queries
    from aind_protein_data_transformation_spark.session import get_spark

    spark = get_spark("exp-q7-ab")
    q7 = queries()["q7_nation_volume"]
    # warm the scan caches / JIT once per arm before timing
    for v in ("10", "1024"):
        spark.conf.set(CONF, v)
        q7(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {"10": [], "1024": []}
    for _ in range(5):
        for v in ("10", "1024"):  # interleaved so drift hits both arms
            spark.conf.set(CONF, v)
            t0 = time.perf_counter()
            q7(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[v].append(round(time.perf_counter() - t0, 4))
    out = {
        "metric": "q7_inFilterThreshold_ab",
        "sf_dir": SF_DIR,
        "runs": runs,
        "median_10": round(statistics.median(runs["10"]), 4),
        "median_1024": round(statistics.median(runs["1024"]), 4),
        "best_10": min(runs["10"]),
        "best_1024": min(runs["1024"]),
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
