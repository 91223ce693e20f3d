#!/usr/bin/env python
"""Registry-wide warm-time sweep — the standing invariant check
(VERDICT r4 onward): every batch query must run within the warm budget
at sf0.1. Runs bench.py over the full registry in BATCHES with a fresh
Spark session per batch: a single --all session accumulates ~3000
stages and drove the driver into a GC stall in round 4 (one task "ran"
40+ minutes; the same queries finish in seconds in fresh sessions).

Per-batch bench.py already routes its sidecar to /tmp for subset runs,
so the repo-root headline record is never clobbered.

Usage: python scripts/sweep_registry.py [sf_dir] [budget_s] [batch]
Prints one JSON line: worst queries, budget breaches, totals. Exits
nonzero if any query breaches the budget.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
REPO = "/root/repo"


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    budget = float(argv[2]) if len(argv) > 2 else 3.7
    batch = int(argv[3]) if len(argv) > 3 else 8

    import aind_protein_data_transformation_spark.queries as q

    names = [n for n in q.REGISTRY if not n.startswith("streaming_")]
    timings: dict[str, float] = {}
    for i in range(0, len(names), batch):
        chunk = names[i : i + batch]
        env = {
            **os.environ,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_QUERIES": ",".join(chunk),
        }
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=900,
        )
        if proc.returncode != 0:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"batch {chunk} failed rc={proc.returncode}")
        line = proc.stdout.strip().splitlines()[-1]
        got = json.loads(line)["queries"]
        timings.update(got)
        done = len(timings)
        print(
            f"  [{done}/{len(names)}] worst so far: "
            f"{max(timings, key=timings.get)} {max(timings.values()):.2f}s",
            file=sys.stderr,
            flush=True,
        )
    breaches = {n: t for n, t in timings.items() if t > budget}
    worst = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print(
        json.dumps(
            {
                "metric": "registry_sweep_warm_s",
                "sf_dir": sf_dir,
                "budget_s": budget,
                "n_queries": len(timings),
                "total_warm_s": round(sum(timings.values()), 2),
                "worst10": {n: t for n, t in worst},
                "breaches": breaches,
            }
        ),
        flush=True,
    )
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
