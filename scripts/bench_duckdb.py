"""DuckDB comparator for the headline bench suite.

Runs each headline query's ORACLE SQL in DuckDB (32 threads) against the
same parquet tables, best-of-3 per query — the identical methodology
bench.py uses for the Spark side — and prints one JSON line. This is
the comparator behind the BENCH.md constants-vs-body decomposition.

Usage: python scripts/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def run_comparator(
    sf_dir: str, names: list[str], runs: int = 3
) -> dict[str, float]:
    """Best-of-``runs`` DuckDB wall seconds per query name (oracle SQL on
    32 threads over the same parquet). Importable so bench.py can take a
    back-to-back same-session pair — cross-session ratios on this VM are
    ±50% noise."""
    import aind_protein_data_transformation_spark.queries as q  # noqa: E402

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # multi-file layout (scripts/bench_layout.py): glob the parts
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    timings: dict[str, float] = {}
    for name in names:
        sql = q.REGISTRY[name].oracle
        if sql is None:  # non-SQL-expressible op (bench --all path)
            continue
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    con.close()
    return timings


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from bench import HEADLINE  # noqa: E402

    names = list(HEADLINE)
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        names = [n for n in subset.split(",") if n]
    runs_used = 5
    timings = run_comparator(sf_dir, names, runs=runs_used)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_comparator_wall_seconds",
                "value": total,
                "unit": "sec",
                "runs_per_query": runs_used,
                "queries": timings,
                "sf_dir": sf_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
