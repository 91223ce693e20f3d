"""Multi-row-group layout experiment (BENCH.md "reading the gate").

Every driver test table is ONE parquet file with ONE row group, so a
Spark scan stage is a single task regardless of split configuration
(Spark cannot split inside a row group), while DuckDB parallelizes
WITHIN a row group across its 32 threads. That asymmetry exists only at
toy file sizes: any production dataset — certainly 100 TB — is many
files × many row groups, where both engines shard their scans.

This script makes the comparison apples-to-apples without touching the
driver data: it re-writes each sf table into an N-file directory layout
(same rows, same order, one row group per file, zstd like the source),
then runs BOTH engines' benches against the re-laid-out directory:

    python scripts/bench_layout.py            # sf0.1 -> /tmp/sparkgraft-layout
    python scripts/bench_layout.py <sf_dir> <out_dir>

Prints three JSON lines: spark_sharded, duckdb_sharded, and a summary
with the per-query and total ratios. Compare against bench.py /
scripts/bench_duckdb.py on the original single-file layout.

Shard count ~= one shard per 64 KiB of source file, capped at 32 (the
harness core count): big tables get 25-32 shards, dimension tables stay
single-file — the same shape a production writer (128 MB targets) gives
large data relative to a cluster.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

MAX_SHARDS = 32
BYTES_PER_SHARD = 64 * 1024


def reshard(sf_dir: str, out_dir: str) -> None:
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        os.makedirs(dst, exist_ok=True)
        n_shards = min(MAX_SHARDS, max(1, os.path.getsize(src) // BYTES_PER_SHARD))
        table = pq.read_table(src)
        rows = table.num_rows
        per = math.ceil(rows / n_shards) if rows else 1
        written = 0
        for i in range(n_shards):
            chunk = table.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(
                chunk,
                os.path.join(dst, f"part-{i:05d}.parquet"),
                compression="zstd",
                row_group_size=max(chunk.num_rows, 1),
            )
            written += 1
        print(
            f"  {t}: {rows} rows -> {written} files", file=sys.stderr, flush=True
        )


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        argv[2] if len(argv) > 2 else "/tmp/sparkgraft-layout-" + os.path.basename(
            sf_dir.rstrip("/")
        )
    )
    print(f"resharding {sf_dir} -> {out_dir}", file=sys.stderr, flush=True)
    reshard(sf_dir, out_dir)

    env = {**os.environ, "SPARK_GRAFT_SF_DIR": out_dir}
    results = {}
    for tag, cmd in (
        ("spark_sharded", [sys.executable, os.path.join(REPO, "bench.py")]),
        (
            "duckdb_sharded",
            [sys.executable, os.path.join(REPO, "scripts", "bench_duckdb.py"), out_dir],
        ),
    ):
        out = subprocess.run(
            cmd, env=env, cwd=REPO, capture_output=True, text=True, check=True
        ).stdout.strip().splitlines()[-1]
        results[tag] = json.loads(out)
        print(out, flush=True)

    sq = results["spark_sharded"]["queries"]
    dq = results["duckdb_sharded"]["queries"]
    ratios = {k: round(sq[k] / dq[k], 2) if dq[k] > 0 else None for k in sq}
    summary = {
        "metric": "sharded_layout_ratio",
        "spark_total": results["spark_sharded"]["value"],
        "duckdb_total": results["duckdb_sharded"]["value"],
        "total_ratio": round(
            results["spark_sharded"]["value"] / results["duckdb_sharded"]["value"], 3
        ),
        "per_query_ratio": ratios,
        "layout": out_dir,
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
