#!/usr/bin/env python
"""10x TEXT-corpus scale-up (companion to bench_scale10.py).

bench_scale10 deliberately leaves the documents table unscaled: naive
duplication makes every document a bit-identical twin of its 9 copies
and turns dedup into a pathological all-pairs workload. This script
scales it FAITHFULLY instead: each of the 10 copies shifts doc_id by a
disjoint offset (divisible by 20, so the corpus-near mutant
construction lands identically per copy) and prefixes the text with a
copy-unique token — so within-copy near-dup structure is preserved
exactly, and ACROSS copies only the drop-first-word mutants collide
(each source doc's 10 mutants are identical, a bounded 10-clique per
20th document — the way real corpora repeat documents, not n²).

Runs the text headline subset on both engines back-to-back and prints
spark/duckdb JSON lines + a ratio summary.

Usage: python scripts/bench_text10.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COPIES = 10
OFFSET = 10_000_000
FILE_TARGET = 4 * 1024 * 1024

QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_stats",
    "pipeline_clean_corpus",
]

PASSTHROUGH = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()


def scale_documents(sf_dir: str, out_dir: str) -> None:
    src = os.path.join(sf_dir, "documents.parquet")
    dst = os.path.join(out_dir, "documents.parquet")
    os.makedirs(dst, exist_ok=True)
    base = pq.read_table(src)
    rows = base.num_rows
    files_per_copy = max(1, math.ceil(os.path.getsize(src) / FILE_TARGET))
    per = math.ceil(rows / files_per_copy)
    did = base.schema.get_field_index("doc_id")
    tid = base.schema.get_field_index("text")
    for i in range(COPIES):
        shifted = base.set_column(
            did, "doc_id", pc.add(base.column("doc_id"), i * OFFSET)
        )
        prefixed = shifted.set_column(
            tid,
            "text",
            pc.binary_join_element_wise(
                pa.array([f"c{i}"] * rows), shifted.column("text").combine_chunks(), " "
            ),
        )
        for j in range(files_per_copy):
            chunk = prefixed.slice(j * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(
                chunk,
                os.path.join(dst, f"part-{i:03d}-{j:03d}.parquet"),
                compression="zstd",
                row_group_size=max(chunk.num_rows, 1),
            )
    print(
        f"  documents: {rows} rows x {COPIES} copies, "
        f"{files_per_copy} file(s)/copy",
        file=sys.stderr,
        flush=True,
    )


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    out_dir = argv[2] if len(argv) > 2 else "/tmp/sparkgraft-text10"
    if os.path.isdir(os.path.join(out_dir, "documents.parquet")):
        print(f"reusing existing layout {out_dir}", file=sys.stderr, flush=True)
    else:
        print(f"scaling documents x{COPIES} -> {out_dir}", file=sys.stderr, flush=True)
        scale_documents(sf_dir, out_dir)
        for t in PASSTHROUGH:
            dst = os.path.join(out_dir, f"{t}.parquet")
            os.makedirs(dst, exist_ok=True)
            pq.write_table(
                pq.read_table(os.path.join(sf_dir, f"{t}.parquet")),
                os.path.join(dst, "part-00000.parquet"),
                compression="zstd",
            )

    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": out_dir,
        "SPARK_GRAFT_QUERIES": ",".join(QUERIES),
    }
    results = {}
    for tag, cmd in (
        ("spark_text10", [sys.executable, os.path.join(REPO, "bench.py")]),
        (
            "duckdb_text10",
            [sys.executable, os.path.join(REPO, "scripts", "bench_duckdb.py"), out_dir],
        ),
    ):
        out = subprocess.run(
            cmd, env=env, cwd=REPO, capture_output=True, text=True, check=True
        ).stdout.strip().splitlines()[-1]
        results[tag] = json.loads(out)
        print(out, flush=True)

    sq = results["spark_text10"]["queries"]
    dq = results["duckdb_text10"]["queries"]
    summary = {
        "metric": "text10_ratio",
        "spark_total": results["spark_text10"]["value"],
        "duckdb_total": results["duckdb_text10"]["value"],
        "total_ratio": round(
            results["spark_text10"]["value"] / results["duckdb_text10"]["value"], 3
        ),
        "per_query_ratio": {
            k: round(sq[k] / dq[k], 2) if dq[k] > 0 else None for k in sq
        },
        "layout": out_dir,
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
