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
# running as `python scripts/bench_text10.py` puts scripts/ (not the
# repo root) on sys.path[0]; the in-process lifecycle stage imports the
# package, so the root must be added explicitly (same as bench_embed10
# — without it the stage died with ModuleNotFoundError that the
# `| tail` invocation pattern silently swallowed, round-9 find)
sys.path.insert(0, REPO)

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


def index_lifecycle(sf_dir: str, out_dir: str) -> dict:
    """Round-9: the incremental SimHash index's scale argument — the
    third lifecycle family measured the same way as the SRP twin
    (bench_embed10.index_lifecycle): probe cost tracks the SHARD, the
    batch re-run tracks the CORPUS. One session; at each scale the
    corpus is indexed once (build timed separately — it amortizes
    across every future shard), then a FIXED copy-0 mutant shard
    (first word dropped, the registered query's construction) is
    (a) probed against the index vs (b) answered by re-running the
    chunk-blocked batch join over corpus+shard. Pair sets are asserted
    EQUAL on the straddling direction before timing.

    max_hamming=1 here, not the default 3: this vocab-shared synthetic
    corpus is simhash-degenerate at hamming<=3 (~6,600 neighbors PER
    SHARD DOC at x10 — 1.65M output pairs from a 250-doc shard,
    measured; the same output-bound wall BENCH.md round 4 recorded for
    the batch query). At radius 1 the output is the intended bounded
    mutant-clique structure and the timing measures the LIFECYCLE
    (sign shard, join bucketed bands, verify collisions) rather than
    materializing a degenerate result both sides share."""
    import time

    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.measure import interleaved_ab
    from aind_protein_data_transformation_spark.operators.dedup import simhash
    from aind_protein_data_transformation_spark.operators.simhash_index import (
        _chunk_rows,
        incremental_simhash_pairs,
        write_simhash_index,
    )
    from aind_protein_data_transformation_spark.session import get_spark

    MUT_OFFSET = 1_000_000_000  # above every scaled doc_id
    RADIUS = 1  # see docstring: hamming<=3 is output-degenerate here
    spark = get_spark("bench-text10-index")
    out: dict[str, dict] = {}
    try:
        for tag, d in (("x1", sf_dir), ("x10", out_dir)):
            docs = load_table(spark, d, "documents").select("doc_id", "text")
            # fixed shard at both scales: copy-0 mutants (first word
            # dropped — at x10 that strips the copy prefix, so each
            # mutant is near its source AND the 9 sibling copies: the
            # bounded clique structure the scaled corpus documents)
            shard = (
                docs.filter(f"doc_id % 20 = 0 AND doc_id < {OFFSET}")
                .selectExpr(
                    f"doc_id + {MUT_OFFSET} AS doc_id",
                    r"regexp_replace(text, '^\\S+\\s+', '') AS text",
                )
                .localCheckpoint()
            )
            name = f"bench_simhash_idx_{tag}"
            t0 = time.perf_counter()
            write_simhash_index(docs, name, path=f"/tmp/sparkgraft-shidx-{tag}")
            build_s = round(time.perf_counter() - t0, 4)

            def batch_pairs():
                sims = simhash(docs.unionByName(shard))
                ch = _chunk_rows(sims, "doc_id")
                a, b = ch.alias("a"), ch.alias("b")
                cand = (
                    a.join(
                        b,
                        (F.col("a.chunk") == F.col("b.chunk"))
                        & (F.col("a.val") == F.col("b.val"))
                        & (F.col("a.doc_id") >= MUT_OFFSET)
                        & (F.col("b.doc_id") < MUT_OFFSET),
                    )
                    .select(
                        F.col("a.doc_id").alias("new_id"),
                        F.col("b.doc_id").alias("index_id"),
                    )
                    .distinct()
                )
                sig = sims.select("doc_id", "simhash")
                return (
                    cand.join(
                        sig.selectExpr("doc_id AS new_id", "simhash AS sh_new"),
                        "new_id",
                    )
                    .join(
                        sig.selectExpr(
                            "doc_id AS index_id", "simhash AS sh_idx"
                        ),
                        "index_id",
                    )
                    .select(
                        "new_id",
                        "index_id",
                        F.bit_count(
                            F.col("sh_new").bitwiseXOR(F.col("sh_idx"))
                        ).alias("hamming"),
                    )
                    .filter(f"hamming <= {RADIUS}")
                    .groupBy("new_id", "index_id")
                    .agg(F.min("hamming").alias("hamming"))
                )

            def probe_pairs():
                return incremental_simhash_pairs(
                    spark, shard, name, max_hamming=RADIUS
                )

            p = {(r.new_id, r.index_id) for r in probe_pairs().collect()}
            bset = {(r.new_id, r.index_id) for r in batch_pairs().collect()}
            assert p == bset and p, (tag, len(p), len(bset))
            ab = interleaved_ab(
                {"probe": probe_pairs, "batch": batch_pairs}, rounds=4
            )
            out[tag] = {
                "corpus_rows": docs.count(),
                "shard_rows": shard.count(),
                "pairs": len(p),
                "index_build_s": build_s,
                "probe_s": ab["probe"]["best"],
                "batch_s": ab["batch"]["best"],
            }
            for t in (f"{name}_bands", f"{name}_sigs"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.catalog.clearCache()
    finally:
        spark.stop()
    return out


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

    life = index_lifecycle(sf_dir, out_dir)
    lsum: dict = {"metric": "text10_simhash_index_lifecycle", **life}
    for key in ("probe_s", "batch_s"):
        a, b = life["x1"][key], life["x10"][key]
        lsum[f"{key}_x10_over_x1"] = round(b / a, 2) if a > 0 else None
    lsum["batch_over_probe_x10"] = (
        round(life["x10"]["batch_s"] / life["x10"]["probe_s"], 2)
        if life["x10"]["probe_s"] > 0
        else None
    )
    print(json.dumps(lsum), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
