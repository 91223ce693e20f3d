#!/usr/bin/env python
"""Measure the widen-the-chunks scale dial at the 10x text layout
(round 10 — the follow-through on VERDICT r9 #3's "make it
constructible": now that ``write_simhash_index(bits=, n_chunks=)``
exists, check that the DOCUMENTED payoff is real at the layout where
the 8-bit default was measured).

Claim under test (operators/simhash_index.py module notes): w-bit chunk
blocking yields ~n/2^w candidates per chunk per probe doc, so moving
from 8-bit chunks (32/4) to 16-bit chunks (48/3) should cut the
pre-verify collision volume by roughly 2^8 = 256x at a corpus size
where candidates dominate, shrinking the probe's candidate join
correspondingly. Hamming radii across different hash widths are
different similarity measures (a 48-bit hamming-1 is a STRICTER match
than a 32-bit hamming-1), so this experiment compares WORKLOADS, not
result sets — per-geometry correctness is pinned separately against a
DuckDB replay (tests/test_simhash_index.py) at each geometry.

Protocol: one session; x10 copy-prefixed documents corpus (reuses
/tmp/sparkgraft-text10, built by scripts/bench_text10.py's faithful
scaler); per geometry, build the index (timed once — it amortizes
across every future shard), count the raw collision rows and the
distinct candidate pairs for the fixed copy-0 mutant shard, then time
the full probe (radius 1, the non-degenerate radius BENCH.md round 9
established for this vocab-shared corpus) with interleaved_ab (both
geometries' probes alternate in one session, order-rotated; the
effective round count is recorded in the output).

Usage: python scripts/exp_simhash_widen.py [sf_dir] [out_dir]
Prints one JSON line per geometry plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MUT_OFFSET = 1_000_000_000
OFFSET = 10_000_000  # bench_text10's per-copy doc_id shift
RADIUS = 1

GEOMETRIES = [
    {"tag": "8bit", "bits": 32, "n_chunks": 4},
    {"tag": "16bit", "bits": 48, "n_chunks": 3},
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft-text10"
    if not os.path.isdir(os.path.join(out_dir, "documents.parquet")):
        from bench_text10 import scale_documents  # noqa: E402

        os.makedirs(out_dir, exist_ok=True)
        scale_documents(sf_dir, out_dir)

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.measure import interleaved_ab
    from aind_protein_data_transformation_spark.operators.simhash_index import (
        _chunk_rows,
        incremental_simhash_pairs,
        write_simhash_index,
    )
    from aind_protein_data_transformation_spark.operators.dedup import simhash
    from aind_protein_data_transformation_spark.session import get_spark

    spark = get_spark("exp-simhash-widen")
    results: dict[str, dict] = {}
    names = []
    try:
        docs = load_table(spark, out_dir, "documents").select("doc_id", "text")
        n_corpus = docs.count()
        shard = (
            docs.filter(f"doc_id % 20 = 0 AND doc_id < {OFFSET}")
            .selectExpr(
                f"doc_id + {MUT_OFFSET} AS doc_id",
                r"regexp_replace(text, '^\\S+\\s+', '') AS text",
            )
            .localCheckpoint()
        )
        n_shard = shard.count()
        probes = {}
        for g in GEOMETRIES:
            name = f"exp_shw_{g['tag']}"
            names.append(name)
            t0 = time.perf_counter()
            write_simhash_index(
                docs, name, bits=g["bits"], n_chunks=g["n_chunks"]
            )
            build_s = round(time.perf_counter() - t0, 4)
            # collision volume: the raw probe-bands join rows BEFORE
            # the DISTINCT — the quantity the chunk width controls
            sims = simhash(shard, n_bits=g["bits"]).localCheckpoint()
            pc = _chunk_rows(sims, "doc_id", g["bits"], g["n_chunks"])
            idx = spark.table(f"{name}_bands")
            collisions = pc.join(
                idx,
                (pc["chunk"] == idx["chunk"]) & (pc["val"] == idx["val"]),
            ).count()
            cand = (
                pc.join(
                    idx,
                    (pc["chunk"] == idx["chunk"]) & (pc["val"] == idx["val"]),
                )
                .select(
                    pc["doc_id"].alias("new_id"),
                    idx["doc_id"].alias("index_id"),
                )
                .distinct()
                .count()
            )
            pairs = incremental_simhash_pairs(
                spark, shard, name, max_hamming=RADIUS
            ).count()
            results[g["tag"]] = {
                "bits": g["bits"],
                "n_chunks": g["n_chunks"],
                "chunk_width": g["bits"] // g["n_chunks"],
                "build_s": build_s,
                "collision_rows": collisions,
                "distinct_candidates": cand,
                "pairs_at_radius1": pairs,
            }
            probes[g["tag"]] = (
                lambda nm=name: incremental_simhash_pairs(
                    spark, shard, nm, max_hamming=RADIUS
                )
            )
        # the OTHER skew lever (round 10): keep the 8-bit geometry but
        # cap hot buckets — CAP docs/bucket is ~5x the uniform-hash
        # expectation (n/256 ~= 195 here) and far above the mutant
        # 10-clique multiplicity, so only corpus-hot boilerplate values
        # are dropped; pairs_at_radius1 vs the uncapped 8-bit run is
        # the measured recall cost of the cap on this corpus
        CAP = 1000
        g8 = GEOMETRIES[0]
        name8 = f"exp_shw_{g8['tag']}"
        capped_pairs = incremental_simhash_pairs(
            spark, shard, name8, max_hamming=RADIUS, max_bucket=CAP
        ).count()
        results["8bit_cap"] = {
            "bits": g8["bits"],
            "n_chunks": g8["n_chunks"],
            "max_bucket": CAP,
            "pairs_at_radius1": capped_pairs,
            "recall_vs_uncapped": round(
                capped_pairs / max(results["8bit"]["pairs_at_radius1"], 1), 4
            ),
        }
        probes["8bit_cap"] = lambda: incremental_simhash_pairs(
            spark, shard, name8, max_hamming=RADIUS, max_bucket=CAP
        )
        # interleaved probe timing, both geometries in one session
        # (callable form: the probe localCheckpoints the shard
        # signatures — eager work that must be billed inside the run)
        ab = interleaved_ab(probes, rounds=4)
        for tag, r in ab.items():
            results[tag]["probe_best_s"] = round(r["best"], 4)
            results[tag]["probe_median_s"] = round(r["median"], 4)
            results[tag]["probe_runs"] = [round(x, 4) for x in r["runs"]]
        for tag, r in results.items():
            print(json.dumps({"geometry": tag, "corpus": n_corpus,
                              "shard": n_shard, **r}), flush=True)
        c8 = results["8bit"]["collision_rows"]
        c16 = results["16bit"]["collision_rows"]
        print(json.dumps({
            "summary": "widen_chunks_x10",
            "collision_reduction": round(c8 / max(c16, 1), 1),
            "probe_speedup_best": round(
                results["8bit"]["probe_best_s"]
                / results["16bit"]["probe_best_s"],
                2,
            ),
            "effective_rounds": len(results["8bit"]["probe_runs"]),
        }), flush=True)
        return 0
    finally:
        for name in names:
            for sfx in ("bands", "sigs"):
                spark.sql(f"DROP TABLE IF EXISTS {name}_{sfx}")
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
