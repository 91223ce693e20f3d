#!/usr/bin/env python
"""Measure the point-lookup prune regime (round 11 — the follow-through
on wiring ``prune_scan=`` into all three incremental probes: the
equivalence and plan-pushdown claims are test-pinned in
tests/test_prune_scan.py; this measures whether the regime actually
PAYS at the 10x text layout, and how much of the win is the parquet
page/row-group skip vs merely shrinking the candidate join's input).

Three arms, one session, interleaved (measure.interleaved_ab), all on
the same simhash index over the 10x copy-prefixed corpus, probing the
motivating workload — a 20-document "is this handful already
indexed?" lookup:

- ``full_scan``      — prune_scan=None (the default full-scan regime)
- ``prune_pushdown`` — prune_scan on, inFilterThreshold=1024 (the
  shipped configuration: IN list reaches parquet as per-value
  predicates, sorted row groups/pages skip at I/O time)
- ``prune_no_push``  — prune_scan on, inFilterThreshold=10 (the IN
  list stays a post-scan JVM filter: isolates the join-input
  shrinkage from the storage skip; the DELTA to prune_pushdown is the
  I/O contribution)

The pair count is asserted identical across arms before timing.
Honest framing: at this layout the bands table is a few MB, so the
absolute win is constants-scale; the experiment's value is the
DIRECTION and the decomposition — at 100 TB the pushdown delta is the
term that grows with index size, because the un-pushed arms stream
the full bands table per probe while the pushed arm's bytes follow
the SHARD size.

Usage: python scripts/exp_prune_scan.py [sf_dir] [out_dir] [mult] [family]
``mult`` (default 10) unions that many id-shifted copies of the 10x
corpus before building the index, so the bands table is large enough
for the scan term to be visible at all (10 -> 500k docs). ``family``
is ``simhash`` (default) or ``minhash`` — the two have OPPOSITE
expected outcomes on vocab-shared text: simhash chunk values cluster
on shared vocabulary, so its probe is bound by collision volume the
prune cannot touch (pair set is invariant by design); minhash's
composed 4-hash band keys are near-unique, so collisions are rare and
the bands SCAN is the probe's dominant term — the regime's home turf.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

MUT_OFFSET = 1_000_000_000
OFFSET = 10_000_000  # bench_text10's per-copy doc_id shift
CONF = "spark.sql.parquet.pushdown.inFilterThreshold"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft-text10"
    if not os.path.isdir(os.path.join(out_dir, "documents.parquet")):
        from bench_text10 import scale_documents

        os.makedirs(out_dir, exist_ok=True)
        scale_documents(sf_dir, out_dir)

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.measure import interleaved_ab
    from aind_protein_data_transformation_spark.operators.dedup import (
        incremental_minhash_pairs,
        write_minhash_index,
    )
    from aind_protein_data_transformation_spark.operators.simhash_index import (
        incremental_simhash_pairs,
        write_simhash_index,
    )
    from aind_protein_data_transformation_spark.session import get_spark

    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    family = sys.argv[4] if len(sys.argv) > 4 else "simhash"
    spark = get_spark("exp-prune-scan")
    name = f"exp_prn10_{family}"
    try:
        base_docs = load_table(spark, out_dir, "documents").select(
            "doc_id", "text"
        )
        docs = base_docs
        for m in range(1, mult):
            docs = docs.unionByName(
                base_docs.selectExpr(
                    f"doc_id + {m * 100_000_000} AS doc_id", "text"
                )
            )
        n_corpus = docs.count()
        shard = (
            base_docs.filter(f"doc_id % 250 = 0 AND doc_id < {OFFSET}")
            .selectExpr(
                f"doc_id + {MUT_OFFSET} AS doc_id",
                r"regexp_replace(text, '^\\S+\\s+', '') AS text",
            )
            .localCheckpoint()
        )
        n_shard = shard.count()
        t0 = time.perf_counter()
        if family == "minhash":
            write_minhash_index(docs, name)
        else:
            write_simhash_index(docs, name)
        build_s = round(time.perf_counter() - t0, 3)
        n_bands = spark.table(f"{name}_bands").count()

        def probe(prune, conf_val):
            spark.conf.set(CONF, conf_val)
            if family == "minhash":
                return incremental_minhash_pairs(
                    spark, shard, name, prune_scan=prune
                )
            return incremental_simhash_pairs(
                spark, shard, name, max_hamming=1, prune_scan=prune
            )

        # equivalence gate before any timing (also the warm pass)
        def pairs(df):
            return {(r.new_id, r.index_id) for r in df.collect()}

        base = pairs(probe(None, 1024))
        assert pairs(probe(1024, 1024)) == base, "pushdown arm diverged"
        assert pairs(probe(1024, 10)) == base, "no-push arm diverged"

        timings = interleaved_ab(
            {
                "full_scan": lambda: probe(None, 1024),
                "prune_pushdown": lambda: probe(1024, 1024),
                "prune_no_push": lambda: probe(1024, 10),
            },
            rounds=6,
        )
        print(
            json.dumps(
                {
                    "metric": "prune_scan_regime",
                    "family": family,
                    "corpus_docs": n_corpus,
                    "shard_docs": n_shard,
                    "bands_rows": n_bands,
                    "index_build_s": build_s,
                    "pairs": len(base),
                    "timings": timings,
                }
            ),
            flush=True,
        )
    finally:
        for t in (f"{name}_bands", f"{name}_sigs"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
