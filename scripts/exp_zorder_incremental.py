#!/usr/bin/env python
"""Does the clustered layout survive incremental ingestion? (round 12)

The 100-TB constraint: re-clustering the whole table on every append is
a full-table shuffle per batch — impossible. The viable discipline is
the same one the incremental LSH index families use: cluster each
arriving BATCH among itself, land it as new files, never re-shuffle
history. The question this measures: how much pruning does per-batch
clustering give up vs the (unaffordable) global re-cluster?

The geometry argument says "almost nothing": row-group pruning is a
per-group property — a group from batch 7 covers a tight box in
predicate space no matter what batches 1–6 hold. The only losses are
(a) per-batch quantile edges drifting with batch composition and
(b) each batch's coarser tail group. Neither grows with batch count.

Arms (same rows, same row-group budget, same off-key predicate box as
exp_zorder.py):

- ``global``      — one clustering pass over all rows (the upper bound)
- ``incremental`` — rows split into BATCHES hash-disjoint batches, each
  clustered among itself and APPENDED (mode="append"), each batch
  recomputing its own bin edges (one sketch pass per batch)
- ``inc_shared`` — same batches, but batches 2..N reuse batch 1's
  edges (``edges=`` — the recommended 100-TB form: one key space, no
  per-append sketch pass; quantile drift between batch 1 and later
  batches costs layout quality only)
- ``natural10``   — the same batches appended unclustered (the lower
  bound: incremental ingest with no layout discipline)
- ``compacted``   — the incremental table after compact_clustered_table
  (verify-then-swap re-cluster): must land back at the global bound

Usage: python scripts/exp_zorder_incremental.py [sf_dir] [out_root] [batches]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROW_GROUP_BYTES = 256 * 1024
NUM_FILES = 8

PRED = {"l_discount": (0.06, 0.08), "l_quantity": (None, 10.0)}
COLS = ["l_shipdate", "l_discount", "l_quantity"]


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    out_root = argv[2] if len(argv) > 2 else "/tmp/sparkgraft-zorder-inc"
    batches = int(argv[3]) if len(argv) > 3 else 10

    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.session import get_spark
    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.layout import (
        layout_scan_fraction,
        zorder_layout,
    )

    spark = get_spark("exp-zorder-incremental")
    li = load_table(spark, sf_dir, "lineitem")
    paths = {
        k: os.path.join(out_root, k)
        for k in ("global", "incremental", "inc_shared", "natural10")
    }
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)

    zorder_layout(li, COLS, paths["global"], bits=6, num_files=NUM_FILES,
                  row_group_bytes=ROW_GROUP_BYTES, curve="hilbert")

    # hash-disjoint batches stand in for arrival order; each clustered
    # among itself, appended — history never re-shuffled
    files_per_batch = max(1, NUM_FILES // batches)
    shared_edges = None
    for b in range(batches):
        batch = li.filter(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(batches))
            == b
        )
        zorder_layout(batch, COLS, paths["incremental"], bits=6,
                      num_files=files_per_batch,
                      row_group_bytes=ROW_GROUP_BYTES, curve="hilbert",
                      mode="append")
        shared_edges = zorder_layout(
            batch, COLS, paths["inc_shared"], bits=6,
            num_files=files_per_batch, row_group_bytes=ROW_GROUP_BYTES,
            curve="hilbert", mode="append", edges=shared_edges,
        )
        (batch.repartition(files_per_batch).write.mode("append")
              .option("compression", "zstd")
              .option("parquet.block.size", str(ROW_GROUP_BYTES))
              .parquet(paths["natural10"]))

    from aind_protein_data_transformation_spark.operators.layout import (
        compact_clustered_table,
    )

    geometry = {k: layout_scan_fraction(p, PRED) for k, p in paths.items()}
    compact_clustered_table(paths["incremental"], COLS, bits=6,
                            num_files=NUM_FILES,
                            row_group_bytes=ROW_GROUP_BYTES,
                            curve="hilbert", spark=spark)
    geometry["compacted"] = layout_scan_fraction(paths["incremental"], PRED)
    rows = {k: g["rows"] for k, g in geometry.items()}
    assert len(set(rows.values())) == 1, f"arms lost rows: {rows}"
    for k, g in geometry.items():
        print(f"  {k}: {g['row_groups_kept']}/{g['row_groups']} groups, "
              f"{g['fraction_rows_kept']:.3f} kept",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "experiment": "zorder_incremental",
        "sf_dir": sf_dir,
        "batches": batches,
        "row_group_bytes": ROW_GROUP_BYTES,
        "geometry": geometry,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
