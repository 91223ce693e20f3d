#!/usr/bin/env python
"""Re-layout the sf0.1 bench fixture into multi-row-group parquet
(VERDICT r16 #6): every table was ONE row group, so every scan stage
was a single task — the 8-vs-32-core scaling block topped out at 1.94
and half the headline queries were floor-dominated. Multi-row-group
files let BOTH engines parallelize the scan (Spark splits files by
spark.sql.files.maxPartitionBytes and each task reads the row groups
whose midpoint falls in its range; DuckDB parallelizes row-group-wise
natively), so the comparator gate stays fair.

CONTENT IS PRESERVED EXACTLY: the table is read with pyarrow and
rewritten with a smaller row_group_size — same schema (including the
events.ts physical type), same row order, same values. The script
verifies full-table equality (pyarrow Table.equals after read-back)
and refuses to replace the file otherwise. Originals are expected to
be backed up by the caller first (cp -r /root/testdata
/root/testdata.r17bak).

Only sf0.1 (the bench SF) is re-laid-out; the correctness SFs
(sf0.001, sf0.01) stay byte-identical to the driver's generation.

Usage: python scripts/regen_rowgroups.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

#: rows per row group, picked for ~8-32 groups on the big tables at
#: sf0.1 (group payloads ~0.1-0.4 MB); tiny dimension tables stay
#: single-group (splitting 25-row tables buys nothing and bloats
#: footers).
ROWS_PER_GROUP = {
    "lineitem": 18_750,   # 600k rows -> 32 groups
    "orders": 9_375,      # 150k -> 16
    "events": 6_250,      # 100k -> 16
    "customer": 1_875,    # 15k -> 8
    "part": 2_500,        # 20k -> 8
    "documents": 625,     # 5k -> 8
    "embeddings": 250,    # 2k -> 8
}


def relayout(sf_dir: str, name: str, rows_per_group: int) -> None:
    path = os.path.join(sf_dir, f"{name}.parquet")
    orig = pq.read_table(path)
    meta = pq.ParquetFile(path).metadata
    tmp = path + ".rg_tmp"
    pq.write_table(
        orig,
        tmp,
        row_group_size=rows_per_group,
        compression="zstd",
        # preserve nanosecond timestamps (events.ts) instead of the
        # writer default of coercing to micros
        coerce_timestamps=None,
        version="2.6",
    )
    back = pq.read_table(tmp)
    if not back.equals(orig):
        os.unlink(tmp)
        raise SystemExit(f"{name}: re-laid-out table is NOT equal — aborting")
    if back.schema != orig.schema:
        os.unlink(tmp)
        raise SystemExit(f"{name}: schema drifted — aborting")
    os.replace(tmp, path)
    newmeta = pq.ParquetFile(path).metadata
    print(
        f"{name}: rows={meta.num_rows} groups {meta.num_row_groups} -> "
        f"{newmeta.num_row_groups}, bytes {os.path.getsize(path)}"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    for name, rpg in ROWS_PER_GROUP.items():
        relayout(sf_dir, name, rpg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
