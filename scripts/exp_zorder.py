#!/usr/bin/env python
"""Measure the Z-order layout's scan-pruning payoff (round 12).

Four physical layouts of the SAME lineitem rows, identical row-group
budget, measured two ways against the TPC-H-Q6 predicate box
(shipdate range AND discount range AND quantity cap — three columns,
the multi-column case single-key clustering cannot serve):

- ``natural``  — arrival order (the unclustered baseline)
- ``bydate``   — single-key sort on l_shipdate (the layout a
  date-partitioned 100-TB table effectively has: perfect pruning on
  the date term, none on the other two)
- ``zorder``   — operators/layout.py Z-order on all three predicate
  columns
- ``hilbert``  — same bins re-ranked through the Hilbert permutation
  (curve="hilbert"): no quadrant jumps, so contiguous key runs cover
  slightly tighter boxes — this measures whether that matters here

Two predicate boxes, because they adjudicate DIFFERENT claims:

- ``q6`` (shipdate-led, all three columns): the date term dominates
  (a 1-year slice of a 7-year domain), so the single-key layout is
  expected to WIN OR TIE here — that is the honest cost of spreading
  key bits across three dimensions. The claim on this box is only
  "z-order gives up little on key-led predicates".
- ``nodate`` (discount + quantity, NO date term): the predicate shape
  a date-clustered 100-TB table serves worst — bydate's row-group
  stats on discount/quantity span the whole domain (expected kept
  fraction ~1.0), while z-order's contiguous Morton ranges stay
  local in every clustered dimension. THIS box carries the z-order
  claim.

Two measurements per box:

1. GEOMETRY (deterministic, noise-free): layout_scan_fraction reads
   only parquet footers and reports the fraction of rows living in
   row groups whose [min,max] stats intersect the predicate box —
   the exact keep/skip decision Spark's reader makes from pushed
   filters. This is the number that scales: at 100 TB it is the
   difference between reading the table and reading the matching
   fraction.
2. WALL TIME (interleaved_ab, one session): the aggregate itself on
   each layout. Honest framing: at sf0.1 the whole table is ~15 MB
   zstd and the session floor dominates, so the timing arm mostly
   confirms the direction; the geometry arm carries the scale claim.

Row groups are sized small (default 256 KiB) so a 600k-row sandbox
table has enough of them for the geometry to be visible — production
leaves Spark's 128 MB default; the FRACTION is what transfers, since
it is set by how the predicate box tiles the key space, not by the
absolute group size.

Usage: python scripts/exp_zorder.py [sf_dir] [out_root] [bits]
Prints one JSON line.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROW_GROUP_BYTES = 256 * 1024
NUM_FILES = 8

_AGG = ("SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6)))"
        " AS DOUBLE) AS revenue, COUNT(*) AS n_rows FROM {table} WHERE ")

BOXES = {
    "q6": {
        "sql": _AGG + """l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.07
      AND l_quantity < 24""",
        "pred": {
            "l_shipdate": (
                datetime.datetime(1997, 1, 1),
                # inclusive-interval form of < 1998-01-01 on µs stats
                datetime.datetime(1997, 12, 31, 23, 59, 59, 999999),
            ),
            "l_discount": (0.04, 0.07),
            "l_quantity": (None, 24.0),  # < 24 relaxed — conservative
        },
    },
    "nodate": {
        "sql": _AGG + "l_discount BETWEEN 0.06 AND 0.08 AND l_quantity < 10",
        "pred": {
            "l_discount": (0.06, 0.08),
            "l_quantity": (None, 10.0),
        },
    },
}


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    out_root = argv[2] if len(argv) > 2 else "/tmp/sparkgraft-zorder"
    bits = int(argv[3]) if len(argv) > 3 else 8

    from aind_protein_data_transformation_spark.session import get_spark
    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.measure import interleaved_ab
    from aind_protein_data_transformation_spark.operators.layout import (
        layout_scan_fraction,
        zorder_layout,
    )

    spark = get_spark("exp-zorder")
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_shipdate", "l_discount", "l_quantity"]

    paths = {
        k: os.path.join(out_root, k)
        for k in ("natural", "bydate", "zorder", "hilbert")
    }
    rg = str(ROW_GROUP_BYTES)
    (li.repartition(NUM_FILES).write.mode("overwrite")
       .option("compression", "zstd").option("parquet.block.size", rg)
       .parquet(paths["natural"]))
    (li.repartitionByRange(NUM_FILES, "l_shipdate")
       .sortWithinPartitions("l_shipdate").write.mode("overwrite")
       .option("compression", "zstd").option("parquet.block.size", rg)
       .parquet(paths["bydate"]))
    zorder_layout(li, cols, paths["zorder"], bits=bits,
                  num_files=NUM_FILES, row_group_bytes=ROW_GROUP_BYTES)
    # same bins as the morton arm unless the requested bits exceed the
    # hilbert lookup cap — then the arms are NOT bin-comparable, so say so
    hilbert_bits = min(bits, 24 // len(cols))
    if hilbert_bits != bits:
        print(f"  NOTE: hilbert arm capped to {hilbert_bits} bits/col "
              f"(lookup cap); arms use different bins",
              file=sys.stderr, flush=True)
    zorder_layout(li, cols, paths["hilbert"], bits=hilbert_bits,
                  num_files=NUM_FILES, row_group_bytes=ROW_GROUP_BYTES,
                  curve="hilbert")

    for k, p in paths.items():
        spark.read.parquet(p).createOrReplaceTempView(f"li_{k}")

    out = {
        "experiment": "zorder_layout",
        "sf_dir": sf_dir,
        "bits": bits,
        "hilbert_bits": hilbert_bits,
        "row_group_bytes": ROW_GROUP_BYTES,
        "boxes": {},
    }
    for box_name, box in BOXES.items():
        geometry = {
            k: layout_scan_fraction(p, box["pred"]) for k, p in paths.items()
        }
        for k, g in geometry.items():
            print(f"  [{box_name}] {k}: "
                  f"{g['row_groups_kept']}/{g['row_groups']} row groups, "
                  f"{g['fraction_rows_kept']:.3f} of rows kept",
                  file=sys.stderr, flush=True)
        frames = {
            k: spark.sql(box["sql"].format(table=f"li_{k}")) for k in paths
        }
        timing = interleaved_ab(frames, rounds=6)
        # cross-layout result equality (layout must not change the answer)
        answers = {k: frames[k].collect()[0].asDict() for k in frames}
        base = answers["natural"]
        equal = all(
            abs(a["revenue"] - base["revenue"]) < 1e-6
            and a["n_rows"] == base["n_rows"]
            for a in answers.values()
        )
        out["boxes"][box_name] = {
            "answers_equal": equal,
            "n_rows_matching": base["n_rows"],
            "geometry": geometry,
            "timing": timing,
        }

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
