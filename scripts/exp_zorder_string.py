#!/usr/bin/env python
"""The string-surrogate cluster key at the 10x corpus scale (round 13).

Round 13 made STRING columns first-class z-order keys via an
order-preserving 6-byte UTF-8 prefix surrogate (layout._numeric_expr).
The unit fixtures pin the mechanics; this measures the payoff on the
10x text corpus with a HIGH-cardinality string axis — the regime the
surrogate exists for (a 20-value column should partitionBy instead,
per the operator docstring).

Corpus: the bench_text10 layout (50k docs, real text payload bytes —
the expensive column a curation re-scan reads). Each doc gets a
deterministic web-crawl-shaped domain key, ``md5(doc_id)[:8] +
'.example'`` (50k near-distinct domains, uniform over hex), plus the
usual n_tokens feature.

Arms (256 KB row groups, 8 files):
- ``arrival``  — doc_id order (the naive store)
- ``bydomain`` — single-key sort on the STRING domain
- ``hilbert``  — 2-D Hilbert on (domain, n_tokens), ``bits=None``
  (the round-13 law-sized DEFAULT, exercised live at scale)

Boxes (deterministic footer geometry, zero timing noise):
- ``both``        — domain range ('2','6'] ~ 25% of domains AND the
  middle n_tokens band: the curation-pass shape; single-key prunes one
  term, 2-D prunes both
- ``tokens_only`` — the band a domain-sorted store cannot prune at all
- ``domain_only`` — the single-key arm's home turf (its perfect-prune
  bound; the 2-D arm pays the bounded locality tax)

Usage: python scripts/exp_zorder_string.py [docs_dir] [out_root]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

ROW_GROUP_BYTES = 256 * 1024
NUM_FILES = 8


def main(argv: list[str]) -> int:
    docs_dir = argv[1] if len(argv) > 1 else "/tmp/sparkgraft-text10"
    out_root = argv[2] if len(argv) > 2 else "/tmp/sparkgraft-zorder-str"

    if not os.path.isdir(os.path.join(docs_dir, "documents.parquet")):
        import bench_text10 as bt

        print(f"generating 10x documents -> {docs_dir}",
              file=sys.stderr, flush=True)
        bt.scale_documents("/root/testdata/sf0.1", docs_dir)

    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.session import get_spark
    from aind_protein_data_transformation_spark.operators.layout import (
        layout_scan_fraction,
        zorder_layout,
    )

    spark = get_spark("exp-zorder-string")
    docs = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    feats = docs.select(
        "doc_id", "text", "lang", "source",
        F.concat(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                 F.lit(".example")).alias("domain"),
        F.size(toks).cast("double").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    feats.persist()
    n_rows = feats.count()

    tq = feats.approxQuantile("n_tokens", [0.32, 0.68], 0.001)
    tok_lo, tok_hi = tq[0], tq[1]
    boxes = {
        "both": {"domain": ("2", "6"), "n_tokens": (tok_lo, tok_hi)},
        "tokens_only": {"n_tokens": (tok_lo, tok_hi)},
        "domain_only": {"domain": ("2", "6")},
    }

    paths = {k: os.path.join(out_root, k)
             for k in ("arrival", "bydomain", "hilbert")}
    rg = str(ROW_GROUP_BYTES)
    (feats.repartitionByRange(NUM_FILES, "doc_id")
          .sortWithinPartitions("doc_id").write.mode("overwrite")
          .option("compression", "zstd").option("parquet.block.size", rg)
          .parquet(paths["arrival"]))
    (feats.repartitionByRange(NUM_FILES, "domain")
          .sortWithinPartitions("domain").write.mode("overwrite")
          .option("compression", "zstd").option("parquet.block.size", rg)
          .parquet(paths["bydomain"]))
    # bits=None: the law-sized default, live at scale (hilbert caps it
    # at 24 total bits automatically)
    zorder_layout(feats, ["domain", "n_tokens"], paths["hilbert"],
                  num_files=NUM_FILES, row_group_bytes=ROW_GROUP_BYTES,
                  curve="hilbert")
    feats.unpersist()

    out = {
        "experiment": "zorder_string_key",
        "docs_dir": docs_dir,
        "n_rows": n_rows,
        "token_band": [tok_lo, tok_hi],
        "boxes": {},
    }
    for box_name, pred in boxes.items():
        geometry = {k: layout_scan_fraction(p, pred)
                    for k, p in paths.items()}
        for k, g in geometry.items():
            print(f"  [{box_name}] {k}: "
                  f"{g['row_groups_kept']}/{g['row_groups']} groups, "
                  f"{g['fraction_rows_kept']:.3f} kept",
                  file=sys.stderr, flush=True)
        # correctness: identical answers from every arm
        filt = None
        for col, (lo, hi) in pred.items():
            c = (F.col(col) >= lo) & (F.col(col) <= hi)
            filt = c if filt is None else (filt & c)
        counts = {k: spark.read.parquet(p).filter(filt).count()
                  for k, p in paths.items()}
        assert len(set(counts.values())) == 1, counts
        out["boxes"][box_name] = {
            "rows_in_box": counts["arrival"],
            "kept_fraction": {k: round(g["fraction_rows_kept"], 4)
                              for k, g in geometry.items()},
        }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
