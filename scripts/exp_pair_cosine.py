#!/usr/bin/env python
"""Fold-vs-Arrow A/B for the PAIRWISE cosine projection (the IVF
verify stage: one cosine per already-joined (qe, ce) row). Companion
to exp_dim_dispatch (quantize) and exp_topk_gemm (top-k); anchors
PAIR_COSINE_UDF_MIN_DIM. The pair relation is materialized to parquet
first (both vectors in the row), so both candidates time ONLY the
projection, not the join.

Usage: python scripts/exp_pair_cosine.py [n_pairs] [rounds]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aind_protein_data_transformation_spark.functions.vector import dot, norm  # noqa: E402
from aind_protein_data_transformation_spark.measure import interleaved_ab  # noqa: E402
from aind_protein_data_transformation_spark.operators.similarity import (  # noqa: E402
    PAIR_COSINE_UDF_MIN_DIM,
    dispatch_by_dim,
    pair_cosine_batch_col,
)
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402

DIMS = [int(d) for d in os.environ.get("SPARK_GRAFT_DIMS", "64,128,256,512,1024").split(",")]


def main(argv: list[str]) -> int:
    n_pairs = int(argv[1]) if len(argv) > 1 else 100_000
    rounds = int(argv[2]) if len(argv) > 2 else 4
    spark = get_spark("exp-pair-cosine")
    out = {"metric": "pair_cosine_ab", "n_pairs": n_pairs, "rounds": rounds}
    sweep = {}
    try:
        for dim in DIMS:
            path = f"/tmp/sparkgraft-paircos/{n_pairs}x{dim}.parquet"
            if not os.path.isdir(path):
                spark.range(n_pairs).selectExpr(
                    "id AS pair_id",
                    f"transform(sequence(1, {dim}), "
                    "i -> cast(sin(id * i + 1) AS float)) AS qe",
                    f"transform(sequence(1, {dim}), "
                    "i -> cast(cos(id * i + 2) AS float)) AS ce",
                ).write.mode("overwrite").parquet(path)
            pairs = spark.read.parquet(path)
            fold = pairs.select(
                "pair_id",
                F.try_divide(dot("qe", "ce"), norm("qe") * norm("ce")).alias(
                    "cosine"
                ),
            )
            raw = pairs.select(
                "pair_id", pair_cosine_batch_col()(F.col("qe"), F.col("ce")).alias("_r")
            ).selectExpr(
                "pair_id", "IF(isnan(_r), CAST(NULL AS DOUBLE), _r) AS cosine"
            )
            res = interleaved_ab({"fold": fold, "udf": raw}, rounds=rounds)
            f, u = res["fold"]["best"], res["udf"]["best"]
            sweep[dim] = {
                "fold_s": f,
                "udf_s": u,
                "winner": "fold" if f <= u else "udf",
                "dispatch": dispatch_by_dim(dim, PAIR_COSINE_UDF_MIN_DIM),
            }
            print(
                f"  dim {dim}: fold {f}s udf {u}s -> {sweep[dim]['winner']}, "
                f"dispatch {sweep[dim]['dispatch']}",
                file=sys.stderr,
                flush=True,
            )
        out["sweep"] = sweep
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
