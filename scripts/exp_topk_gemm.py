#!/usr/bin/env python
"""HOF-vs-GEMM A/B for exact cosine top-k (brute_force_topk vs
brute_force_topk_gemm) at narrow and wide dims — the companion
measurement to the quantize dim sweep (scripts/exp_dim_dispatch.py),
run with the shared interleaved order-alternated harness. Reuses the
synthetic corpora exp_dim_dispatch writes under /tmp/sparkgraft-quantdim
(generating any that are missing).

Usage: python scripts/exp_topk_gemm.py [n_rows] [rounds]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aind_protein_data_transformation_spark.measure import interleaved_ab  # noqa: E402
from aind_protein_data_transformation_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    brute_force_topk_gemm,
)
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402

DIMS = [int(d) for d in os.environ.get("SPARK_GRAFT_DIMS", "64,1024").split(",")]


def main(argv: list[str]) -> int:
    n_rows = int(argv[1]) if len(argv) > 1 else 20_000
    rounds = int(argv[2]) if len(argv) > 2 else 3
    spark = get_spark("exp-topk-gemm")
    out = {"metric": "topk_gemm_ab", "n_rows": n_rows, "rounds": rounds}
    sweep = {}
    try:
        for dim in DIMS:
            path = f"/tmp/sparkgraft-quantdim/{n_rows}x{dim}.parquet"
            if not os.path.isdir(path):
                spark.range(n_rows).selectExpr(
                    "id AS vec_id",
                    f"transform(sequence(1, {dim}), "
                    "i -> cast(sin(id * i + 1) AS float)) AS embedding",
                ).write.mode("overwrite").parquet(path)
            emb = spark.read.parquet(path)
            q = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
            )
            c = emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ce"),
            )
            res = interleaved_ab(
                {
                    "hof": brute_force_topk(q, c, k=10),
                    # rebuilt per run: the guarded query collect is eager
                    "gemm": lambda q=q, c=c: brute_force_topk_gemm(q, c, k=10),
                },
                rounds=rounds,
            )
            hof, gemm = res["hof"]["best"], res["gemm"]["best"]
            sweep[dim] = {
                "hof_s": hof,
                "gemm_s": gemm,
                "winner": "hof" if hof <= gemm else "gemm",
            }
            print(f"  dim {dim}: hof {hof}s gemm {gemm}s", file=sys.stderr, flush=True)
        out["sweep"] = sweep
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
