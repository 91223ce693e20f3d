#!/usr/bin/env python
"""Dim sweep for the quantize HOF-vs-Arrow-kernel crossover
(VERDICT r6 #2): measure both implementations at a ladder of embedding
dims with the shared interleaved order-alternated harness, report which
side wins at each dim, and check that `quantize_dispatch_dim` picks the
measured winner at the two anchored points (dim-64: HOF, dim-1024:
kernel — the round-6 BENCH.md measurements the dispatch threshold
encodes).

Corpus: 20k synthetic vectors per dim (the 10x-scale regime where the
round-6 crossover was measured), written to parquet first so generation
cost is outside both timed plans.

Usage: python scripts/exp_dim_dispatch.py [n_rows] [rounds]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from aind_protein_data_transformation_spark.measure import interleaved_ab  # noqa: E402
from aind_protein_data_transformation_spark.operators.similarity import (  # noqa: E402
    quantize_dispatch_dim,
    quantize_int8_batch,
    quantize_int8_hof,
)
from aind_protein_data_transformation_spark.session import get_spark  # noqa: E402

DIMS = [int(d) for d in os.environ.get("SPARK_GRAFT_DIMS", "64,128,192,256,512,1024").split(",")]


def main(argv: list[str]) -> int:
    n_rows = int(argv[1]) if len(argv) > 1 else 20_000
    rounds = int(argv[2]) if len(argv) > 2 else 4
    spark = get_spark("exp-dim-dispatch")
    out = {"metric": "quantize_dim_crossover", "n_rows": n_rows, "rounds": rounds}
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
            res = interleaved_ab(
                {
                    "hof": quantize_int8_hof(emb),
                    "kernel": quantize_int8_batch(emb),
                },
                rounds=rounds,
            )
            hof, kern = res["hof"]["best"], res["kernel"]["best"]
            winner = "hof" if hof <= kern else "kernel"
            sweep[dim] = {
                "hof_s": hof,
                "kernel_s": kern,
                "winner": winner,
                "dispatch": quantize_dispatch_dim(dim),
            }
            print(
                f"  dim {dim}: hof {hof}s kernel {kern}s -> winner {winner}, "
                f"dispatch {sweep[dim]['dispatch']}",
                file=sys.stderr,
                flush=True,
            )
        out["sweep"] = sweep
        # the two anchored points from the round-6 measurement must be
        # reproduced AND matched by the dispatch rule
        out["dispatch_matches_winner_at_64"] = (
            sweep[64]["dispatch"] == sweep[64]["winner"]
        )
        out["dispatch_matches_winner_at_1024"] = (
            sweep[1024]["dispatch"] == sweep[1024]["winner"]
        )
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
