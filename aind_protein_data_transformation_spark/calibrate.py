"""Self-calibration for the HOF-vs-Arrow-kernel dispatch crossovers
(VERDICT r7 #2).

The three dispatch constants in operators/similarity.py
(``QUANTIZE_KERNEL_MIN_DIM``, ``TOPK_GEMM_MIN_DIM``,
``PAIR_COSINE_UDF_MIN_DIM``) are measurements, and round 7 proved they
are LAYOUT-dependent: the quantize kernel's dim-1024 win was 4.7x on a
10-file pyarrow layout and only 1.3-1.45x on a 32-part spark-written
layout, moving the break-even from under 256 to ~544. A production
caller on a different cluster/layout inheriting this VM's constants may
sit on the wrong side of their own crossover.

:func:`calibrate_dispatch` closes that portability gap: it re-runs the
same interleaved order-alternated A/B ladder the constants came from
(:func:`~aind_protein_data_transformation_spark.measure.interleaved_ab` — warmup-first,
interleaved within rounds, order rotated across rounds) on the
CALLER's session and data layout, and returns measured
``kernel_min_dim`` values to pass to ``quantize_int8_auto`` /
``brute_force_topk_auto`` / ``ivf_topk(verify_batch=None)``.

Measurement hygiene: each dim's input is MATERIALIZED to parquet before
either candidate is timed, so vector-resizing cost is outside both
timed plans, and the write preserves the source frame's partition
count — the file-count/partition shape round 7 showed moves the
crossover. Every candidate is timed through the CALLABLE form (plan
rebuilt per run), so eager construction work — the GEMM twins' driver
collects and weight-matrix builds, the folds' dim probes — is billed
inside the window on both sides, exactly as a production call pays it. With ``sample_df`` the ladder inherits the caller's own
layout (their sample, re-dimensioned by JVM-side tiling); without it a
synthetic corpus at the session's default parallelism stands in.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .measure import interleaved_ab
from .operators.similarity import (
    brute_force_topk,
    brute_force_topk_gemm,
    pair_cosine_batch_col,
    quantize_int8_batch,
    quantize_int8_hof,
    srp_band_vals,
    srp_band_vals_gemm,
)

#: The dispatch families and the ``*_auto`` / operator parameter each
#: calibrated value feeds.
FAMILIES = ("quantize", "topk", "pair_cosine", "srp")

#: The default sweep: the three families with a real crossover to
#: find. ``srp`` is opt-in — its fold leg costs O(n_bits * dim)
#: interpreted work per row (~90 s/run at dim-1024 x 20k rows) and the
#: measured verdict is kernel-everywhere, so sweeping it by default
#: would spend ~10 minutes re-deriving a known constant; pass
#: ``op="srp"`` (on small dims) to measure it deliberately.
DEFAULT_FAMILIES = ("quantize", "topk", "pair_cosine")

DEFAULT_DIMS = (64, 128, 192, 256, 384, 512, 768, 1024)

#: kernel_min_dim sentinel when the kernel never stably won: dispatch
#: must stay on the HOF at EVERY dim, including dims far beyond the
#: tested ladder — ``2 * max(dims)`` (the old sentinel) silently
#: re-enabled the kernel for a dim-4096 caller whose calibration saw
#: it LOSE everywhere up to 1024. An extrapolated flip the calibration
#: never observed is exactly what this module exists to prevent.
KERNEL_NEVER = 1 << 31


def _resize_expr(vec_col: str, dim: int) -> str:
    """JVM-side tiling of an existing vector column to ``dim`` floats
    (wraparound element_at) — keeps the ladder's values derived from
    the caller's data without any Python in the resize."""
    return (
        f"transform(sequence(1, {dim}), i -> "
        f"cast(element_at({vec_col}, ((i - 1) % size({vec_col})) + 1) "
        f"AS float))"
    )


def _materialize(df: DataFrame, path: str) -> DataFrame:
    """Write-then-read so generation/resizing cost is outside both
    timed candidates; the write preserves df's partition count (one
    file per task), i.e. the layout under calibration."""
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def _crossover(dims: Sequence[int], winners: dict[int, str]) -> int:
    """Smallest dim from which the kernel wins at EVERY larger measured
    dim, bracketed to the midpoint with the last hof-winning dim below
    it (the rule that produced 544 from the round-7 512/576 bracket).

    - kernel never stably wins -> :data:`KERNEL_NEVER`: the dispatch
      stays on the HOF at every dim, however far beyond the tested
      range — a finite multiple of max(dims) would extrapolate a
      kernel flip the calibration never observed;
    - kernel wins everywhere -> ``min(dims)``.
    """
    cut = None
    for d in sorted(dims, reverse=True):
        if winners[d] == "kernel":
            cut = d
        else:
            break
    if cut is None:
        return KERNEL_NEVER
    below = [d for d in dims if d < cut]
    if not below:
        return min(dims)
    return (max(below) + cut) // 2


def calibrate_dispatch(
    spark,
    sample_df: DataFrame | None = None,
    op: str | Sequence[str] = DEFAULT_FAMILIES,
    dims: Sequence[int] = DEFAULT_DIMS,
    n_rows: int = 20_000,
    rounds: int = 2,
    vec_col: str = "embedding",
    n_queries: int = 5,
    k: int = 10,
    scratch_dir: str = "/tmp/sparkgraft-calibrate",
) -> dict[str, dict]:
    """Measure the HOF-vs-kernel crossover(s) on THIS session + layout.

    ``sample_df``: a representative frame holding ``vec_col``
    (``array<float>``) — its values are tiled to each ladder dim and
    its partitioning carries into every materialized input, so the
    measurement reflects the caller's layout. ``None`` synthesizes
    ``n_rows`` vectors at the session's default parallelism (the
    exp_dim_dispatch corpus shape).

    ``op``: one family name or a sequence of them — ``"quantize"``
    (-> ``quantize_int8_auto(kernel_min_dim=...)``), ``"topk"``
    (-> ``brute_force_topk_auto(gemm_min_dim=...)``), ``"pair_cosine"``
    (-> ``ivf_topk(pair_min_dim=...)``), ``"srp"`` (-> pick
    ``srp_band_vals`` below the crossover, ``srp_band_vals_gemm``
    at/above it). Measured caveat for ``"srp"``: unlike the other
    three families the fold side does O(n_bits * dim) interpreted
    multiply-adds PER ROW (32 dot products, not one), so on this
    layout the kernel wins from dim-64 (2x) through dim-1024 (~200x;
    the fold leg alone runs ~90s per execution at dim-1024 x 20k
    rows) — ``kernel_min_dim`` comes back as ``min(dims)`` and the
    fold form's value is oracle replayability, not dispatch. Sweep
    srp on small dims (<=256) unless you are paying the fold's cost
    deliberately.

    Returns ``{family: {"kernel_min_dim": int, "sweep": {dim:
    {"hof_s", "kernel_s", "winner"}}}}``. ``kernel_min_dim`` is
    :data:`KERNEL_NEVER` when the kernel never stably won (dispatch
    stays on the HOF at every dim — no extrapolated flip beyond the
    tested range) and ``min(dims)`` when it always won. Scratch parquet stays under ``scratch_dir`` (overwritten per
    call, safe to delete).

    Cost: ~(warmup + rounds rounded up to a multiple of 2) executions
    of both candidates per (family, dim), plus one materializing write
    per (family, dim) — minutes, not hours; run it once per
    cluster/layout change, not per job.
    """
    ops = (op,) if isinstance(op, str) else tuple(op)
    unknown = [o for o in ops if o not in FAMILIES]
    if unknown:
        raise ValueError(f"unknown dispatch families {unknown}; pick from {FAMILIES}")
    if sample_df is None:
        src = spark.range(n_rows).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 64), "
            "i -> cast(sin(id * i + 1) AS float)) AS embedding",
        )
        vec_col_src = "embedding"
        tag = f"synth{n_rows}"
    else:
        src = sample_df
        vec_col_src = vec_col
        tag = "sample"

    out: dict[str, dict] = {o: {"sweep": {}} for o in ops}
    for dim in dims:
        base = os.path.join(scratch_dir, f"{tag}x{dim}")
        emb = None
        if "quantize" in ops or "topk" in ops or "srp" in ops:
            emb = _materialize(
                src.selectExpr(
                    "monotonically_increasing_id() AS vec_id",
                    f"{_resize_expr(vec_col_src, dim)} AS embedding",
                ),
                f"{base}-emb.parquet",
            )
        if "quantize" in ops:
            # every candidate goes through the CALLABLE form: the plan
            # is rebuilt each run, so eager driver-side construction
            # work (dim probes, weight-matrix builds, query collects)
            # is billed INSIDE the timed window on BOTH sides — the
            # measure.py eager-plan rule. Prepared frames prepaid the
            # kernel twins' collects outside the timings, shaving the
            # kernel side near the knife edge (review finding).
            res = interleaved_ab(
                {
                    "hof": lambda e=emb: quantize_int8_hof(e),
                    "kernel": lambda e=emb: quantize_int8_batch(e),
                },
                rounds=rounds,
            )
            out["quantize"]["sweep"][dim] = _verdict(res)
        if "topk" in ops:
            corpus = emb.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
            )
            qdf = _materialize(
                emb.limit(n_queries).select(
                    F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
                ),
                f"{base}-queries.parquet",
            )
            res = interleaved_ab(
                {
                    "hof": lambda q=qdf, c=corpus: brute_force_topk(q, c, k=k),
                    "kernel": lambda q=qdf, c=corpus: brute_force_topk_gemm(
                        q, c, k=k
                    ),
                },
                rounds=rounds,
            )
            out["topk"]["sweep"][dim] = _verdict(res)
        if "srp" in ops:
            res = interleaved_ab(
                {
                    "hof": lambda e=emb: srp_band_vals(e, "vec_id", "embedding"),
                    "kernel": lambda e=emb: srp_band_vals_gemm(
                        e, "vec_id", "embedding"
                    ),
                },
                rounds=rounds,
            )
            out["srp"]["sweep"][dim] = _verdict(res)
        if "pair_cosine" in ops:
            from .functions.vector import dot, norm

            pairs = _materialize(
                src.selectExpr(
                    "monotonically_increasing_id() AS pair_id",
                    f"{_resize_expr(vec_col_src, dim)} AS qe",
                    f"reverse({_resize_expr(vec_col_src, dim)}) AS ce",
                ),
                f"{base}-pairs.parquet",
            )
            def _fold(p=pairs):
                return p.select(
                    "pair_id",
                    F.try_divide(
                        dot("qe", "ce"), norm("qe") * norm("ce")
                    ).alias("cosine"),
                )

            def _raw(p=pairs):
                return p.select(
                    "pair_id",
                    pair_cosine_batch_col()(F.col("qe"), F.col("ce")).alias(
                        "_r"
                    ),
                ).selectExpr(
                    "pair_id",
                    "IF(isnan(_r), CAST(NULL AS DOUBLE), _r) AS cosine",
                )

            res = interleaved_ab({"hof": _fold, "kernel": _raw}, rounds=rounds)
            out["pair_cosine"]["sweep"][dim] = _verdict(res)

    for o in ops:
        winners = {d: v["winner"] for d, v in out[o]["sweep"].items()}
        out[o]["kernel_min_dim"] = _crossover(dims, winners)
    return out


def _verdict(res: dict[str, dict[str, float]]) -> dict:
    hof, kern = res["hof"]["best"], res["kernel"]["best"]
    return {
        "hof_s": hof,
        "kernel_s": kern,
        "winner": "hof" if hof <= kern else "kernel",
    }
