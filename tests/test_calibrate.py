"""calibrate_dispatch (VERDICT r7 #2): the crossover self-calibration
helper must reproduce the anchored dispatch winners on this layout —
HOF at dim-64, kernel at dim-1024 (the two points every round's
measurements agreed on even as the crossover between them moved with
layout) — and its bracketing rule must be exact on constructed sweeps.
"""

from __future__ import annotations

import pytest

from aind_protein_data_transformation_spark.calibrate import (
    FAMILIES,
    _crossover,
    calibrate_dispatch,
)
from aind_protein_data_transformation_spark.operators.similarity import (
    dispatch_by_dim,
)

DIMS = (64, 128, 256, 512, 1024)


def test_crossover_bracketing_rule():
    # the round-7 quantize bracket: hof through 512, kernel from 576
    assert _crossover((64, 512, 576, 1024), {
        64: "hof", 512: "hof", 576: "kernel", 1024: "kernel"
    }) == 544
    # kernel never stably wins -> the never-dispatch sentinel, NOT a
    # finite multiple of max(dims): a dim-4096 caller must not inherit
    # an extrapolated kernel flip the calibration never observed
    from aind_protein_data_transformation_spark.calibrate import KERNEL_NEVER

    assert _crossover(DIMS, {d: "hof" for d in DIMS}) == KERNEL_NEVER
    assert dispatch_by_dim(4096, KERNEL_NEVER) == "hof"
    # kernel wins everywhere -> dispatch kernel from the smallest dim
    assert _crossover(DIMS, {d: "kernel" for d in DIMS}) == 64
    # non-monotone noise below the stable run is ignored: the cut is
    # the smallest dim from which kernel wins at EVERY larger dim
    assert _crossover(DIMS, {
        64: "hof", 128: "kernel", 256: "hof", 512: "kernel", 1024: "kernel"
    }) == (256 + 512) // 2
    # a kernel win only at the top anchors the bracket there
    assert _crossover(DIMS, {
        64: "hof", 128: "hof", 256: "hof", 512: "hof", 1024: "kernel"
    }) == (512 + 1024) // 2


def test_crossover_rejects_unknown_family(spark):
    with pytest.raises(ValueError, match="unknown dispatch families"):
        calibrate_dispatch(spark, op="gemmify")


def test_calibrate_reproduces_decisive_winners(spark, tmp_path):
    """Timing-based, but ONLY on the anchors every round-7/8
    measurement reproduced with >=2.5x margins: quantize and
    pair_cosine hof@64 (Arrow transfer overhead dwarfs the fold at
    narrow dims) and topk kernel@1024 (one GEMM vs a 20k x 1024
    interpreted fold). The knife-edge points are deliberately NOT
    pinned — full-suite shared-session runs measured topk@64 flip to
    kernel by 5% (margin is 5-8% either way at 20k rows) and
    pair_cosine@1024 flip to hof (its crossover sits ~900 at 20k
    pairs; the decisive kernel regime is the 100k-pair volume the
    stored constant came from). Those regime-dependent points are
    exactly what calibrate_dispatch exists to measure on the caller's
    own environment — a unit test pinning them would just flake.

    The dispatch-consistency assertions below hold under EVERY
    knife-edge outcome: whichever way a marginal point lands, the
    bracketing rule must still route the decisive anchors correctly.

    quantize@64 turned out to be session-dependent too (round 11): a
    shared-session full-suite run on a degraded-JVM VM measured kernel
    0.576 vs hof 0.622 — an 8% flip of what standalone runs reproduce
    as a hof win (the JVM-side fold inherits the session's slowdown,
    the numpy kernel doesn't). So quantize@64 gets the knife-edge
    treatment: a hof win passes outright; a kernel win passes only
    within a 1.5x margin — a DECISIVE kernel win at dim 64 still fails,
    because that is the signature of a real HOF-path regression, not
    scheduling noise.

    A decisive-anchor miss re-measures ONCE before failing (round 12):
    a tail-of-suite shared-session run read the topk GEMM at 11.5s vs
    its reproducible ~2s — a 6x one-off (host CPU steal during the one
    BLAS call; the same test passed standalone minutes later and in
    both earlier full runs that day). One documented retry
    distinguishes that transient from a real regression — a genuine
    regression reproduces on the immediate re-measure; a scheduling
    spike does not."""

    def measure():
        return calibrate_dispatch(
            spark,
            op=("quantize", "topk", "pair_cosine"),
            dims=(64, 1024),
            n_rows=20_000,
            rounds=2,
            scratch_dir=str(tmp_path / "calib"),
        )

    def anchors_hold(res):
        q64 = res["quantize"]["sweep"][64]
        if q64["winner"] == "kernel" and not (
            q64["hof_s"] < 1.5 * q64["kernel_s"]
        ):
            return False
        if q64["winner"] != "kernel" and (
            dispatch_by_dim(64, res["quantize"]["kernel_min_dim"]) != "hof"
        ):
            return False
        return (
            res["pair_cosine"]["sweep"][64]["winner"] == "hof"
            and res["topk"]["sweep"][1024]["winner"] == "kernel"
            and dispatch_by_dim(64, res["pair_cosine"]["kernel_min_dim"]) == "hof"
            and dispatch_by_dim(1024, res["topk"]["kernel_min_dim"]) == "kernel"
        )

    res = measure()
    assert set(res) == {"quantize", "topk", "pair_cosine"}
    if not anchors_hold(res):
        first = res
        res = measure()
        assert anchors_hold(res), (
            "decisive anchors failed twice in a row — a real regression, "
            "not a scheduling spike", first, res,
        )


def test_calibrate_srp_kernel_everywhere(spark, tmp_path):
    """The srp family's measured shape is DIFFERENT from the other
    three: the fold does O(n_bits * dim) interpreted multiply-adds per
    row (32 hyperplane dot products), so the GEMM twin wins from
    dim-64 up (measured 2x at 64, ~200x at 1024 on this layout —
    the 1024 point is asserted once in BENCH.md, not here, because the
    fold leg alone costs ~90s/run). Calibration must report
    kernel-everywhere: kernel_min_dim == min(dims), and dispatch_by_dim
    routes even the smallest dim to the kernel."""
    res = calibrate_dispatch(
        spark,
        op="srp",
        dims=(64, 128),
        n_rows=20_000,
        rounds=2,
        scratch_dir=str(tmp_path / "calib_srp"),
    )
    assert set(res) == {"srp"}
    sweep = res["srp"]["sweep"]
    assert sweep[64]["winner"] == "kernel", sweep
    assert sweep[128]["winner"] == "kernel", sweep
    cut = res["srp"]["kernel_min_dim"]
    assert cut == 64, (cut, sweep)
    assert dispatch_by_dim(64, cut) == "kernel"
    assert set(FAMILIES) == {"quantize", "topk", "pair_cosine", "srp"}
