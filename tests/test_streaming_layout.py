"""Streaming ingest into a clustered store — the composition the
layout operator exists for at 100 TB: Structured Streaming lands each
micro-batch through ``foreachBatch`` + ``zorder_layout(mode="append",
edges=<shared>)``, so the lake table is ALREADY clustered as it
arrives (no post-hoc re-layout pass), every micro-batch shares one key
space (the ``edges=`` snapshot from the first batch), and history is
never re-shuffled.

Claims pinned:
- multi-micro-batch replay (maxFilesPerTrigger=1 over a time-split
  events fixture) lands the exact row multiset the batch table holds;
- the landed store PRUNES a (user_id, value) box the arrival-order
  store cannot (deterministic footer geometry);
- all micro-batches after the first reuse the first batch's edges —
  no per-batch sketch pass (counted via a wrapper).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import aind_protein_data_transformation_spark.streaming.events as events_mod
from aind_protein_data_transformation_spark.catalog import load_table
from aind_protein_data_transformation_spark.operators import layout as layout_mod
from aind_protein_data_transformation_spark.operators.layout import (
    layout_scan_fraction,
    zorder_layout,
)
from aind_protein_data_transformation_spark.streaming.events import (
    read_events_stream,
    stream_replay_options,
)

N_FILES = 4


@pytest.fixture(scope="module")
def split_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    """Events split into N_FILES time-ordered part files (same recipe
    as tests/test_streaming_multibatch.py) so maxFilesPerTrigger=1
    replays one micro-batch per file."""
    root = tmp_path_factory.mktemp("layout_stream_sf")
    events_dir = os.path.join(str(root), "events.parquet")
    ev = load_table(spark, sf_dir, "events")
    bucketed = ev.withColumn(
        "bucket", F.ntile(N_FILES).over(Window.orderBy("ts", "event_id"))
    )
    base_mtime = 1_700_000_000
    for b in range(1, N_FILES + 1):
        before = set(os.listdir(events_dir)) if os.path.isdir(events_dir) else set()
        (
            bucketed.filter(F.col("bucket") == b)
            .drop("bucket")
            .coalesce(1)
            .write.mode("append")
            .parquet(events_dir)
        )
        for name in set(os.listdir(events_dir)) - before:
            if name.endswith(".parquet"):
                os.utime(os.path.join(events_dir, name),
                         (base_mtime + b, base_mtime + b))
    yield str(root)
    shutil.rmtree(str(root), ignore_errors=True)


def test_stream_lands_clustered(spark, split_sf_dir, tmp_path):
    out = str(tmp_path / "clustered_lake")
    naive = str(tmp_path / "arrival_lake")
    ckpt = str(tmp_path / "ckpt")
    cols = ["user_id", "value"]
    state = {"edges": None, "sketch_passes": 0, "batches": 0}

    real_quantile_bin_edges = layout_mod.quantile_bin_edges

    def counting_quantile_bin_edges(*a, **kw):
        state["sketch_passes"] += 1
        return real_quantile_bin_edges(*a, **kw)

    def land(batch_df, batch_id):
        state["batches"] += 1
        state["edges"] = zorder_layout(
            batch_df, cols, out, bits=5, num_files=1,
            row_group_bytes=8 * 1024, mode="append",
            edges=state["edges"],
        )
        (batch_df.write.mode("append")
         .option("parquet.block.size", str(8 * 1024)).parquet(naive))

    layout_mod.quantile_bin_edges = counting_quantile_bin_edges
    try:
        with stream_replay_options(maxFilesPerTrigger=1):
            q = (
                read_events_stream(spark, split_sf_dir)
                .writeStream.foreachBatch(land)
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
    finally:
        layout_mod.quantile_bin_edges = real_quantile_bin_edges

    assert state["batches"] >= N_FILES
    # one sketch pass total: batch 1 computed edges, the rest reused
    assert state["sketch_passes"] == 1

    # exactly-once multiset: the clustered lake equals the batch table
    ev = load_table(spark, split_sf_dir, "events")
    landed = spark.read.parquet(out)
    assert landed.count() == ev.count()
    fp = lambda d: tuple(d.agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64(F.to_json(F.struct(*sorted(d.columns))))
              .cast("decimal(38,0)")),
    ).collect()[0])
    assert fp(landed.select(*ev.columns)) == fp(ev)

    # the clustered lake prunes a box the arrival-order lake cannot
    lo, hi = ev.approxQuantile("value", [0.3, 0.5], 0.01)
    uid_hi = ev.approxQuantile([ "user_id"], [0.25], 0.01)[0][0]
    box = {"value": (lo, hi), "user_id": (None, float(uid_hi))}
    g_clustered = layout_scan_fraction(out, box)
    g_naive = layout_scan_fraction(naive, box)
    assert g_clustered["rows"] == g_naive["rows"]
    assert g_clustered["row_groups"] >= 8
    # each micro-batch is only ~2.5k rows at this fixture size, so the
    # per-batch tiling is coarse — the pinned claim is the CONTRAST
    # (the arrival-order lake keeps ~everything, the clustered lake
    # skips), not the asymptotic fraction (that slope is measured at
    # scale in scripts/exp_zorder_incremental.py)
    assert g_naive["fraction_rows_kept"] > 0.8
    assert g_clustered["fraction_rows_kept"] < 0.7
    assert (g_clustered["fraction_rows_kept"]
            < g_naive["fraction_rows_kept"] - 0.2)


def test_batch_keyed_landing_is_replay_idempotent(spark, split_sf_dir, tmp_path):
    """The registered streaming_clustered_ingest query lands each
    micro-batch as an OVERWRITE of its own ``batch=<id>`` unit.
    foreachBatch is at-least-once under crash replay, so the pinned
    claim is: a replayed batch — including one whose first attempt
    landed only partially before the crash — leaves the lake multiset
    exactly equal to one copy of the source, and a replay of an
    already-fully-landed batch changes nothing."""
    lake = str(tmp_path / "lake")
    cols = ["user_id", "value"]
    ev = load_table(spark, split_sf_dir, "events")
    batches = [
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i)
        for i in range(3)
    ]

    def land(batch_df, batch_id, edges):
        return zorder_layout(
            batch_df, cols, f"{lake}/batch={batch_id}",
            bits=5, num_files=1, mode="overwrite", edges=edges,
        )

    def fp(d):
        cols_all = sorted(d.columns)
        return tuple(d.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(F.to_json(F.struct(*cols_all)))
                  .cast("decimal(38,0)")),
        ).collect()[0])

    edges = land(batches[0], 0, None)
    # batch 1's first attempt "crashes" after landing a partial unit
    land(batches[1].limit(50), 1, edges)
    # replay (at-least-once): the full batch OVERWRITES its own unit
    land(batches[1], 1, edges)
    land(batches[2], 2, edges)
    landed = spark.read.parquet(f"{lake}/batch=*")
    assert fp(landed.select(*ev.columns)) == fp(ev)

    # replaying an already-fully-landed batch is a no-op on the multiset
    land(batches[2], 2, edges)
    landed = spark.read.parquet(f"{lake}/batch=*")
    assert fp(landed.select(*ev.columns)) == fp(ev)


def test_edge_snapshot_survives_restart(spark, split_sf_dir, tmp_path):
    """The persisted edge snapshot makes the ingest restartable in ONE
    key space: phase 1 (fresh lake) sketches once and saves
    ``_edges.json``; phase 2 simulates a driver restart (empty memory,
    same lake) and must land its batches with ZERO new sketch passes,
    reusing the loaded snapshot — so every unit before and after the
    restart shares the exact same key geometry."""
    from aind_protein_data_transformation_spark.operators.layout import (
        load_edge_snapshot,
        save_edge_snapshot,
    )

    lake = str(tmp_path / "lake")
    cols = ["user_id", "value"]
    ev = load_table(spark, split_sf_dir, "events")
    batches = [
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i)
        for i in range(4)
    ]

    real_quantile_bin_edges = layout_mod.quantile_bin_edges
    passes = {"n": 0}

    def counting(*a, **kw):
        passes["n"] += 1
        return real_quantile_bin_edges(*a, **kw)

    def run_phase(batch_ids):
        # what streaming_clustered_ingest's foreachBatch closure does,
        # from a COLD start: load-or-None, sketch only if None, save
        edges = load_edge_snapshot(lake, spark)
        for bid in batch_ids:
            fresh = edges is None
            edges = zorder_layout(
                batches[bid], cols, f"{lake}/batch={bid}",
                bits=5, num_files=1, mode="overwrite", edges=edges,
            )
            if fresh:
                save_edge_snapshot(lake, edges, spark)
        return edges

    layout_mod.quantile_bin_edges = counting
    try:
        e1 = run_phase([0, 1])
        assert passes["n"] == 1            # one sketch, then saved
        e2 = run_phase([2, 3])             # "restart": empty memory
        assert passes["n"] == 1            # reloaded, NO re-sketch
    finally:
        layout_mod.quantile_bin_edges = real_quantile_bin_edges
    assert e2 == e1                         # one key space across restart
    assert load_edge_snapshot(lake, spark) == e1

    # and the landed lake is exactly one copy of the source
    landed = spark.read.parquet(f"{lake}/batch=*")
    assert landed.count() == ev.count()


def test_compact_ingest_units_folds_and_preserves(spark, split_sf_dir, tmp_path):
    """The ingest-side compactor: folding the older batch units into
    one re-clustered unit preserves the glob-read multiset exactly,
    keeps the hot tail untouched, names the folded unit by its id
    range, and reuses the persisted edge snapshot (no new sketch)."""
    from aind_protein_data_transformation_spark.operators.layout import (
        compact_ingest_units,
        load_edge_snapshot,
        save_edge_snapshot,
    )

    lake = str(tmp_path / "lake")
    cols = ["user_id", "value"]
    ev = load_table(spark, split_sf_dir, "events")
    batches = [
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i)
        for i in range(4)
    ]
    edges = None
    for i, b in enumerate(batches):
        edges = zorder_layout(
            b, cols, f"{lake}/batch={i}", bits=5, num_files=1,
            mode="overwrite", edges=edges,
        )
    save_edge_snapshot(lake, edges, spark)

    def fp(d):
        cs = sorted(d.columns)
        return tuple(d.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(F.to_json(F.struct(*cs)))
                  .cast("decimal(38,0)")),
        ).collect()[0])

    before = fp(spark.read.parquet(f"{lake}/batch=*"))

    real_sketch = layout_mod.quantile_bin_edges
    passes = {"n": 0}
    layout_mod.quantile_bin_edges = (
        lambda *a, **kw: (passes.__setitem__("n", passes["n"] + 1)
                          or real_sketch(*a, **kw))
    )
    try:
        report = compact_ingest_units(lake, cols, spark, bits=5,
                                      num_files=1, keep_last=1)
    finally:
        layout_mod.quantile_bin_edges = real_sketch
    assert passes["n"] == 0                    # snapshot reused, no sketch
    assert report["folded"] == 3
    assert report["unit"] == "batch=c0-2"
    assert report["edges"] == edges
    names = sorted(n for n in os.listdir(lake) if n.startswith("batch="))
    assert names == ["batch=3", "batch=c0-2"]
    assert fp(spark.read.parquet(f"{lake}/batch=*")) == before

    # fewer than 2 candidates: no-op
    report2 = compact_ingest_units(lake, cols, spark, bits=5, keep_last=1)
    assert report2["folded"] == 0 and report2["unit"] is None

    # a later fold subsumes the earlier folded unit + the matured tail
    zorder_layout(batches[0].limit(40), cols, f"{lake}/batch=4",
                  bits=5, num_files=1, mode="overwrite", edges=edges)
    before2 = fp(spark.read.parquet(f"{lake}/batch=*"))
    report3 = compact_ingest_units(lake, cols, spark, bits=5,
                                   num_files=1, keep_last=1)
    assert report3["folded"] == 2              # c0-2 + batch=3
    assert report3["unit"] == "batch=c0-3"
    names = sorted(n for n in os.listdir(lake) if n.startswith("batch="))
    assert names == ["batch=4", "batch=c0-3"]
    assert fp(spark.read.parquet(f"{lake}/batch=*")) == before2


def test_compact_ingest_units_repairs_crash_leftovers(spark, split_sf_dir, tmp_path):
    """Crash between the fold's rename and its deletes leaves the
    subsumed originals next to the folded unit (duplicates visible).
    The NEXT call's repair pass removes exactly the contained units
    before choosing candidates, so the retry converges and the glob
    multiset returns to one copy."""
    from aind_protein_data_transformation_spark.operators.layout import (
        compact_ingest_units,
    )

    lake = str(tmp_path / "lake")
    cols = ["user_id", "value"]
    ev = load_table(spark, split_sf_dir, "events")
    batches = [
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    edges = None
    for i, b in enumerate(batches):
        edges = zorder_layout(
            b, cols, f"{lake}/batch={i}", bits=5, num_files=1,
            mode="overwrite", edges=edges,
        )

    def fp(d):
        cs = sorted(d.columns)
        return tuple(d.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(F.to_json(F.struct(*cs)))
                  .cast("decimal(38,0)")),
        ).collect()[0])

    one_copy = fp(spark.read.parquet(f"{lake}/batch=*"))

    # simulate the crash state: the fold of batches 0-1 completed its
    # rename but died before deleting the originals
    union01 = spark.read.parquet(f"{lake}/batch=0", f"{lake}/batch=1")
    zorder_layout(union01, cols, f"{lake}/batch=c0-1", bits=5,
                  num_files=1, mode="overwrite", edges=edges)
    dup = fp(spark.read.parquet(f"{lake}/batch=*"))
    assert dup != one_copy                     # duplicates ARE visible

    report = compact_ingest_units(lake, cols, spark, bits=5,
                                  num_files=1, keep_last=1)
    assert sorted(report["repaired"]) == ["batch=0", "batch=1"]
    assert fp(spark.read.parquet(f"{lake}/batch=*")) == one_copy
    names = sorted(n for n in os.listdir(lake) if n.startswith("batch="))
    # after repair the candidates were c0-1 + nothing older than the
    # kept tail (batch=2) -> fewer than 2 candidates, no fold ran
    assert names == ["batch=2", "batch=c0-1"]
    assert report["folded"] == 0


def test_compact_ingest_units_repairs_nested_crash_ranges(spark, split_sf_dir, tmp_path):
    """Double-crash state: a unit sits inside TWO folded ranges at once
    (c0-1 from a crashed first fold, c0-2 from a crashed second whose
    candidates included c0-1). The repair pass must delete each
    contained unit exactly once and leave one copy of the data."""
    from aind_protein_data_transformation_spark.operators.layout import (
        compact_ingest_units,
    )

    lake = str(tmp_path / "lake")
    cols = ["user_id", "value"]
    ev = load_table(spark, split_sf_dir, "events")
    batches = [
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i)
        for i in range(4)
    ]
    edges = None
    for i, b in enumerate(batches):
        edges = zorder_layout(
            b, cols, f"{lake}/batch={i}", bits=5, num_files=1,
            mode="overwrite", edges=edges,
        )

    def fp(d):
        cs = sorted(d.columns)
        return tuple(d.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64(F.to_json(F.struct(*cs)))
                  .cast("decimal(38,0)")),
        ).collect()[0])

    one_copy = fp(spark.read.parquet(f"{lake}/batch=*"))

    # crashed fold 1: c0-1 landed, originals 0,1 not deleted
    u01 = spark.read.parquet(f"{lake}/batch=0", f"{lake}/batch=1")
    zorder_layout(u01, cols, f"{lake}/batch=c0-1", bits=5,
                  num_files=1, mode="overwrite", edges=edges)
    # crashed fold 2 over {c0-1, 2}: c0-2 landed, nothing deleted —
    # batch=0/1 are now inside BOTH c0-1 and c0-2
    u012 = spark.read.parquet(
        f"{lake}/batch=0", f"{lake}/batch=1", f"{lake}/batch=2"
    )
    zorder_layout(u012, cols, f"{lake}/batch=c0-2", bits=5,
                  num_files=1, mode="overwrite", edges=edges)

    report = compact_ingest_units(lake, cols, spark, bits=5,
                                  num_files=1, keep_last=1)
    assert sorted(report["repaired"]) == [
        "batch=0", "batch=1", "batch=2", "batch=c0-1"
    ]
    assert fp(spark.read.parquet(f"{lake}/batch=*")) == one_copy
    names = sorted(n for n in os.listdir(lake) if n.startswith("batch="))
    assert names == ["batch=3", "batch=c0-2"]
