"""End-to-end stack compression job (SURVEY.md §2A A24-A25).

The reference's ``ZeissCompressionJob.run_job`` (zeiss_job.py:222-241)
is: scan + sort -> round-robin -> claim one bucket -> per-stack
(rename, decode, rechunk, pad, pyramid, blocked compressed write, OME
metadata) -> structured response. Its CLI entry parses settings from
argv JSON / config file / env (zeiss_job.py:245-260; note the latent
line-258 bug that breaks the CLI path — reproduced here as a *fixed*
equivalent, not bug-for-bug).

In Spark the per-stack driver loop (A24) disappears: all claimed stacks
decode and reduce as one DataFrame lineage keyed by ``stack_id``, and
Spark's scheduler replaces SLURM. ``num_partitions``/``bucket`` are kept
so N independent job invocations still split work identically to the
reference's 5-task deployment; a single cluster run uses the default
(1 bucket = everything).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession

from aind_protein_data_transformation_spark.arraylib import blocks, decode, ome, pyramid, stacks


@dataclass
class StackJobSettings:
    """Typed job config (parity: models.py:23-76 ``ZeissJobSettings``)."""

    input_source: str
    output_directory: str
    num_of_partitions: int = 1
    partition_to_process: int = 0
    compressor_name: str = "blosc"
    compressor_kwargs: dict = field(
        default_factory=lambda: dict(blocks.DEFAULT_COMPRESSOR)
    )
    chunk_size: tuple[int, int, int] = pyramid.DEFAULT_CHUNK_SIZE
    scale_factor: tuple[int, int, int] = pyramid.DEFAULT_SCALE_FACTOR
    downsample_levels: int = pyramid.DEFAULT_N_LEVELS
    glob: str = "*.czi"
    s3_location: str | None = None
    #: also emit a dependency-free zarr v2 store per stack per level
    #: (blocks.write_zarr_v2_store) alongside the parquet levels — a
    #: format-valid twin of the reference's OME-Zarr output, readable
    #: by any zarr reader (zlib codec; blosc via write_chunks_zarr
    #: where numcodecs exists).
    zarr_v2: bool = False

    def __post_init__(self) -> None:
        if not 0 <= self.partition_to_process < self.num_of_partitions:
            raise ValueError("partition_to_process must be in [0, num_of_partitions)")
        if self.downsample_levels < 1:
            raise ValueError("downsample_levels must be >= 1")

    @property
    def output_root(self) -> str:
        """Write target. With ``s3_location`` set, Spark writes straight
        to ``s3a://`` — the reference's aws-cli sync + local delete
        (A23, utils/utils.py:138-201) collapses into the sink itself."""
        if self.s3_location:
            return self.s3_location.replace("s3://", "s3a://", 1)
        return self.output_directory


@dataclass
class JobResponse:
    """Structured result (parity: zeiss_job.py:239-241)."""

    status_code: int
    message: str
    data: str | None = None


def upload_derivatives_folder(spark: SparkSession, settings: StackJobSettings) -> str:
    """Sync ``<input_source>/derivatives`` to ``<output_root>/derivatives``.

    Parity: the reference's ``_upload_derivatives_folder``
    (zeiss_job.py:202-220, aws-cli sync; missing source raises
    FileNotFoundError). Copied through the Hadoop FileSystem API so the
    same code path serves ``file://`` and ``s3a://`` targets — no
    subprocess, no aws CLI.
    """
    src = os.path.join(settings.input_source, "derivatives")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"{src} does not exist.")
    dest = f"{settings.output_root}/derivatives"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src_path = jvm.org.apache.hadoop.fs.Path(f"file://{os.path.abspath(src)}")
    dst_path = jvm.org.apache.hadoop.fs.Path(dest)
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        src_path.getFileSystem(conf),
        src_path,
        dst_path.getFileSystem(conf),
        dst_path,
        False,  # deleteSource
        True,  # overwrite
        conf,
    )
    return dest


def run_job(
    spark: SparkSession,
    settings: StackJobSettings,
    decoder: decode.Decoder = decode.synthetic_decoder,
) -> JobResponse:
    """Run the full pipeline for this invocation's bucket of stacks."""
    from pyspark.sql import functions as F

    t0 = time.time()
    # Derivatives upload is gated on partition 0 so N concurrent job
    # invocations sync the shared folder exactly once (reference
    # zeiss_job.py:228-231; enabled here, tolerant of absence).
    if settings.partition_to_process == 0 and settings.s3_location:
        if os.path.isdir(os.path.join(settings.input_source, "derivatives")):
            upload_derivatives_folder(spark, settings)
    # Deal/claim on the METADATA listing only — the round-robin window is
    # a global sort, and it must never see content bytes (stacks.py's
    # listing-not-data invariant). Content is scanned separately and
    # filtered to the claimed paths, which Catalyst turns into an In
    # predicate on the binaryFile index.
    listing = stacks.scan_stack_dir(spark, settings.input_source, settings.glob)
    claimed = stacks.select_bucket(
        stacks.deal_round_robin(listing, settings.num_of_partitions),
        settings.partition_to_process,
    ).withColumn("stack_name", stacks.stack_display_name("path"))

    stack_meta = [
        (row.path, row.stack_name) for row in claimed.select("path", "stack_name").collect()
    ]
    if not stack_meta:
        return JobResponse(1, f"No stacks claimed for bucket {settings.partition_to_process}")

    content = stacks.scan_stack_dir(
        spark, settings.input_source, settings.glob, with_content=True
    ).filter(F.col("path").isin([p for p, _ in stack_meta]))

    # Persist the decoded voxels: they feed level-0 encode, the cascade,
    # and the shape/dtype aggregations — without this the binary decode
    # re-runs once per consumer (the reference bounds this with its
    # write-then-read-back loop, czi_to_zarr.py:527-529; persist is the
    # in-memory equivalent, spilling to disk when needed).
    voxels = decode.pad_to_5d(decode.decode_stacks(content, decoder)).persist()

    # Per-stack full-res shapes, needed up front: chunk extents at every
    # level clamp to the DECLARED dims (min(chunk, shape - origin), the
    # reference's fixed-chunk contract zarr_writer.py:62-64), never to
    # whichever voxels happen to be present — so a sparse tail (a decoder
    # that elides empty voxels) can't silently truncate a block. Also
    # feeds the OME-NGFF sidecars below. One tiny agg over the persisted
    # voxels; O(stacks) rows.
    shapes = {
        row["stack_id"]: (
            row["mt"] + 1, row["mc"] + 1, row["mz"] + 1, row["my"] + 1, row["mx"] + 1
        )
        for row in voxels.groupBy("stack_id")
        .agg(
            F.max("t").alias("mt"),
            F.max("c").alias("mc"),
            F.max("z").alias("mz"),
            F.max("y").alias("my"),
            F.max("x").alias("mx"),
        )
        .collect()
    }

    # Per-stack dtype, one tiny distinct over the persisted voxels;
    # needed inside the level loop when the zarr_v2 sink is on.
    stack_dtypes = {
        row["stack_id"]: row["dtype"]
        for row in voxels.select("stack_id", "dtype").distinct().collect()
    }

    out_root = settings.output_root
    current = voxels
    spatial = {sid: shape[2:] for sid, shape in shapes.items()}
    fz, fy, fx = settings.scale_factor
    for lvl in range(settings.downsample_levels):
        if lvl > 0:
            # persist each level before its write so level k+1 derives
            # from the materialized level k, not a recomputed lineage
            current = pyramid.downsample_once(current, settings.scale_factor).persist()
            # ceil-division shape recurrence (reference czi_to_zarr.py:181-183)
            spatial = {
                sid: (-(-z // fz), -(-y // fy), -(-x // fx))
                for sid, (z, y, x) in spatial.items()
            }
        chunked = blocks.encode_chunks(
            current, settings.chunk_size, stack_spatial_shapes=spatial
        )
        blocks.write_level_parquet(chunked, out_root, lvl)
        if settings.zarr_v2:
            # per-stack format-valid zarr v2 arrays: <out>/zarr/<stack>/
            # <lvl> under a .zgroup per stack (the reference's per-stack
            # group, czi_to_zarr.py:483-485). Stack count is O(driver
            # loop) by design — the reference iterates stacks serially
            # too; within a stack the chunk writes stay distributed.
            for sid, (z, y, x) in spatial.items():
                grp = os.path.join(settings.output_directory, "zarr", sid)
                os.makedirs(grp, exist_ok=True)
                with open(os.path.join(grp, ".zgroup"), "w") as fh:
                    json.dump({"zarr_format": 2}, fh)
                blocks.write_zarr_v2_store(
                    chunked.filter(F.col("stack_id") == sid),
                    os.path.join(grp, str(lvl)),
                    (shapes[sid][0], shapes[sid][1], z, y, x),
                    (1, 1, *settings.chunk_size),
                    stack_dtypes[sid],
                )
    dtypes = stack_dtypes
    # Metadata always lands in the local output_directory (a few KB per
    # stack) — including S3 runs, where the data goes to s3a:// but the
    # sidecars must not be silently dropped. A production deployment
    # would additionally upload this directory (the reference's A23
    # derivatives sync, zeiss_job.py:202-220).
    metadata_dir = os.path.join(settings.output_directory, "_metadata")
    for path, stack_name in stack_meta:
        stack_id = path.rsplit("/", 1)[-1]
        shape = shapes.get(stack_id)
        if shape is None:
            continue
        attrs = ome.build_multiscales_metadata(
            image_name=stack_name,
            data_shape=shape,
            n_levels=settings.downsample_levels,
            scale_factor=settings.scale_factor,
            voxel_size=(1.0, 1.0, 1.0),
            chunks=(1, 1, *settings.chunk_size),
            channel_minmax=[ome.dtype_range(dtypes[stack_id])] * shape[1],
        )
        ome.write_ome_ngff_json(attrs, metadata_dir, f"{stack_name}.zattrs")

    voxels.unpersist()
    return JobResponse(
        0,
        f"Processed {len(stack_meta)} stacks in {time.time() - t0:.1f}s",
        data=json.dumps({"stacks": [name for _, name in stack_meta]}),
    )


def job_entrypoint(sys_args: list[str] | None = None) -> JobResponse:
    """CLI entry (parity: zeiss_job.py:245-260, with the line-258
    wrong-class bug fixed: settings parse into ``StackJobSettings`` and
    the job actually runs)."""
    parser = argparse.ArgumentParser(description="stack compression job")
    parser.add_argument("--job-settings", type=str, help="settings as a JSON string")
    parser.add_argument("--config-file", type=str, help="path to a settings JSON file")
    ns = parser.parse_args(sys_args)
    if ns.job_settings:
        cfg = json.loads(ns.job_settings)
    elif ns.config_file:
        with open(ns.config_file, encoding="utf-8") as fh:
            cfg = json.load(fh)
    else:
        cfg = {
            "input_source": os.environ["STACK_JOB_INPUT_SOURCE"],
            "output_directory": os.environ["STACK_JOB_OUTPUT_DIRECTORY"],
        }
    for key in ("chunk_size", "scale_factor"):
        if key in cfg:
            cfg[key] = tuple(cfg[key])
    settings = StackJobSettings(**cfg)

    from aind_protein_data_transformation_spark.session import get_spark

    spark = get_spark("aind-protein-data-transformation-spark-stack-job")
    try:
        response = run_job(spark, settings)
    finally:
        spark.stop()
    print(json.dumps(asdict(response)))
    return response


if __name__ == "__main__":
    job_entrypoint(sys.argv[1:])
