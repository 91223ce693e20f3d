"""Python DataSource (Spark 4 API) for stack directories.

SURVEY.md §4 flags the reference's CZI read (A5) as the one genuine
custom-source need: "a binaryFile->chunk-rows decode step (pandas UDF or
Python DataSource from the Spark 4 API)". :mod:`.decode` ships the
pandas-UDF route; this module is the DataSource route —

    spark.dataSource.register(StackVoxelDataSource)
    spark.read.format("stackvoxels").option("glob", "*.czi").load(dir)

One input partition per stack file, so a 1000-executor cluster decodes
1000 stacks concurrently and Spark's scheduler handles locality/retry;
the decoder runs inside the reader (executor-side), never the driver.
Emits Arrow batches (not per-row tuples) so the decode stays vectorized
end-to-end.
"""

from __future__ import annotations

import glob as globlib
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Same long-form voxel schema as decode.VOXEL_SCHEMA (kept literal —
#: the DataSource API wants a DDL string and this module must import
#: without a SparkSession).
VOXEL_DDL = (
    "stack_id string, dtype string, t int, c int, z long, y long, x long, v double"
)


class StackFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class StackVoxelReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("stackvoxels requires a load(path)")
        self.glob = options.get("glob", "*.czi")

    def partitions(self) -> list[StackFilePartition]:
        # Sorted for the reference's deterministic-listing contract
        # (zeiss_job.py:58-59); one partition per stack file.
        paths = sorted(
            p
            for p in globlib.glob(os.path.join(self.dir, self.glob))
            if os.path.isfile(p)
        )
        return [StackFilePartition(p) for p in paths]

    def read(self, partition: StackFilePartition):
        import numpy as np
        import pyarrow as pa

        from aind_protein_data_transformation_spark.arraylib.decode import synthetic_decoder

        with open(partition.path, "rb") as fh:
            content = fh.read()
        arr, dtype = synthetic_decoder(partition.path, content)
        t, c, z, y, x = np.indices(arr.shape).reshape(5, -1)
        stack_id = os.path.basename(partition.path)
        yield pa.record_batch(
            {
                "stack_id": np.repeat(stack_id, arr.size),
                "dtype": np.repeat(dtype, arr.size),
                "t": t.astype(np.int32),
                "c": c.astype(np.int32),
                "z": z.astype(np.int64),
                "y": y.astype(np.int64),
                "x": x.astype(np.int64),
                "v": arr.reshape(-1).astype(np.float64),
            }
        )


class StackVoxelDataSource(DataSource):
    """``format("stackvoxels")`` — voxel rows straight from a stack dir."""

    @classmethod
    def name(cls) -> str:
        return "stackvoxels"

    def schema(self) -> str:
        return VOXEL_DDL

    def reader(self, schema) -> StackVoxelReader:
        return StackVoxelReader(self.options)
