"""Write sizing + blocked sinks (SURVEY.md §2A A17-A21).

The reference right-sizes its IO by growing storage chunks into write
blocks near a bytes target (``compress/zarr_writer.py:51-120``), then
streams block-by-block to keep the scheduler bounded at terabyte scale
(zarr_writer.py:188-213). In Spark the same levers are
``spark.sql.files.maxPartitionBytes`` / AQE advisory sizes and bounded
tasks — so the primary sink here is partitioned zstd parquet and the
sizing helpers exist for (a) parity with the reference's numbers and
(b) computing rows-per-file targets for ``maxRecordsPerFile``.
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame

#: Parity with the reference's compressor defaults (models.py:52-56):
#: blosc zstd level 3 with byte-shuffle. The parquet sink maps this to
#: parquet's zstd codec; the optional zarr sink uses it verbatim.
DEFAULT_COMPRESSOR = {"cname": "zstd", "clevel": 3, "shuffle": "shuffle"}


def nbytes(shape: Sequence[int], itemsize: int) -> int:
    """Byte size of a dense array of ``shape`` (zarr_writer.py:15-26)."""
    if any(s <= 0 for s in shape):
        raise ValueError("shape must be > 0 in all dimensions")
    return math.prod(shape) * itemsize


def expand_chunks(
    chunks: Sequence[int],
    data_shape: Sequence[int],
    target_size: int,
    itemsize: int,
    mode: str = "iso",
) -> tuple[int, ...]:
    """Grow a chunk shape toward ``target_size`` bytes.

    Parity: zarr_writer.py:51-120. Two strategies, both producing
    integer multiples of the base chunk clamped to the data shape:

    - ``"cycle"``: double one dimension at a time, round-robin;
    - ``"iso"``: scale every dimension by the same integer i = 2, 3, ...

    Growth stops once the candidate reaches the target or covers the
    whole shape; of the last two candidates the one whose byte size is
    nearer the target wins, ties favoring the earlier (smaller) one.
    """
    if any(c < 1 for c in chunks):
        raise ValueError("chunks must be >= 1 for all dimensions")
    if any(s < 1 for s in data_shape):
        raise ValueError("data_shape must be >= 1 for all dimensions")
    if any(c > s for c, s in zip(chunks, data_shape)):
        raise ValueError("chunks cannot be larger than data_shape in any dimension")
    if target_size <= 0:
        raise ValueError("target_size must be > 0")
    if itemsize <= 0:
        raise ValueError("itemsize must be > 0")

    def clamped(shape: Sequence[int]) -> tuple[int, ...]:
        return tuple(min(int(c), int(s)) for c, s in zip(shape, data_shape))

    def candidates() -> Iterator[tuple[int, ...]]:
        if mode == "cycle":
            cur = list(chunks)
            dim = 0
            while True:
                yield tuple(cur)
                cur[dim % len(cur)] = min(data_shape[dim % len(cur)], cur[dim % len(cur)] * 2)
                dim += 1
                if all(c >= s for c, s in zip(cur, data_shape)):
                    yield tuple(cur)
                    return
        elif mode == "iso":
            i = 1
            while True:
                cur = clamped([c * i for c in chunks])
                yield cur
                i += 1
                if all(c >= s for c, s in zip(cur, data_shape)):
                    return
        else:
            raise ValueError(f"Invalid mode {mode}")

    prev = tuple(chunks)
    for cur in candidates():
        if nbytes(cur, itemsize) >= target_size:
            # Nearer of the two most recent candidates wins; tie -> prev.
            if abs(nbytes(cur, itemsize) - target_size) < abs(nbytes(prev, itemsize) - target_size):
                return cur
            return prev
        prev = cur
    return prev


def block_shape_for(
    chunks: Sequence[int],
    data_shape: Sequence[int],
    itemsize: int,
    target_size_mb: int = 409_600,
    mode: str = "cycle",
) -> tuple[int, ...]:
    """Write-block shape over the last 3 (spatial) dims.

    Parity: ``BlockedArrayWriter.get_block_shape`` (zarr_writer.py:215-244)
    including its 409,600 MB default; the reference's call site passes
    12,800 MB (czi_to_zarr.py:510-513).
    """
    return expand_chunks(
        tuple(chunks)[-3:], tuple(data_shape)[-3:], target_size_mb * 1024**2, itemsize, mode
    )


def gen_block_ranges(
    arr_shape: Sequence[int], block_shape: Sequence[int]
) -> Iterator[tuple[tuple[int, int], ...]]:
    """Enumerate ``(start, stop)`` ranges tiling ``arr_shape`` by blocks.

    Parity: ``BlockedArrayWriter.gen_slices`` (zarr_writer.py:129-186) —
    row-major order, edge blocks truncated. Expressed iteratively (an
    odometer over per-dim offsets) rather than recursively; at scale the
    same tiling is produced distributed by the SQL-checkable query
    ``grid_block_slices`` (sequence × explode).
    """
    if len(arr_shape) != len(block_shape):
        raise ValueError("array shape and block shape have different lengths")
    per_dim = [
        [(i, min(i + b, s)) for i in range(0, s, b)]
        for s, b in zip(arr_shape, block_shape)
    ]
    idx = [0] * len(per_dim)
    while True:
        yield tuple(per_dim[d][idx[d]] for d in range(len(per_dim)))
        for d in reversed(range(len(per_dim))):
            idx[d] += 1
            if idx[d] < len(per_dim[d]):
                break
            idx[d] = 0
        else:
            return


def write_level_parquet(df: DataFrame, output_path: str, level: int, max_records_per_file: int = 0) -> None:
    """Materialize one pyramid level as zstd parquet under ``level=<k>/``.

    The Spark analog of A20/A21 (create_dataset + blocked store): Spark
    tasks are already bounded writers, so the blocked-store machinery
    reduces to a partitioned write; ``maxRecordsPerFile`` plays the role
    of the bytes-targeted block shape.
    """
    writer = df.write.mode("overwrite").option("compression", "zstd")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(f"{output_path}/level={level}")


def encode_chunks(
    voxels: DataFrame,
    chunk_size: Sequence[int] = (128, 128, 128),
    stack_spatial_shapes: dict[str, tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Voxel rows -> chunk rows ``(stack_id, t, c, z0, y0, x0, shape, payload)``.

    The storage-boundary encoding (SURVEY.md §1.1): each chunk-grid cell
    becomes one row whose ``payload`` is the dense C-order buffer of its
    voxels in the stack's declared dtype. ``applyInPandas`` groups by the
    grid key, so the shuffle is the rechunk (A9) and the encode itself is
    a vectorized per-group reshape.

    Block extents follow the reference's fixed-chunk contract
    (zarr_writer.py: chunk extents clamped to array bounds, NOT derived
    from which voxels happen to be present): pass
    ``stack_spatial_shapes`` ({stack_id: (Z, Y, X)}) to clamp each cell
    to ``min(chunk, shape - origin)``. Without declared shapes the
    extent falls back to the observed max voxel and the group is
    REQUIRED to be dense — a sparse group raises instead of silently
    encoding a truncated block that a zarr region-update would then
    under-write.
    """
    import numpy as np
    import pandas as pd

    cz, cy, cx = (int(c) for c in chunk_size)
    declared = dict(stack_spatial_shapes) if stack_spatial_shapes else None

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        dtype = pdf["dtype"].iloc[0]
        z0 = int(pdf["gz"].iloc[0]) * cz
        y0 = int(pdf["gy"].iloc[0]) * cy
        x0 = int(pdf["gx"].iloc[0]) * cx
        if declared is not None:
            sz, sy, sx = declared[pdf["stack_id"].iloc[0]]
            dz = min(cz, sz - z0)
            dy = min(cy, sy - y0)
            dx = min(cx, sx - x0)
        else:
            dz = int(pdf["z"].max()) - z0 + 1
            dy = int(pdf["y"].max()) - y0 + 1
            dx = int(pdf["x"].max()) - x0 + 1
            if len(pdf) != dz * dy * dx:
                raise ValueError(
                    f"sparse chunk group at origin ({z0},{y0},{x0}): "
                    f"{len(pdf)} voxels for extent {dz}x{dy}x{dx}; pass "
                    "stack_spatial_shapes to encode sparse inputs"
                )
        block = np.zeros((dz, dy, dx), dtype=dtype)
        block[pdf["z"] - z0, pdf["y"] - y0, pdf["x"] - x0] = pdf["v"].to_numpy()
        return pd.DataFrame(
            {
                "stack_id": [pdf["stack_id"].iloc[0]],
                "dtype": [dtype],
                "t": [int(pdf["t"].iloc[0])],
                "c": [int(pdf["c"].iloc[0])],
                "z0": [z0],
                "y0": [y0],
                "x0": [x0],
                "shape": [[dz, dy, dx]],
                "payload": [block.tobytes()],
            }
        )

    from pyspark.sql import functions as F

    keyed = voxels.withColumns(
        {
            "gz": (F.col("z") / cz).cast("long"),
            "gy": (F.col("y") / cy).cast("long"),
            "gx": (F.col("x") / cx).cast("long"),
        }
    )
    return keyed.groupBy("stack_id", "t", "c", "gz", "gy", "gx").applyInPandas(
        encode,
        schema=(
            "stack_id string, dtype string, t int, c int, "
            "z0 long, y0 long, x0 long, shape array<int>, payload binary"
        ),
    )


def write_chunks_files(
    chunk_df: DataFrame,
    store_path: str,
    level: int,
    chunk_size: Sequence[int] = (128, 128, 128),
    compress_level: int = 3,
) -> None:
    """Zarr-layout chunk-file sink, dependency-free (A20/A21 fidelity).

    Each chunk row lands as its own compressed file at
    ``<store>/<level>/<t>.<c>.<gz>/<gy>/<gx>`` — the reference's
    ``dimension_separator="/"`` layout (czi_to_zarr.py:551) with zlib
    standing in for blosc (numcodecs absent here; ``write_chunks_zarr``
    is the byte-identical variant when it is installed). Runs as
    ``foreachPartition``: every executor writes its own co-located
    chunks, no driver involvement — the distributed analog of the
    reference's bounded sequential blocked store (zarr_writer.py:188-213).
    """
    import json as _json

    level_dir = os.path.join(store_path, str(level))
    cz, cy, cx = (int(c) for c in chunk_size)

    def write_partition(rows) -> None:
        import zlib

        for row in rows:
            gz, gy, gx = row.z0 // cz, row.y0 // cy, row.x0 // cx
            # one group per stack, matching the reference's per-stack
            # zarr group (czi_to_zarr.py:483-485)
            d = os.path.join(level_dir, row.stack_id, f"{row.t}.{row.c}.{gz}", str(gy))
            os.makedirs(d, exist_ok=True)
            payload = zlib.compress(bytes(row.payload), compress_level)
            meta = _json.dumps(
                {"shape": list(row.shape), "dtype": row.dtype, "z0": row.z0, "y0": row.y0, "x0": row.x0}
            ).encode()
            with open(os.path.join(d, str(gx)), "wb") as fh:
                fh.write(len(meta).to_bytes(4, "big") + meta + payload)

    os.makedirs(level_dir, exist_ok=True)
    chunk_df.foreachPartition(write_partition)


def read_chunk_file(path: str):
    """Read one chunk file written by :func:`write_chunks_files` back to
    ``(meta_dict, ndarray)`` — the verification path for the sink."""
    import json as _json
    import zlib

    import numpy as np

    with open(path, "rb") as fh:
        raw = fh.read()
    n = int.from_bytes(raw[:4], "big")
    meta = _json.loads(raw[4 : 4 + n])
    block = np.frombuffer(zlib.decompress(raw[4 + n :]), dtype=meta["dtype"]).reshape(
        meta["shape"]
    )
    return meta, block


def write_chunks_zarr(
    chunk_df: DataFrame,
    store_path: str,
    shape: Sequence[int],
    chunks: Sequence[int],
    dtype: str,
    compressor: dict | None = None,
) -> bool:
    """Optional byte-fidelity zarr sink via ``foreachPartition``.

    Each executor partition opens the store and writes its chunk rows —
    the distributed analog of the reference's sequential blocked store
    (zarr_writer.py:188-213), safe because chunk rows never overlap.
    Returns False (no-op) when zarr/numcodecs are not installed; parquet
    remains the primary sink.
    """
    try:
        import numcodecs  # noqa: F401
        import zarr  # noqa: F401
    except ImportError:
        return False

    comp = dict(DEFAULT_COMPRESSOR if compressor is None else compressor)
    shape_t = tuple(int(s) for s in shape)
    chunks_t = tuple(int(c) for c in chunks)

    def write_partition(rows) -> None:
        import numcodecs as nc
        import numpy as np
        import zarr as za

        shuffle = {"noshuffle": 0, "shuffle": 1, "bitshuffle": 2}.get(
            str(comp.get("shuffle", "shuffle")), 1
        )
        blosc = nc.Blosc(cname=comp.get("cname", "zstd"), clevel=int(comp.get("clevel", 3)), shuffle=shuffle)
        arr = za.open_array(
            store_path, mode="a", shape=shape_t, chunks=chunks_t, dtype=dtype, compressor=blosc
        )
        for row in rows:
            block = np.frombuffer(row.payload, dtype=dtype).reshape(row.shape)
            z0, y0, x0 = int(row.z0), int(row.y0), int(row.x0)
            arr[
                int(row.t),
                int(row.c),
                z0 : z0 + block.shape[0],
                y0 : y0 + block.shape[1],
                x0 : x0 + block.shape[2],
            ] = block

    chunk_df.foreachPartition(write_partition)
    return True


def write_zarr_v2_store(
    chunk_df: DataFrame,
    store_path: str,
    shape: Sequence[int],
    chunks: Sequence[int],
    dtype: str,
    compress_level: int = 3,
) -> None:
    """Dependency-free **format-valid zarr v2** array store.

    Closes the gap between :func:`write_chunks_files` (private layout,
    needs :func:`read_chunk_file`) and the import-gated
    :func:`write_chunks_zarr` (needs zarr+numcodecs): this sink writes a
    real zarr v2 array any zarr reader opens, using only the stdlib —
    ``.zarray`` metadata plus one file per chunk keyed
    ``t/c/gz/gy/gx`` (``dimension_separator="/"``, the reference's
    layout, czi_to_zarr.py:551). Codec is ``zlib`` (a numcodecs
    built-in) standing in for the reference's blosc-zstd — the format
    contract (metadata, keys, C-order full-chunk buffers) is exact;
    only the compressor id differs, swapped by one argument where
    numcodecs exists.

    Per the v2 spec, EDGE CHUNKS ARE STORED FULL-SIZE: a block that
    under-fills its chunk is zero-padded to ``chunks`` before encoding
    (fill_value 0). Executors write their own co-located chunks via
    ``foreachPartition`` — chunk grid cells never overlap, so no write
    coordination is needed; the driver writes only the metadata key.
    """
    import json as _json

    import numpy as np

    shape_t = [int(s) for s in shape]
    chunks_t = [int(c) for c in chunks]
    dtype_str = np.dtype(dtype).str
    os.makedirs(store_path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": shape_t,
        "chunks": chunks_t,
        "dtype": dtype_str,
        "compressor": {"id": "zlib", "level": int(compress_level)},
        "fill_value": 0,
        "order": "C",
        "filters": None,
        "dimension_separator": "/",
    }
    with open(os.path.join(store_path, ".zarray"), "w") as fh:
        _json.dump(meta, fh, indent=2)

    _, _, cz, cy, cx = chunks_t

    def write_partition(rows) -> None:
        import zlib

        import numpy as _np

        for row in rows:
            block = _np.frombuffer(bytes(row.payload), dtype=dtype_str).reshape(
                list(row.shape)
            )
            full = _np.zeros((cz, cy, cx), dtype=dtype_str)
            full[: block.shape[0], : block.shape[1], : block.shape[2]] = block
            gz, gy, gx = row.z0 // cz, row.y0 // cy, row.x0 // cx
            d = os.path.join(
                store_path, str(int(row.t)), str(int(row.c)), str(gz), str(gy)
            )
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, str(gx)), "wb") as fh:
                fh.write(zlib.compress(full.tobytes(order="C"), compress_level))

    chunk_df.foreachPartition(write_partition)
