"""OME-NGFF metadata generation (SURVEY.md §2A A13-A16).

Pure driver-side functions: metadata for a pyramid is a few KB of JSON
regardless of data scale, so there is nothing to distribute. Semantics
mirror the reference's generators (parity notes cite
``compress/czi_to_zarr.py``):

- omero channel block — czi_to_zarr.py:28-96
- per-level coordinate transforms + chunk opts — czi_to_zarr.py:99-195
- 5-axis list — czi_to_zarr.py:198-219
- assembled multiscales document + validation — czi_to_zarr.py:222-295
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Sequence
from typing import Any

NGFF_VERSION = "0.4"


def build_omero(
    data_shape: Sequence[int],
    image_name: str,
    channel_names: Sequence[str] | None = None,
    channel_colors: Sequence[int] | None = None,
    channel_minmax: Sequence[tuple[float, float]] | None = None,
    channel_startend: Sequence[tuple[float, float]] | None = None,
) -> dict[str, Any]:
    """Omero rendering metadata for a 5-D TCZYX shape.

    Parity: czi_to_zarr.py:28-96 — defaults are per-channel labels
    ``Channel:<name>:<i>``, color = channel index as 6-digit lowercase
    hex, window (0.0, 1.0), start/end = min/max, ``defaultZ`` the middle
    Z section.
    """
    n_channels = int(data_shape[1])
    if channel_names is None:
        channel_names = [f"Channel:{image_name}:{i}" for i in range(n_channels)]
    if channel_colors is None:
        channel_colors = list(range(n_channels))
    if channel_minmax is None:
        channel_minmax = [(0.0, 1.0)] * n_channels
    if channel_startend is None:
        channel_startend = list(channel_minmax)

    channels = [
        {
            "active": True,
            "coefficient": 1,
            "color": f"{channel_colors[i]:06x}",
            "family": "linear",
            "inverted": False,
            "label": channel_names[i],
            "window": {
                "end": float(channel_startend[i][1]),
                "max": float(channel_minmax[i][1]),
                "min": float(channel_minmax[i][0]),
                "start": float(channel_startend[i][0]),
            },
        }
        for i in range(n_channels)
    ]
    return {
        "id": 1,
        "name": image_name,
        "version": NGFF_VERSION,
        "channels": channels,
        "rdefs": {
            "defaultT": 0,
            "defaultZ": int(data_shape[2]) // 2,
            "model": "color",
        },
    }


def level_shape(full_shape: Sequence[int], scale_factor: Sequence[int], level: int) -> tuple[int, ...]:
    """Spatial shape of pyramid ``level`` under repeated ceil-division.

    Parity: the reference's recurrence ``last = ceil(last / factor)`` per
    level (czi_to_zarr.py:181-183). Nested ceil-divisions by integer
    factors collapse: ``ceil(ceil(n/f)/f) == ceil(n/f^2)``, so the closed
    form is ``ceil(n / f**level)`` — the same identity the SQL-checkable
    query relies on.
    """
    t, c, z, y, x = full_shape
    fz, fy, fx = scale_factor
    return (
        t,
        c,
        math.ceil(z / fz**level),
        math.ceil(y / fy**level),
        math.ceil(x / fx**level),
    )


def compute_scales(
    n_levels: int,
    scale_factor: Sequence[int],
    voxel_size: Sequence[float],
    chunks: Sequence[int],
    data_shape: Sequence[int],
    translation: Sequence[float] | None = None,
) -> tuple[list[list[dict[str, Any]]], list[tuple[int, int, int, int, int]]]:
    """Per-level coordinate transforms and chunk shapes.

    Parity: czi_to_zarr.py:99-195 — level-k scale vector is
    ``[1, 1, vz*fz^k, vy*fy^k, vx*fx^k]``; chunk opts are clamped to the
    level's (ceil-recurrence) shape; an optional constant translation is
    appended at every level.
    """
    fz, fy, fx = scale_factor
    vz, vy, vx = voxel_size
    transforms: list[list[dict[str, Any]]] = []
    chunk_opts: list[tuple[int, int, int, int, int]] = []
    for lvl in range(n_levels):
        entry: list[dict[str, Any]] = [
            {
                "type": "scale",
                "scale": [1.0, 1.0, vz * fz**lvl, vy * fy**lvl, vx * fx**lvl],
            }
        ]
        if translation is not None:
            entry.append({"type": "translation", "translation": list(translation)})
        transforms.append(entry)
        _, _, lz, ly, lx = level_shape(data_shape, scale_factor, lvl)
        chunk_opts.append((1, 1, min(lz, chunks[2]), min(ly, chunks[3]), min(lx, chunks[4])))
    return transforms, chunk_opts


def axes_5d(time_unit: str = "millisecond", space_unit: str = "micrometer") -> list[dict[str, str]]:
    """The constant TCZYX axis list (parity: czi_to_zarr.py:198-219)."""
    return [
        {"name": "t", "type": "time", "unit": time_unit},
        {"name": "c", "type": "channel"},
        {"name": "z", "type": "space", "unit": space_unit},
        {"name": "y", "type": "space", "unit": space_unit},
        {"name": "x", "type": "space", "unit": space_unit},
    ]


def _validate_transforms(transforms: list[list[dict[str, Any]]], ndim: int) -> None:
    """Structural validation standing in for ome-zarr's
    ``fmt.validate_coordinate_transformations`` (czi_to_zarr.py:285-287)."""
    for lvl, entry in enumerate(transforms):
        if not entry or entry[0]["type"] != "scale":
            raise ValueError(f"level {lvl}: first transform must be 'scale'")
        for tf in entry:
            kind = tf["type"]
            if kind not in ("scale", "translation"):
                raise ValueError(f"level {lvl}: unknown transform type {kind!r}")
            vec = tf.get(kind)
            if not isinstance(vec, list) or len(vec) != ndim:
                raise ValueError(f"level {lvl}: {kind} vector must have length {ndim}")


def build_multiscales_metadata(
    image_name: str,
    data_shape: Sequence[int],
    n_levels: int,
    scale_factor: Sequence[int],
    voxel_size: Sequence[float],
    chunks: Sequence[int],
    channel_names: Sequence[str] | None = None,
    channel_colors: Sequence[int] | None = None,
    channel_minmax: Sequence[tuple[float, float]] | None = None,
    channel_startend: Sequence[tuple[float, float]] | None = None,
    metadata: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Assemble the full OME-NGFF attributes document.

    Parity: czi_to_zarr.py:222-295 — ``multiscales`` (axes + per-level
    datasets with coordinateTransformations) alongside ``omero``.
    """
    transforms, _ = compute_scales(n_levels, scale_factor, voxel_size, chunks, data_shape)
    _validate_transforms(transforms, ndim=5)
    datasets = [
        {"path": str(lvl), "coordinateTransformations": transforms[lvl]}
        for lvl in range(n_levels)
    ]
    multiscales = {
        "axes": axes_5d(),
        "datasets": datasets,
        "name": image_name,
        "version": NGFF_VERSION,
    }
    if metadata:
        multiscales["metadata"] = metadata
    return {
        "multiscales": [multiscales],
        "omero": build_omero(
            data_shape,
            image_name,
            channel_names,
            channel_colors,
            channel_minmax,
            channel_startend,
        ),
    }


def write_ome_ngff_json(attrs: dict[str, Any], output_dir: str, filename: str = ".zattrs") -> str:
    """Write the attributes document as a JSON sidecar (A16's group-attrs
    write, minus the zarr store dependency)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(attrs, fh, indent=2, sort_keys=True)
    return path


def dtype_range(dtype: str) -> tuple[float, float]:
    """Min/max derived from the element type, not the data.

    Parity: czi_to_zarr.py:461-475 — the reference uses ``np.iinfo`` /
    ``np.finfo`` per dtype instead of scanning; the data-driven
    percentile is deliberately rejected there (478-480) and offered by
    this engine as ``percentile_approx`` instead (§2B).
    """
    import numpy as np

    np_dtype = np.dtype(dtype)
    info = np.iinfo(np_dtype) if np.issubdtype(np_dtype, np.integer) else np.finfo(np_dtype)
    return float(info.min), float(info.max)
