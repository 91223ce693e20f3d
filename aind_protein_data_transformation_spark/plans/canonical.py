"""Result canonicalization shared between the Spark engine and the
DuckDB oracle (FIXTURES.md §3, SURVEY.md §2B determinism rules).

Rules:
- column order: sorted by name (the driver's compare does the same);
- floats rounded to 6 decimals and TAGGED as floats: the driver's hash is
  dtype-strict, so an int64 11901 must NOT equal a float64 11901.0 (DuckDB
  HUGEINT sums materialize as float64 via fetchdf; Spark returns bigint —
  round 1 shipped 4 red rows because plain Python ``11901 == 11901.0``
  hid exactly that divergence);
- timestamps normalized to tz-naive UTC at microsecond precision;
- list/array cells converted to tuples (hashable, comparable);
- rows sorted by the canonical tuple representation.
"""

from __future__ import annotations

import math
from datetime import datetime
from decimal import Decimal

import pandas as pd


def _canon_cell(value):
    if value is None:
        return "<NULL>"
    if isinstance(value, float):
        if math.isnan(value):
            return "<NULL>"
        rounded = round(value, 6)
        # normalize -0.0; tag so an int on the other side is NOT equal
        # (dtype-strict, like the driver's hash)
        return ("f", 0.0 if rounded == 0 else rounded)
    if isinstance(value, Decimal):
        return _canon_cell(float(value))
    if isinstance(value, pd.Timestamp):
        if value.tzinfo is not None:
            value = value.tz_convert("UTC").tz_localize(None)
        return value.isoformat()
    if isinstance(value, datetime):
        return pd.Timestamp(value).isoformat()
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        return tuple(_canon_cell(v) for v in value)
    if isinstance(value, bytes):
        return value.hex()
    if isinstance(value, (bool, int, str)):
        return value
    # numpy scalars and anything else with .item()
    item = getattr(value, "item", None)
    if callable(item):
        return _canon_cell(item())
    return str(value)


def canonicalize_pandas(df: pd.DataFrame) -> list[tuple]:
    """Sorted list of canonical row tuples, columns ordered by name.

    Iterates with ``itertuples`` (per-column dtypes preserved), NOT
    ``iterrows``: iterrows materializes each row as a Series, and an
    all-numeric frame with mixed int64/float64 columns gets upcast to
    float64 wholesale — which silently defeated the dtype-strict
    int-vs-float tagging whenever every column was numeric (caught by
    q_histogram_equi_width, the first all-numeric registered query)."""
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def compare_frames(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    """Order-insensitive, rounding-tolerant frame equality.

    Returns (equal, message); message pinpoints the first divergence.
    """
    cols_a, cols_b = sorted(a.columns), sorted(b.columns)
    if cols_a != cols_b:
        return False, f"column mismatch: {cols_a} vs {cols_b}"
    if len(a) != len(b):
        return False, f"row count mismatch: {len(a)} vs {len(b)}"
    ca, cb = canonicalize_pandas(a), canonicalize_pandas(b)
    for i, (ra, rb) in enumerate(zip(ca, cb)):
        if ra != rb:
            return False, f"row {i} differs:\n  spark : {ra}\n  oracle: {rb}"
    return True, "ok"
