"""SQL-checkable projections of the array layer (SURVEY.md §2A).

The fidelity layer in ``arraylib/`` is exercised on real binary stacks
by pytest goldens; these queries re-express its *computations* over the
driver's relational tables so the DuckDB oracle can hash-check the same
semantics at sf0.01:

- windowed-mean downsample + dtype truncation (A10) and the cascading
  two-level recursion (A11) over a voxel grid derived from ``lineitem``;
- deterministic round-robin dealing + bucket claim (A2/A3) over
  ``orders``;
- stack-name regex parsing (A4) over ``part``-derived filenames;
- omero channel metadata math (A13) over ``nation``;
- per-level scale vectors + ceil-division shape recurrence + chunk
  clamping (A14) over ``nation``-derived shapes;
- block-slice enumeration (A19) via ``sequence`` × ``explode``;
- per-channel stats (A12) over ``lineitem``.

Determinism notes: grid values are integer-valued doubles (sums exact in
binary), truncation is explicit (``CAST AS BIGINT`` after ``FLOOR``/
``AVG`` on the Spark side, ``TRUNC``/``FLOOR`` in DuckDB), and every
query orders by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.numeric import dsum, sql_dsum
from ..operators.prefix import partitioned_prefix_sum
from .registry import query

# Voxel grid derived from lineitem: cell value = SUM(l_quantity), exact
# in double (quantities are integer-valued).
_VOX_SQL = """
    SELECT l_orderkey % 16 AS z, l_partkey % 16 AS y, l_suppkey % 16 AS x,
           SUM(l_quantity) AS v
    FROM lineitem
    GROUP BY 1, 2, 3
"""


def _vox(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        (F.col("l_orderkey") % 16).alias("z"),
        (F.col("l_partkey") % 16).alias("y"),
        (F.col("l_suppkey") % 16).alias("x"),
    ).agg(F.sum("l_quantity").alias("v"))


def _downsample(df: DataFrame) -> DataFrame:
    """One dtype-preserving windowed-mean level (A10): mean per 2×2×2
    window, truncated toward zero like numpy ``astype`` on an integer
    dtype (czi_to_zarr.py:342-386; values here are non-negative so
    FLOOR == TRUNC on the oracle side)."""
    return df.groupBy(
        F.floor(F.col("z") / 2).alias("z"),
        F.floor(F.col("y") / 2).alias("y"),
        F.floor(F.col("x") / 2).alias("x"),
    ).agg(F.avg("v").cast("long").cast("double").alias("v"))


_DOWNSAMPLE_SQL = """
    SELECT CAST(FLOOR(z / 2) AS BIGINT) AS z,
           CAST(FLOOR(y / 2) AS BIGINT) AS y,
           CAST(FLOOR(x / 2) AS BIGINT) AS x,
           CAST(CAST(TRUNC(AVG(v)) AS BIGINT) AS DOUBLE) AS v
    FROM {src}
    GROUP BY 1, 2, 3
"""


@query(
    "pyramid_windowed_mean",
    oracle=f"""
    WITH vox AS ({_VOX_SQL})
    {_DOWNSAMPLE_SQL.format(src="vox")}
    ORDER BY z, y, x
    """,
)
def pyramid_windowed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: one windowed-mean pyramid level over a 16³ voxel grid.

    Plan shape: two stacked hash aggregates, each with partial+final
    map-side combine — the shuffle carries one row per output cell (8×
    reduction), which is why the full cascade's shuffle volume converges
    at 100 TB (arraylib/pyramid.py docstring)."""
    return _downsample(_vox(spark, sf_dir)).orderBy("z", "y", "x")


@query(
    "pyramid_cascade_l2",
    oracle=f"""
    WITH vox AS ({_VOX_SQL}),
         l1 AS ({_DOWNSAMPLE_SQL.format(src="vox")})
    {_DOWNSAMPLE_SQL.format(src="l1")}
    ORDER BY z, y, x
    """,
)
def pyramid_cascade_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: the cascading recursion — level 2 is the windowed mean *of
    level 1's truncated means*, not a deep 4×4×4 mean of level 0
    (czi_to_zarr.py:527-540). The stacked-truncation values pin the
    levelwise semantics."""
    return _downsample(_downsample(_vox(spark, sf_dir))).orderBy("z", "y", "x")


@query(
    "pyramid_channel_stats",
    oracle=f"""
    SELECT l_linenumber AS c,
           MIN(l_extendedprice) AS v_min,
           MAX(l_extendedprice) AS v_max,
           {sql_dsum('l_quantity', 'v_sum')},
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_linenumber
    ORDER BY c
    """,
)
def pyramid_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: data-driven per-channel stats — the scan the reference avoids
    by using dtype ranges (czi_to_zarr.py:461-481); one pass, partial
    aggregation, no second-stage work beyond 7 groups."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_linenumber").alias("c"))
        .agg(
            F.min("l_extendedprice").alias("v_min"),
            F.max("l_extendedprice").alias("v_max"),
            dsum("l_quantity", "v_sum"),
            F.count("*").alias("n"),
        )
        .orderBy("c")
    )


@query(
    "stack_deal_round_robin",
    oracle=f"""
    WITH dealt AS (
        SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) % 5 AS bucket,
               o_totalprice
        FROM orders
    )
    SELECT bucket, COUNT(*) AS n_claimed, {sql_dsum('o_totalprice', 'claimed_value')}
    FROM dealt
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def stack_deal_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3: the reference's deterministic deal (index % n over the
    sorted list, zeiss_job.py:33-44) and per-bucket claim. In arraylib
    the deal runs over the work *listing* (bounded metadata — stacks.py
    can afford a global row_number); this oracle proxy deals the ORDERS
    table, which is data-sized, so the global index comes from the
    two-phase distributed prefix sum instead of an unpartitioned
    ROW_NUMBER window (which would funnel the whole relation through
    one task — the round-4 q_ntile fix, same pattern)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("_one")
    )
    dealt = partitioned_prefix_sum(
        orders, "o_orderkey", "_one", out_col="_idx"
    ).select(((F.col("_idx") - 1) % 5).alias("bucket"), "o_totalprice")
    return (
        dealt.groupBy("bucket")
        .agg(F.count("*").alias("n_claimed"), dsum("o_totalprice", "claimed_value"))
        .orderBy("bucket")
    )


_STACK_RE = r"(.+)\((\d+)\)\.czi"


@query(
    "stack_regex_rename",
    oracle=f"""
    WITH files AS (
        SELECT p_partkey,
               CASE WHEN p_partkey % 3 = 0
                    THEN p_name || '(' || CAST(p_partkey % 7 AS VARCHAR) || ').czi'
                    ELSE p_name || '.czi' END AS fname
        FROM part
    )
    SELECT p_partkey, fname,
           CASE WHEN regexp_extract(fname, '{_STACK_RE}', 1) <> ''
                THEN regexp_extract(fname, '{_STACK_RE}', 1) || '_' ||
                     regexp_extract(fname, '{_STACK_RE}', 2)
                ELSE fname || '_0' END AS stack_name
    FROM files
    ORDER BY p_partkey
    """,
)
def stack_regex_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: ``base(N).czi -> base_N`` else ``<file>_0`` (zeiss_job.py:
    132-139) as pure column expressions — regexp_extract + concat inside
    whole-stage codegen, no UDF."""
    part = load_table(spark, sf_dir, "part")
    fname = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat(F.col("p_name"), F.lit("("), (F.col("p_partkey") % 7).cast("string"), F.lit(").czi")),
    ).otherwise(F.concat(F.col("p_name"), F.lit(".czi")))
    files = part.select("p_partkey", fname.alias("fname"))
    base = F.regexp_extract("fname", _STACK_RE, 1)
    num = F.regexp_extract("fname", _STACK_RE, 2)
    return files.select(
        "p_partkey",
        "fname",
        F.when(base != "", F.concat(base, F.lit("_"), num))
        .otherwise(F.concat(F.col("fname"), F.lit("_0")))
        .alias("stack_name"),
    ).orderBy("p_partkey")


@query(
    "ome_channel_windows",
    oracle="""
    SELECT n_nationkey AS c,
           'Channel:stack_0:' || CAST(n_nationkey AS VARCHAR) AS label,
           printf('%06x', n_nationkey) AS color,
           0.0 AS window_min,
           65535.0 AS window_max,
           CAST(n_nationkey % 2 = 0 AS BOOLEAN) AS active
    FROM nation
    ORDER BY c
    """,
)
def ome_channel_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: the omero channel block's computed fields — default label
    ``Channel:<img>:<i>``, 6-digit lowercase hex color, dtype-derived
    window bounds (czi_to_zarr.py:28-96) — as column expressions over a
    channels relation."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        F.col("n_nationkey").alias("c"),
        F.concat(F.lit("Channel:stack_0:"), F.col("n_nationkey").cast("string")).alias("label"),
        F.format_string("%06x", F.col("n_nationkey")).alias("color"),
        F.lit(0.0).alias("window_min"),
        F.lit(65535.0).alias("window_max"),
        (F.col("n_nationkey") % 2 == 0).alias("active"),
    ).orderBy("c")


@query(
    "ome_scale_recurrence",
    oracle="""
    WITH shapes AS (
        SELECT n_nationkey, 64 + n_nationkey * 37 AS sz,
               48 + n_nationkey * 21 AS sy, 33 + n_nationkey * 13 AS sx
        FROM nation
    ), lvls AS (SELECT unnest(generate_series(0, 3)) AS lvl)
    SELECT n_nationkey, lvl,
           1.0 * POW(2, lvl) AS scale_z,
           0.5 * POW(2, lvl) AS scale_y,
           0.5 * POW(2, lvl) AS scale_x,
           CAST(CEIL(sz / POW(2, lvl)) AS BIGINT) AS shape_z,
           CAST(CEIL(sy / POW(2, lvl)) AS BIGINT) AS shape_y,
           CAST(CEIL(sx / POW(2, lvl)) AS BIGINT) AS shape_x,
           LEAST(CAST(CEIL(sz / POW(2, lvl)) AS BIGINT), 128) AS chunk_z,
           LEAST(CAST(CEIL(sy / POW(2, lvl)) AS BIGINT), 64) AS chunk_y,
           LEAST(CAST(CEIL(sx / POW(2, lvl)) AS BIGINT), 64) AS chunk_x
    FROM shapes CROSS JOIN lvls
    ORDER BY n_nationkey, lvl
    """,
)
def ome_scale_recurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: per-level scale vectors ``v * f^k``, the ceil-division shape
    recurrence in closed form (``ceil(ceil(n/f)/f) == ceil(n/f²)``,
    czi_to_zarr.py:99-195), and chunk clamping ``min(shape, chunk)`` —
    pure metadata math, here fanned out with ``sequence``+``explode``."""
    nation = load_table(spark, sf_dir, "nation")
    shapes = nation.select(
        "n_nationkey",
        (64 + F.col("n_nationkey") * 37).alias("sz"),
        (48 + F.col("n_nationkey") * 21).alias("sy"),
        (33 + F.col("n_nationkey") * 13).alias("sx"),
    )
    lvls = shapes.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("lvl")
    )
    two_k = F.pow(F.lit(2), F.col("lvl"))

    def shape_at(col: str):
        return F.ceil(F.col(col) / two_k).cast("long")

    return lvls.select(
        "n_nationkey",
        "lvl",
        (F.lit(1.0) * two_k).alias("scale_z"),
        (F.lit(0.5) * two_k).alias("scale_y"),
        (F.lit(0.5) * two_k).alias("scale_x"),
        shape_at("sz").alias("shape_z"),
        shape_at("sy").alias("shape_y"),
        shape_at("sx").alias("shape_x"),
        F.least(shape_at("sz"), F.lit(128)).alias("chunk_z"),
        F.least(shape_at("sy"), F.lit(64)).alias("chunk_y"),
        F.least(shape_at("sx"), F.lit(64)).alias("chunk_x"),
    ).orderBy("n_nationkey", "lvl")


@query(
    "grid_block_slices",
    oracle="""
    WITH zs AS (SELECT unnest(generate_series(0, 69, 32)) AS z0),
         ys AS (SELECT unnest(generate_series(0, 44, 16)) AS y0),
         xs AS (SELECT unnest(generate_series(0, 32, 8)) AS x0)
    SELECT z0, CAST(LEAST(z0 + 32, 70) AS BIGINT) AS z1,
           y0, CAST(LEAST(y0 + 16, 45) AS BIGINT) AS y1,
           x0, CAST(LEAST(x0 + 8, 33) AS BIGINT) AS x1
    FROM zs CROSS JOIN ys CROSS JOIN xs
    ORDER BY z0, y0, x0
    """,
)
def grid_block_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19: tile shape (70, 45, 33) by blocks (32, 16, 8) — row-major
    starts with truncated edge blocks (zarr_writer.py:129-186), produced
    distributed as ``sequence`` × ``explode`` cross products instead of
    the reference's recursive driver-side generator."""

    def starts(alias: str, size: int, step: int) -> DataFrame:
        return spark.range(1).select(
            F.explode(F.sequence(F.lit(0), F.lit(size - 1), F.lit(step))).alias(alias)
        ).select(F.col(alias).cast("long").alias(alias))

    df = starts("z0", 70, 32).crossJoin(starts("y0", 45, 16)).crossJoin(starts("x0", 33, 8))
    return df.select(
        "z0",
        F.least(F.col("z0") + 32, F.lit(70)).cast("long").alias("z1"),
        "y0",
        F.least(F.col("y0") + 16, F.lit(45)).cast("long").alias("y1"),
        "x0",
        F.least(F.col("x0") + 8, F.lit(33)).cast("long").alias("x1"),
    ).orderBy("z0", "y0", "x0")
