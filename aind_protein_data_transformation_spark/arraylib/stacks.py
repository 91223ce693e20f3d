"""Stack discovery + work distribution (SURVEY.md §2A A1-A4).

The reference globs ``*.czi`` under the input dir, sorts by path so
every node derives the identical list (zeiss_job.py:46-62), deals paths
round-robin into N buckets (zeiss_job.py:33-44), and each SLURM task
processes one bucket (zeiss_job.py:233-235). Here the scan is a
``binaryFile`` DataFrame, the deal is a deterministic window expression
(so the assignment is reproducible and SQL-checkable, unlike Spark's
own nondeterministic RoundRobinPartitioning), and bucket selection is a
plain filter Catalyst can prune on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: ``name(3).czi`` -> base ``name``, ordinal ``3`` (zeiss_job.py:132-139).
STACK_NAME_PATTERN = r"(.+)\((\d+)\)\.czi"


def scan_stack_dir(
    spark: SparkSession, input_dir: str, glob: str = "*.czi", with_content: bool = False
) -> DataFrame:
    """A1: list stack files as a DataFrame sorted by path.

    ``binaryFile`` pushes the glob into the file index; with
    ``with_content=False`` only metadata columns survive so the listing
    never reads file bytes (column pruning drops ``content``).
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(input_dir)
    )
    cols = ["path", "length", "modificationTime"] + (["content"] if with_content else [])
    return df.select(*cols).orderBy("path")


def deal_round_robin(df: DataFrame, num_partitions: int, order_col: str = "path") -> DataFrame:
    """A2: deterministic round-robin bucket assignment.

    Bucket of the i-th item (0-based, in ``order_col`` order) is
    ``i % num_partitions`` — exactly the reference's ``partition_list``
    dealing. The global window is fine at any scale: it runs once over
    the *file listing* (thousands of rows), never over data rows.
    """
    rn = F.row_number().over(Window.orderBy(order_col)) - F.lit(1)
    return df.withColumn("bucket", rn % F.lit(num_partitions))


def select_bucket(df: DataFrame, bucket: int) -> DataFrame:
    """A3: keep one bucket's work — the shard-claim filter."""
    return df.filter(F.col("bucket") == F.lit(bucket))


def stack_display_name(name_col: str = "path") -> F.Column:
    """A4: parse ``base(N).czi`` -> ``base_N``; anything else -> ``<file>_0``.

    Pure column expression (regexp_extract + concat) so it runs JVM-side
    inside whole-stage codegen.
    """
    fname = F.element_at(F.split(F.col(name_col), "/"), -1)
    base = F.regexp_extract(fname, STACK_NAME_PATTERN, 1)
    ordinal = F.regexp_extract(fname, STACK_NAME_PATTERN, 2)
    return F.when(base != "", F.concat_ws("_", base, ordinal)).otherwise(
        F.concat(fname, F.lit("_0"))
    )
