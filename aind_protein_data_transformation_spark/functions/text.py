"""Text + portable-hash column helpers.

``hash64`` is the engine-portable 64-bit hash shared with the DuckDB
oracle: both engines md5 the string, take the first 15 hex digits
(60 bits), and parse as a bigint — verified bit-identical
(Spark ``conv(substring(md5(s),1,15),16,10)`` == DuckDB
``('0x'||substr(md5(s),1,15))::BIGINT``). Spark's native ``xxhash64``/
``hash`` would be faster but DuckDB cannot reproduce them; at 100 TB
swap ``hash64`` for ``xxhash64`` — every operator takes the hash column
as an expression, so the swap is one line.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: SQL fragment twins (DuckDB) — keep in lockstep with the Column versions.
SQL_HASH64 = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
SQL_TOKENS = "list_filter(regexp_split_to_array({expr}, '\\s+'), t -> t <> '')"


def hash64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties dropped (both-engine semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def normalize_text(col: Column | str) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim
    (SURVEY.md §2B 'exact dedup by normalized-text hash')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


SQL_NORMALIZE = "trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def word_shingles(tokens_col: Column, k: int) -> Column:
    """All word k-grams of a token array as space-joined strings; empty
    array when the doc has fewer than k tokens. Indexing is 1-based via
    element_at, matching DuckDB list indexing (Spark's ``arr[i]`` is
    0-based — deliberately avoided)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j) for j in range(k)]
        ),
    )
    return F.when(F.size(tokens_col) < k, F.array().cast("array<string>")).otherwise(
        grams
    )


def sql_word_shingles(tokens_expr: str, k: int) -> str:
    """DuckDB twin of :func:`word_shingles` (1-based list indexing)."""
    parts = ", ".join(f"{tokens_expr}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({tokens_expr}) < {k} THEN [] "
        f"ELSE list_transform(generate_series(1, len({tokens_expr}) - {k - 1}),"
        f" i -> concat_ws(' ', {parts})) END"
    )
