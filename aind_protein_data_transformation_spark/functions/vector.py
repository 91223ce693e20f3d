"""Vector column helpers for embedding similarity.

Cross-engine determinism: Spark's ``aggregate`` (left fold) and
DuckDB's ``list_sum`` produce bit-identical doubles for the same
element order (verified on adversarial inputs), so dot products and
norms computed this way hash-match without any decimal detour.

Scale note: these are JVM higher-order functions — fine for 64-dim
vectors. For wide embeddings the Arrow-batched twins in
``operators/similarity.py`` take over, each behind a MEASURED dim
crossover (dispatch_by_dim): assign_buckets_gemm (index build),
brute_force_topk_gemm / brute_force_topk_auto (exact top-k),
quantize_int8_batch / quantize_int8_auto, and pair_cosine_batch_col
(ivf_topk's verify stage). Same column contracts; agreement with these
folds is test-pinned.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves pandas_udf type hints)
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (norm(a) * norm(b))


def unit_normalize(a: Column | str) -> Column:
    """Vector scaled to unit L2 norm (element-wise double division).

    Precomputing this once per vector turns every pairwise cosine into a
    single dot fold — for an all-pairs similarity over n vectors that is
    3x less work than cosine-per-pair (n norms instead of 2·n² folds).
    ``sql_unit_normalize`` applies the identical op order, so downstream
    dots stay bit-identical across engines.
    """
    a = F.col(a) if isinstance(a, str) else a
    n = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return F.transform(a, lambda x: x.cast("double") / n)


def sql_unit_normalize(a: str) -> str:
    """DuckDB twin of :func:`unit_normalize`."""
    norm = (
        f"sqrt(list_sum(list_transform({a},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    return f"list_transform({a}, x -> CAST(x AS DOUBLE) / {norm})"


def spark_try_unit_normalize_sql(a: str) -> str:
    """Spark-SQL text form of the module-wide try_divide unit
    normalize: a zero-norm vector's elements go NULL, so every
    downstream projection/dot is NULL and it can never emit a pair.
    ONE definition shared by the SRP signer fold
    (operators/similarity.srp_band_vals) and the embedding index's
    stored vectors (operators/embedding_index) — the signer and the
    index's verify stage must never drift apart in op order or casts,
    or the fold/GEMM/index agreement the tests pin silently breaks."""
    return (
        f"transform({a}, x -> try_divide(CAST(x AS DOUBLE), "
        f"sqrt(aggregate({a}, 0.0D, (acc, e) -> "
        f"acc + CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))))"
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (same left-to-right element order)."""
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


def spark_dot_sql(a: str, b: str) -> str:
    """Spark-SQL text twin of :func:`dot` — identical fold (same lambda
    shape, same element order), for queries shipped as static SQL."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def spark_cosine_sql(a: str, b: str) -> str:
    """Spark-SQL text twin of :func:`cosine`."""
    return (
        f"({spark_dot_sql(a, b)} / "
        f"(SQRT({spark_dot_sql(a, a)}) * SQRT({spark_dot_sql(b, b)})))"
    )


# ----------------------------------------------------------- pandas UDF path
#
# The production path for 1k+-dim embeddings (§2B "UDF surface"): Arrow
# ships whole columns of vectors to Python, numpy does one BLAS call per
# batch. NOT oracle-hashable — numpy's pairwise/SIMD summation orders
# differ from the SQL fold — so these back non-checked operators and are
# tested against the fold within 1e-12 relative tolerance.


def make_cosine_batch_udf():
    """Scalar pandas UDF: row-wise cosine of two array columns,
    one vectorized einsum per Arrow batch."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
        nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
        return pd.Series(dots / (na * nb))

    return cosine_batch


def make_centroid_udaf(dim: int):
    """Grouped-agg pandas UDF (UDAF): element-wise mean of an embedding
    column — the k-means centroid update that upgrades ``ivf_topk``'s
    deterministic-subsample centroids to trained ones."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def centroid(vecs: pd.Series) -> list[float]:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        if m.shape[1] != dim:
            raise ValueError(f"expected dim {dim}, got {m.shape[1]}")
        return m.mean(axis=0).tolist()

    return centroid
