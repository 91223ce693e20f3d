"""Similarity search over embedding columns (SURVEY.md §2B "LLM:
similarity"; north_star ANN requirement).

Two paths:
- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus scan. Per-executor work is a local
  scan+rank; the only shuffle is the final per-query top-k window,
  which WindowGroupLimit trims to k rows per query BEFORE the
  shuffle. This is the 100-TB baseline when queries are few.
- ``ivf_topk`` — IVF-style bucketed ANN: assign every corpus vector
  to its nearest centroid (one broadcast join, computed once and
  reusable as a materialized index), probe only the ``nprobe``
  nearest buckets per query. Corpus scan cost drops by
  ~n_buckets/nprobe; recall traded per nprobe. Centroids here are a
  deterministic subsample (vec_id % stride) so the DuckDB oracle can
  replay the whole index build — a production build would k-means
  them, which only changes the centroid table.

For 1k+-dim vectors swap functions/vector.py's fold for an
Arrow-batched pandas UDF (one BLAS GEMM per batch); the operator
shapes (broadcast, bucket join, window top-k) stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
) -> DataFrame:
    """Exact cosine top-k of each query vector over the corpus.

    ``queries``: (query_id, qe); ``corpus``: (neighbor_id, ce).
    Deterministic: ties broken by neighbor id.
    """
    sims = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, cosine("qe", "ce").alias("cosine"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def assign_buckets(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_id: str = "vid",
    vec_col: str = "ve",
) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, bucket). One broadcast
    join + per-vector argmax; at scale this is the index build, run
    once and persisted."""
    w = Window.partitionBy(vec_id).orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select(
            vec_id,
            "centroid_id",
            cosine(vec_col, "centroid_vec").alias("c_cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(vec_id, F.col("centroid_id").alias("bucket"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest buckets per query, exact
    cosine within candidates. queries: (query_id, qe);
    corpus: (neighbor_id, ce); centroids: (centroid_id, centroid_vec).
    """
    corpus_buckets = assign_buckets(
        corpus.select(F.col("neighbor_id").alias("vid"), F.col("ce").alias("ve")),
        centroids,
    ).select(F.col("vid").alias("neighbor_id"), "bucket")
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    query_probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "centroid_id",
            cosine("qe", "centroid_vec").alias("c_cos"),
        )
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", F.col("centroid_id").alias("bucket"))
    )
    candidates = (
        F.broadcast(query_probes)
        .join(corpus_buckets, "bucket")
        .join(F.broadcast(queries), "query_id")
        .join(corpus, "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        candidates.select(
            "query_id", "neighbor_id", cosine("qe", "ce").alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    n_iters: int = 3,
    corpus_id: str = "neighbor_id",
    vec_col: str = "ce",
) -> DataFrame:
    """Lloyd's k-means over embeddings — the iterative upgrade from
    ``ivf_topk``'s deterministic-subsample centroids to trained ones.

    Each iteration is two distributed steps: nearest-centroid assignment
    (broadcast join + per-vector argmax) and the centroid update (one
    grouped-agg pandas UDAF doing a numpy mean per bucket). Determinism:
    the init is the stride subsample by id order, assignment ties break
    by centroid id, and the elementwise mean is a fixed-shape numpy
    reduction — repeated runs produce identical centroids.

    At 100 TB: assignment is a map-side broadcast pass over the corpus
    (no shuffle of the vectors beyond the partial aggregation of
    per-bucket sums); only k centroid rows ever reach the driver.
    """
    from ..functions.vector import make_centroid_udaf

    ordered = corpus.orderBy(corpus_id).select(
        F.col(corpus_id).alias("vid"), F.col(vec_col).alias("ve")
    )
    n_total = ordered.count()
    stride = max(1, n_total // n_centroids)
    w = Window.orderBy("vid")
    centroids = (
        ordered.withColumn("_rn", F.row_number().over(w) - 1)
        .filter((F.col("_rn") % stride == 0) & (F.col("_rn") / stride < n_centroids))
        .select(
            (F.col("_rn") / stride).cast("long").alias("centroid_id"),
            F.col("ve").alias("centroid_vec"),
        )
    )
    dim = len(ordered.first()["ve"])
    centroid_udaf = make_centroid_udaf(dim)
    for _ in range(n_iters):
        assigned = assign_buckets(ordered, F.broadcast(centroids), "vid", "ve")
        centroids = (
            ordered.join(assigned, "vid")
            .groupBy(F.col("bucket").alias("centroid_id"))
            .agg(centroid_udaf(F.col("ve").cast("array<double>")).alias("centroid_vec"))
        )
    return centroids
