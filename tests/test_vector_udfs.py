"""Pandas-UDF vector path (§2B UDF surface): batch cosine + centroid
UDAF agree with the JVM fold within float tolerance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.catalog import load_table
from aind_protein_data_transformation_spark.functions.vector import (
    cosine,
    make_centroid_udaf,
    make_cosine_batch_udf,
)


def test_cosine_batch_udf_matches_fold(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).limit(500)
    cos_udf = make_cosine_batch_udf()
    both = pairs.select(
        "ia",
        "ib",
        cosine("ea", "eb").alias("fold"),
        cos_udf("ea", "eb").alias("blas"),
    ).collect()
    assert len(both) == 500
    for r in both:
        assert math.isclose(r.fold, r.blas, rel_tol=1e-12), (r.ia, r.ib)


def test_centroid_udaf_matches_manual_mean(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    dim = len(emb.first()["embedding"])
    centroid = make_centroid_udaf(dim)
    got = {
        r.bucket: r.c
        for r in emb.groupBy((F.col("vec_id") % 4).alias("bucket"))
        .agg(centroid("embedding").alias("c"))
        .collect()
    }
    rows = emb.select((F.col("vec_id") % 4).alias("bucket"), "embedding").collect()
    manual: dict[int, list[float]] = {}
    counts: dict[int, int] = {}
    for r in rows:
        acc = manual.setdefault(r.bucket, [0.0] * dim)
        for i, v in enumerate(r.embedding):
            acc[i] += float(v)
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    for bucket, acc in manual.items():
        for i in range(dim):
            assert math.isclose(got[bucket][i], acc[i] / counts[bucket], rel_tol=1e-9)


def test_centroid_udaf_rejects_wrong_dim(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    centroid = make_centroid_udaf(5)
    with pytest.raises(Exception, match="expected dim"):
        df.groupBy("id").agg(centroid("v")).collect()


def test_train_centroids_deterministic_and_improving(spark, sf_dir):
    from aind_protein_data_transformation_spark.functions.vector import cosine as cos_fold
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets,
        train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(120)
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))

    def objective(centroids):
        assigned = assign_buckets(
            corpus.select(F.col("neighbor_id").alias("vid"), F.col("ce").alias("ve")),
            centroids,
        )
        return (
            corpus.join(assigned, corpus.neighbor_id == assigned.vid)
            .join(centroids, assigned.bucket == centroids.centroid_id)
            .select(cos_fold("ce", "centroid_vec").alias("c"))
            .agg(F.sum("c").alias("s"))
            .first()["s"]
        )

    c0 = train_centroids(corpus, n_centroids=6, n_iters=0)
    c3a = train_centroids(corpus, n_centroids=6, n_iters=3)
    c3b = train_centroids(corpus, n_centroids=6, n_iters=3)
    rows_a = sorted((r.centroid_id, tuple(r.centroid_vec)) for r in c3a.collect())
    rows_b = sorted((r.centroid_id, tuple(r.centroid_vec)) for r in c3b.collect())
    assert rows_a == rows_b  # deterministic
    assert len(rows_a) <= 6 and len(rows_a) >= 2
    # Lloyd's iterations must not worsen total assigned cosine
    assert objective(c3a) >= objective(c0) - 1e-9
