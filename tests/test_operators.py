"""Unit tests for operators not (or no longer) on the oracle path."""

from __future__ import annotations


def test_exact_dedup_marks_survivors(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello  World"),
            (2, "hello world"),
            (3, "HELLO WORLD  "),
            (4, "something else"),
        ],
        "doc_id long, text string",
    )
    from aind_protein_data_transformation_spark.operators.dedup import exact_dedup

    rows = {r.doc_id: r for r in exact_dedup(docs).collect()}
    assert rows[1].is_kept and not rows[2].is_kept and not rows[3].is_kept
    assert rows[4].is_kept
    assert rows[1].group_size == 3 and rows[4].group_size == 1
    assert rows[1].content_hash == rows[2].content_hash == rows[3].content_hash


def test_salted_vs_unsalted_plan_note(spark):
    # exact_dedup keeps rows; the group-summary query path aggregates
    # directly with one shuffle — both must agree on group sizes.
    docs = spark.createDataFrame(
        [(i, f"doc {i % 3}") for i in range(30)], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.functions.text import normalize_text
    from aind_protein_data_transformation_spark.operators.dedup import exact_dedup

    via_operator = {
        r.content_hash: r.group_size
        for r in exact_dedup(docs).select("content_hash", "group_size").distinct().collect()
    }
    via_agg = {
        r.content_hash: r.n
        for r in docs.select(F.sha2(normalize_text("text"), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert via_operator == via_agg


def _duck_quantiles(sf_dir: str, ps: list[float], col: str) -> dict:
    import duckdb

    con = duckdb.connect()
    exprs = ", ".join(
        f"quantile_cont(CAST({col} AS DOUBLE), {p}) AS p{i}" for i, p in enumerate(ps)
    )
    df = con.execute(
        f"SELECT l_returnflag, {exprs} FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    con.close()
    return {
        r.l_returnflag: [getattr(r, f"p{i}") for i in range(len(ps))]
        for r in df.itertuples()
    }


def test_percentile_forms_bit_equal_duckdb(spark, sf_dir):
    """All three percentile implementations reproduce DuckDB
    quantile_cont bit-for-bit (weighted interpolation form)."""
    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.percentile import (
        column_percentiles,
        column_percentiles_rank_select,
    )

    li = load_table(spark, sf_dir, "lineitem")
    ps = [0.25, 0.5, 0.9]
    spec = [(p, f"p{i}") for i, p in enumerate(ps)]
    expect = _duck_quantiles(sf_dir, ps, "l_extendedprice")

    for form in (
        column_percentiles(li, ["l_returnflag"], "l_extendedprice", spec),
        column_percentiles(
            li, ["l_returnflag"], "l_extendedprice", spec, pre_aggregate=False
        ),
        column_percentiles_rank_select(
            li, ["l_returnflag"], "l_extendedprice", spec, octave_subdivisions=16
        ),
    ):
        got = {
            r.l_returnflag: [r.p0, r.p1, r.p2]
            for r in form.orderBy("l_returnflag").collect()
        }
        assert got == expect  # == on floats: bit-equality is the contract


def test_percentile_rank_select_degenerate_groups(spark):
    """Single-value and single-row groups survive the bucket math."""
    from aind_protein_data_transformation_spark.operators.percentile import (
        column_percentiles_rank_select,
    )

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 7.5)], "g string, v double"
    )
    got = {
        r.g: (r.med, r.p90)
        for r in column_percentiles_rank_select(
            df, ["g"], "v", [(0.5, "med"), (0.9, "p90")], octave_subdivisions=4
        ).collect()
    }
    assert got == {"a": (5.0, 5.0), "b": (7.5, 7.5)}


def test_count_above_matches_bruteforce(spark):
    """Banded range-count == brute-force theta join, including negative
    values, boundary-bucket ties, empty buckets, and zero-match probes."""
    import random

    from aind_protein_data_transformation_spark.operators.range_join import count_above

    rnd = random.Random(7)
    build_vals = [round(rnd.uniform(-50, 50), 1) for _ in range(500)]
    probe_vals = [round(rnd.uniform(-60, 60), 1) for _ in range(40)] + [100.0, -100.0]
    build = spark.createDataFrame([(v,) for v in build_vals], "v double")
    probe = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probe_vals)], "pid long, p double"
    )
    got = {
        r.pid: r.n_above
        for r in count_above(probe, build, "p", "v", bucket_width=7.3).collect()
    }
    expect = {
        i: sum(1 for b in build_vals if b > v) for i, v in enumerate(probe_vals)
    }
    assert got == expect
    assert got[len(probe_vals) - 2] == 0       # probe above all build rows
    assert got[len(probe_vals) - 1] == 500     # probe below all build rows


def test_partitioned_prefix_sum_matches_global_window(spark):
    """The two-phase distributed prefix sum must equal the naive global
    window, including with skewed values and many partitions."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from aind_protein_data_transformation_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(500)], "k long, v long"
    )
    got = {
        r.k: r.ps
        for r in partitioned_prefix_sum(df, "k", "v", "ps", num_partitions=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r.k: r.ps for r in df.withColumn("ps", F.sum("v").over(w)).collect()}
    assert got == want


def test_prefix_sum_no_global_data_window(spark, sf_dir):
    """Scale shape: in the packing query's executed plan, every window
    over DATA rows is partitioned (by the range-partition id); the only
    unpartitioned window runs over the k-row per-partition totals."""
    from aind_protein_data_transformation_spark.queries.packing import (
        pack_sequences_fixed,
    )

    plan = (
        pack_sequences_fixed(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # node format: `Window [exprs], [partitionSpec], [orderSpec]` when
    # partitioned, `Window [exprs], [orderSpec]` when not
    unpartitioned = []
    for frag in plan.split("+- Window [")[1:]:
        spec = frag.split("\n")[0]
        if spec.count("], [") < 2:
            unpartitioned.append(spec)
    # exactly the k-row offsets window; it must sit above the partial
    # aggregation of partition totals, never above a data-sized input
    assert len(unpartitioned) == 1, (unpartitioned, plan)
    assert "_ptot" in unpartitioned[0]


def test_sketch_reaggregation_error_headroom(spark, sf_dir):
    """q_sketch_reaggregation's driver row only checks a <=10% tolerance
    boolean (the oracle is constant TRUE, per the FIXTURES.md pattern),
    so this is where a near-threshold drift becomes diagnosable: the
    merged-HLL estimate must sit within 5% of exact — half the driver
    margin — and the assertion message carries the observed error."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    shards = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    merged = shards.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact")
    )
    for r in merged.join(exact, "l_returnflag").collect():
        rel = abs(r.approx - r.exact) / r.exact
        assert rel <= 0.05, (
            f"group {r.l_returnflag}: merged HLL estimate {r.approx} vs exact "
            f"{r.exact} — relative error {rel:.4f} is eating the driver margin"
        )


def test_assign_buckets_gemm_agrees_with_fold(spark, sf_dir):
    """The BLAS index build must produce the IDENTICAL assignment the
    oracle-checkable HOF fold produces (same cosine argmax, same
    lowest-centroid-id tie-break) — this agreement test is what lets
    the GEMM path stand in for assign_buckets at scale without an
    oracle row of its own."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets,
        assign_buckets_gemm,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    cents = stride_centroids(corpus, 40)
    fold = {r.vid: r.bucket for r in assign_buckets(corpus, cents).collect()}
    gemm = {r.vid: r.bucket for r in assign_buckets_gemm(corpus, cents).collect()}
    assert gemm == fold


def test_srp_band_vals_gemm_agrees_with_fold(spark, sf_dir):
    """The SRP signature's BLAS twin must produce the IDENTICAL band
    values the oracle-replayable fold produces on the fixtures (signs
    far from the BLAS low-bit knife edge) — the agreement that lets the
    GEMM form stand in for the dedup_embedding_srp blocking at scale.
    Also pins the weight-matrix determinism: the numpy md5 replay must
    equal the Spark SQL md5 arithmetic element-for-element."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        srp_band_vals,
        srp_band_vals_gemm,
        srp_weight_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    fold = {r.vec_id: list(r.band_vals) for r in srp_band_vals(emb).collect()}
    gemm = {r.vec_id: list(r.band_vals) for r in srp_band_vals_gemm(emb).collect()}
    assert gemm == fold and fold
    # every vector produced 4 bands of 8 bits
    assert all(len(v) == 4 and all(0 <= x < 256 for x in v) for v in fold.values())
    # weight determinism: numpy replay == Spark SQL md5 arithmetic
    import numpy as np

    w_np = srp_weight_matrix(2, 3)
    w_sql = spark.sql(
        "SELECT transform(sequence(0, 1), b -> transform(sequence(1, 3), j -> "
        "CAST(conv(substring(md5(concat('srp:', CAST(b AS STRING), ':', "
        "CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000)) AS wm"
    ).first()["wm"]
    assert np.array_equal(w_np, np.array(w_sql, dtype=np.float64))


def test_srp_band_vals_gemm_zero_norm_and_ragged_edges(spark):
    """Zero-norm vectors produce all-zero bits on BOTH forms (NaN
    comparisons are False in numpy; NULL fails >= in SQL), and a ragged
    batch raises the _stack_vectors contract error, not a numpy one."""
    import pytest

    from aind_protein_data_transformation_spark.operators.similarity import (
        srp_band_vals,
        srp_band_vals_gemm,
    )

    rows = [(1, [0.0] * 8), (2, [1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 4.0, -4.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    fold = {r.vec_id: list(r.band_vals) for r in srp_band_vals(df).collect()}
    gemm = {r.vec_id: list(r.band_vals) for r in srp_band_vals_gemm(df).collect()}
    assert fold[1] == [0, 0, 0, 0]
    assert gemm == fold
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id bigint, embedding array<float>",
    )
    with pytest.raises(Exception, match="fixed-dimension"):
        srp_band_vals_gemm(ragged).collect()


def test_assign_buckets_gemm_empty_centroids(spark, sf_dir):
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets_gemm,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    none = stride_centroids(corpus.filter(F.col("vid") < 0), 40)
    assert assign_buckets_gemm(corpus, none).count() == 0


def test_ivf_topk_gemm_path_identical(spark, sf_dir):
    """ivf_topk(gemm=True) must return exactly the rows of the fold
    path — the index build is the only stage that switches."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        ivf_topk,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    cents = stride_centroids(
        emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve")), 40
    )
    cols = ["query_id", "neighbor_id", "rank"]
    fold = {tuple(r) for r in ivf_topk(q, c, cents).select(*cols).collect()}
    gemm = {tuple(r) for r in ivf_topk(q, c, cents, gemm=True).select(*cols).collect()}
    assert gemm == fold


def test_ivf_topk_verify_batch_identical(spark, sf_dir):
    """ivf_topk(verify_batch=True) — the Arrow-batched verify cosine —
    must return the same neighbor set and ranks as the fold verify
    (cosines agree within BLAS-vs-fold tolerance), and the auto
    dispatch (verify_batch=None) must pick the fold plan at the
    fixtures' dim-64 (no Python eval node) per the measured
    PAIR_COSINE_UDF_MIN_DIM crossover."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        ivf_topk,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    cents = stride_centroids(
        emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve")), 40
    )
    import pytest

    fold_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ivf_topk(q, c, cents).collect()
    }
    batch_rows = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in ivf_topk(q, c, cents, verify_batch=True).collect()
    }
    assert set(batch_rows) == set(fold_rows) and fold_rows
    for key, (nid, cos) in fold_rows.items():
        bnid, bcos = batch_rows[key]
        assert bnid == nid
        assert bcos == pytest.approx(cos, rel=1e-9)
    # auto dispatch at dim-64 stays on the fold plan (no Python eval)
    auto_plan = (
        ivf_topk(q, c, cents, verify_batch=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in auto_plan
    # a calibrated threshold (calibrate_dispatch output) overrides the
    # module constant: pair_min_dim at/below the fixture dim flips the
    # auto dispatch to the Arrow verify stage
    calibrated_plan = (
        ivf_topk(q, c, cents, verify_batch=None, pair_min_dim=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" in calibrated_plan


def test_ivf_topk_verify_batch_zero_norm_edges(spark):
    """The batch verify replicates try_divide's zero-norm semantics:
    a zero-norm corpus vector gets null cosine and ranks last on BOTH
    verify paths."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.similarity import (
        ivf_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 0.0, 0.0]),  # zero-norm corpus vector
            (3, [0.5, 0.5, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0])], "centroid_id bigint, centroid_vec array<float>"
    )
    for vb in (False, True):
        rows = {
            r.rank: (r.neighbor_id, r.cosine)
            for r in ivf_topk(q, c, cents, k=3, nprobe=1, verify_batch=vb).collect()
        }
        assert rows[1][0] == 1 and rows[2][0] == 3
        assert rows[3] == (2, None), f"verify_batch={vb}: {rows}"


def test_train_centroids_gemm_matches_fold(spark, sf_dir):
    """With the exact (decimal-sum) update, the whole Lloyd loop must be
    bit-reproducible whichever assignment engine runs: per-iteration
    assignments agree exactly (the gemm agreement test), so the trained
    centroids must too."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        train_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    a = {
        r.centroid_id: tuple(r.centroid_vec)
        for r in train_centroids(emb, 10, n_iters=2, exact=True).collect()
    }
    b = {
        r.centroid_id: tuple(r.centroid_vec)
        for r in train_centroids(emb, 10, n_iters=2, exact=True, gemm=True).collect()
    }
    assert a == b


def test_sql_string_operators_handle_dotted_and_spaced_columns(spark):
    """The SQL-string operator builders (asof_join, shingle_set,
    column_percentiles*) interpolate user column names into
    selectExpr/DDL strings — backtick-quoting must survive names with
    spaces and dots (VERDICT r4 #4). Each form is checked against the
    same operator run on plain names."""
    from aind_protein_data_transformation_spark.operators.asof import asof_join
    from aind_protein_data_transformation_spark.operators.dedup import shingle_set
    from aind_protein_data_transformation_spark.operators.percentile import (
        column_percentiles,
        column_percentiles_rank_select,
    )

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 7, "c")],
        "`user id` long, `t.s` long, payload string",
    )
    right = spark.createDataFrame(
        [(1, 9, 100.0), (1, 20, 200.0), (2, 8, 300.0)],
        "`user id` long, `t.s` long, `the value` double",
    )
    got = {
        (r["user id"], r["t.s"]): r["asof_the value"]
        for r in asof_join(
            left, right, on="user id", left_time="t.s", right_time="t.s",
            right_values=["the value"],
        ).collect()
    }
    assert got == {(1, 10): 100.0, (1, 25): 200.0, (2, 7): None}

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4"), (2, "w2 w3 w4 w5")],
        "`doc id` long, `the text` string",
    )
    sh = shingle_set(docs, k=3, text_col="the text", id_col="doc id")
    counts = {
        r["doc id"]: r.n
        for r in sh.groupBy("doc id").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {1: 2, 2: 2}

    vals = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 12)],
        "`the group` string, `the value` double",
    )
    for fn in (column_percentiles, column_percentiles_rank_select):
        row = fn(vals, ["the group"], "the value", [(0.5, "med")]).collect()[0]
        assert row["the group"] == "g" and row["med"] == 6.0, (fn.__name__, row)


def test_assign_buckets_zero_norm_centroid_agreement(spark):
    """Zero-norm centroid edge (ADVICE r5): the raw fold cosine is 0/0
    = NaN, which sorts FIRST under desc — a zero-norm centroid would
    have captured every vector while the GEMM path never picked it.
    Both paths now EXCLUDE zero-norm centroids; a zero-norm vector
    lands in the lowest-id valid bucket in both."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets,
        assign_buckets_gemm,
    )

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, -1.0]),
         (4, [0.0, 0.0])],  # zero-norm vector
        "vid bigint, ve array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]),   # zero-norm centroid: must capture NOTHING
         (5, [1.0, 0.1]), (9, [0.0, 1.0])],
        "centroid_id bigint, centroid_vec array<double>",
    )
    fold = {r.vid: r.bucket for r in assign_buckets(vecs, cents).collect()}
    gemm = {r.vid: r.bucket for r in assign_buckets_gemm(vecs, cents).collect()}
    assert fold == gemm
    assert 0 not in set(fold.values())
    assert fold[4] == 5  # zero-norm vector -> lowest-id valid bucket

    # all-degenerate codebook: both paths drop every vector
    dead = cents.filter("centroid_id = 0")
    assert assign_buckets(vecs, dead).count() == 0
    assert assign_buckets_gemm(vecs, dead).count() == 0


def test_quantize_int8_batch_bit_identical_to_hof(spark, sf_dir):
    """The Arrow-batch quantize kernel must agree BIT-FOR-BIT with the
    oracle-parity HOF query (VERDICT r5 #4): scale/codes/saturation are
    exact by shared IEEE ops, and the kernel's sequential per-dimension
    MSE accumulation replays the HOF fold's exact order."""
    from aind_protein_data_transformation_spark.operators.similarity import (
        quantize_int8_batch,
    )
    from aind_protein_data_transformation_spark.queries.llm_similarity import (
        embedding_quantize_int8,
    )

    hof = {
        r.vec_id: (r.qscale, r.n_saturated, r.recon_mse)
        for r in embedding_quantize_int8(spark, sf_dir).collect()
    }
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    batch = {
        r.vec_id: (r.qscale, r.n_saturated, r.recon_mse)
        for r in quantize_int8_batch(emb).collect()
    }
    assert set(batch) == set(hof)
    diverged = {
        k: (batch[k], hof[k]) for k in hof if batch[k] != hof[k]
    }
    assert not diverged, f"{len(diverged)} vectors diverge: {list(diverged.items())[:3]}"


def test_quantize_int8_batch_constructed_edges(spark):
    """Bit-identity on constructed edges the table data may not hit:
    the all-zero vector (amax 0 -> qscale 1), a constant vector (every
    code saturates at +-127 exactly), a negative-heavy vector, and a
    tiny-magnitude vector (qscale << 1)."""
    from aind_protein_data_transformation_spark.operators.similarity import (
        quantize_int8_batch,
    )
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 0.0, 0.0]),
            (2, [5.0, 5.0, 5.0, 5.0]),
            (3, [-3.5, 2.25, -0.125, 1.0]),
            (4, [1e-8, -2e-8, 3e-8, -4e-8]),
            (5, [127.0, -127.0, 1.0, -1.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    # inline HOF twin of the registered query's projection
    x = F.col("embedding")
    amax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    qscale = F.when(amax == 0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    with_scale = emb.select("vec_id", "embedding", qscale.alias("qscale"))
    codes = F.transform(
        F.col("embedding"),
        lambda v: F.greatest(
            F.lit(-127.0),
            F.least(
                F.lit(127.0),
                F.floor(v.cast("double") / F.col("qscale") + F.lit(0.5)).cast(
                    "double"
                ),
            ),
        ),
    )
    with_codes = with_scale.select(
        "vec_id", "embedding", "qscale", codes.alias("codes")
    )
    sq_err = F.zip_with(
        F.col("embedding"),
        F.col("codes"),
        lambda v, q: (v.cast("double") - q * F.col("qscale"))
        * (v.cast("double") - q * F.col("qscale")),
    )
    hof = {
        r.vec_id: (r.qscale, r.n_saturated, r.recon_mse)
        for r in with_codes.select(
            "vec_id",
            "qscale",
            F.size(F.filter(F.col("codes"), lambda q: F.abs(q) == 127.0))
            .cast("long")
            .alias("n_saturated"),
            (
                F.aggregate(sq_err, F.lit(0.0), lambda acc, v: acc + v)
                / F.size(F.col("embedding"))
            ).alias("recon_mse"),
        ).collect()
    }
    batch = {
        r.vec_id: (r.qscale, r.n_saturated, r.recon_mse)
        for r in quantize_int8_batch(emb).collect()
    }
    assert batch == hof
    # sanity on the constructed expectations themselves
    assert batch[1][0] == 1.0 and batch[1][1] == 0 and batch[1][2] == 0.0
    assert batch[2][1] == 4  # constant vector: every code saturates


def test_brute_force_topk_gemm_agrees_with_hof(spark, sf_dir):
    """The GEMM top-k twin must return the same neighbors in the same
    ranks as the HOF form, cosines within BLAS-vs-fold tolerance. The
    corpus is repartitioned so the per-batch local-top-k pruning and
    the final window trim both actually engage (the lossless-union
    property the docstring claims)."""
    import pytest
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_gemm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    ).repartition(4)
    hof = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk(q, c, k=10).collect()
    }
    gemm = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk_gemm(q, c, k=10).collect()
    }
    assert set(gemm) == set(hof) and hof
    for key, (nid, cos) in hof.items():
        gnid, gcos = gemm[key]
        assert gnid == nid, f"neighbor diverges at {key}: {gnid} vs {nid}"
        assert gcos == pytest.approx(cos, rel=1e-9)


def test_brute_force_topk_gemm_edges(spark):
    """Constructed edges: zero-norm query (null cosine everywhere,
    neighbors rank by id), zero-norm corpus vector (ranks last via null
    cosine), oversized query set raises, empty query set yields an
    empty frame with the right columns."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_gemm,
    )

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),  # zero-norm query
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 0.0]),  # zero-norm corpus vector
        ],
        "vec_id bigint, embedding array<float>",
    )
    q = emb.filter("vec_id <= 1").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    hof = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk(q, c, k=3).collect()
    }
    gemm = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk_gemm(q, c, k=3).collect()
    }
    assert set(gemm) == set(hof)
    for key, (nid, cos) in hof.items():
        gnid, gcos = gemm[key]
        assert gnid == nid
        if cos is None:
            assert gcos is None
        else:
            assert gcos == _pytest.approx(cos, rel=1e-9)
    # the zero-norm corpus vector never outranks a real neighbor
    assert hof[(1, 1)][0] == 2
    with _pytest.raises(ValueError, match="query set"):
        brute_force_topk_gemm(q, c, k=3, max_queries=1)
    empty = brute_force_topk_gemm(q.limit(0), c, k=3)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_brute_force_topk_auto_dispatch(spark):
    """brute_force_topk_auto routes by dim with the top-k's own
    (lower) measured crossover: JVM plan below dim-256, GEMM
    (MapInPandas) at/above; results agree across the boundary."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.similarity import (
        TOPK_GEMM_MIN_DIM,
        brute_force_topk_auto,
        dispatch_by_dim,
    )

    assert dispatch_by_dim(64, TOPK_GEMM_MIN_DIM) == "hof"
    assert dispatch_by_dim(TOPK_GEMM_MIN_DIM, TOPK_GEMM_MIN_DIM) == "kernel"
    assert dispatch_by_dim(None, TOPK_GEMM_MIN_DIM) == "hof"

    def synth(dim):
        emb = spark.range(40).selectExpr(
            "id AS vec_id",
            f"transform(sequence(1, {dim}), "
            "i -> cast(sin(id * i + 1) AS float)) AS embedding",
        )
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        )
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
        )
        return q, c

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    qn, cn = synth(8)
    qw, cw = synth(TOPK_GEMM_MIN_DIM)
    assert "MapInPandas" not in plan(brute_force_topk_auto(qn, cn, k=5))
    assert "MapInPandas" in plan(brute_force_topk_auto(qw, cw, k=5))
    narrow = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk_auto(qn, cn, k=5).collect()
    }
    wide = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk_auto(qw, cw, k=5).collect()
    }
    assert narrow and wide and len(narrow) == len(wide) == 15


def test_quantize_dispatch_rule():
    """Pure dispatch rule (VERDICT r6 #2): HOF below the measured
    crossover (and when the dim is unknown), kernel at/above it,
    threshold overridable."""
    from aind_protein_data_transformation_spark.operators.similarity import (
        QUANTIZE_KERNEL_MIN_DIM,
        quantize_dispatch_dim,
    )

    assert quantize_dispatch_dim(64) == "hof"  # measured HOF win
    assert quantize_dispatch_dim(1024) == "kernel"  # measured 4.7x kernel win
    assert quantize_dispatch_dim(None) == "hof"
    assert quantize_dispatch_dim(QUANTIZE_KERNEL_MIN_DIM - 1) == "hof"
    assert quantize_dispatch_dim(QUANTIZE_KERNEL_MIN_DIM) == "kernel"
    assert quantize_dispatch_dim(64, kernel_min_dim=32) == "kernel"


def test_quantize_auto_dispatch_and_agreement_across_boundary(spark):
    """quantize_int8_auto picks the plan by embedding dim — pure JVM
    projection below the crossover, Arrow kernel above — and the result
    is bit-identical on BOTH sides of the boundary (so the dispatch can
    only ever change cost, never values)."""
    from aind_protein_data_transformation_spark.operators.similarity import (
        QUANTIZE_KERNEL_MIN_DIM,
        quantize_int8_auto,
        quantize_int8_batch,
        quantize_int8_hof,
    )

    def synth(dim):
        return spark.range(30).selectExpr(
            "id AS vec_id",
            f"transform(sequence(1, {dim}), "
            "i -> cast(sin(id * i + 1) AS float)) AS embedding",
        )

    def rows(df):
        return {
            r.vec_id: (r.qscale, r.n_saturated, r.recon_mse)
            for r in df.collect()
        }

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    narrow = synth(8)
    wide = synth(QUANTIZE_KERNEL_MIN_DIM)
    auto_narrow = quantize_int8_auto(narrow)
    auto_wide = quantize_int8_auto(wide)
    # plan selection: below -> no Arrow stage; at/above -> MapInPandas
    assert "MapInPandas" not in plan(auto_narrow)
    assert "MapInPandas" in plan(auto_wide)
    # explicit dim skips the probe and must dispatch identically
    assert "MapInPandas" not in plan(quantize_int8_auto(narrow, dim=8))
    assert "MapInPandas" in plan(
        quantize_int8_auto(wide, dim=QUANTIZE_KERNEL_MIN_DIM)
    )
    # bit-identical agreement across the boundary, both directions
    assert rows(auto_narrow) == rows(quantize_int8_batch(narrow))
    assert rows(auto_wide) == rows(quantize_int8_hof(wide))
    # empty frame: probe finds no row -> HOF path, empty result, no error
    empty = quantize_int8_auto(narrow.limit(0))
    assert empty.count() == 0
    assert "MapInPandas" not in plan(empty)


def test_shared_shingle_pairs_df_cap(spark):
    """The max_df skew cap on a corpus with the structure it targets:
    every document shares a boilerplate header (corpus-hot shingles),
    near-dup pairs additionally share pair-private content. Uncapped,
    the boilerplate makes EVERY pair a candidate (O(n^2)); capped, the
    boilerplate shingles drop, every near-dup pair survives on its
    private shingles, and the candidate count collapses to exactly the
    true pairs."""
    header = "terms of service apply to this document please read"
    docs = []
    for i in range(40):
        body = " ".join(f"w{i}x{j} tok{i * 97 + j}" for j in range(12))
        docs.append((i, f"{header} {body}"))
        if i % 4 == 0:  # near-dup twin: same body, one word dropped
            docs.append((1000 + i, f"{header} {body.split(' ', 1)[1]}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from aind_protein_data_transformation_spark.operators.dedup import (
        shared_shingle_pairs,
        shingle_set,
    )

    sh = shingle_set(df, k=3).localCheckpoint()
    full = {(r.doc_a, r.doc_b) for r in shared_shingle_pairs(sh).collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in shared_shingle_pairs(sh, max_df=5).collect()
    }
    n = len(docs)
    assert len(full) == n * (n - 1) // 2  # boilerplate pairs everyone
    true_pairs = {(i, 1000 + i) for i in range(0, 40, 4)}
    assert capped == true_pairs  # cap prunes to exactly the near-dups
    assert capped <= full


def test_lsh_candidate_pairs_bucket_cap(spark, sf_dir):
    """The per-band-bucket skew cap (VERDICT r6 #3), pathological case:
    a clone cluster far larger than the cap puts its full size in EVERY
    band bucket — uncapped that one cluster contributes m(m-1)/2
    candidates; capped, its oversized buckets drop and the candidate
    set is bounded, while a small (sub-cap) near-dup pair elsewhere in
    the corpus keeps its candidates. And the normal-corpus recall
    assertion: on the real documents table a sane cap changes nothing."""
    from aind_protein_data_transformation_spark.operators.dedup import (
        band_bucket_sizes,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_set,
    )
    from aind_protein_data_transformation_spark.queries.llm_dedup import (
        _corpus_near,
    )

    m = 30  # clone cluster size, >> cap
    boiler = " ".join(f"boiler{j} common{j} filler{j}" for j in range(8))
    docs = [(i, boiler) for i in range(m)]
    pair_body = " ".join(f"unique{j} content{j} words{j}" for j in range(10))
    docs += [(500, pair_body), (501, pair_body)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = minhash_signatures(shingle_set(df, k=3)).localCheckpoint()

    full = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig).collect()}
    assert len(full) == m * (m - 1) // 2 + 1  # quadratic cluster + the pair
    capped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig, max_bucket=10).collect()
    }
    assert capped == {(500, 501)}  # oversized buckets dropped, pair kept
    # the observability companion surfaces exactly what the cap targets
    top = band_bucket_sizes(sig).first()
    assert top.n_docs == m

    # normal corpus: a generous cap must not change the candidate set
    sigs = minhash_signatures(
        shingle_set(_corpus_near(spark, sf_dir), k=3)
    ).localCheckpoint()
    base = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()}
    with_cap = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, max_bucket=50).collect()
    }
    assert base and with_cap == base


def test_shingle_set_fast_hash_equivalent_shape(spark, sf_dir):
    """The xxhash64 production path must carry the same information as
    the portable-hash path: identical per-document distinct-shingle
    counts, and identical pairwise shared-shingle counts (and therefore
    identical exact Jaccard) for the LSH-candidate pairs — only the
    hash VALUES differ (so it is not oracle-replayable and stays out of
    the registered queries).

    Exactness caveat (ADVICE r6): the fast path applies distinct()
    AFTER the xxhash64 modulus, so a within-document hash collision
    (~d^2/2^32 per doc) would merge two distinct shingles and shrink
    one count by 1. The equality assertions below are therefore
    CORPUS-PINNED — exact on this fixture corpus (verified), not a
    mathematical identity; on an unlucky corpus the honest tolerance
    is one count per ~10^5 docs at these document sizes. Behavior is
    acceptable and documented in shingle_set's docstring."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.dedup import (
        jaccard_for_pairs,
        shared_shingle_pairs,
        shingle_set,
    )
    from aind_protein_data_transformation_spark.queries.llm_dedup import (
        _corpus_near,
    )

    corpus = _corpus_near(spark, sf_dir)
    slow = shingle_set(corpus, k=3).localCheckpoint()
    fast = shingle_set(corpus, k=3, fast_hash=True).localCheckpoint()

    n_slow = {r.doc_id: r.n for r in slow.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    n_fast = {r.doc_id: r.n for r in fast.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    assert n_fast == n_slow

    pairs = shared_shingle_pairs(slow).localCheckpoint()
    j_slow = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_for_pairs(pairs, slow).collect()
    }
    j_fast = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_for_pairs(pairs, fast).collect()
    }
    assert j_fast == j_slow


def test_ivf_topk_survives_zero_norm_centroid_and_query(spark):
    """The zero-norm contract must hold one operator up from the
    assignment paths: a dead centroid in the codebook previously
    crashed ivf_topk's PROBE stage with an ANSI divide-by-zero (the
    index build tolerated it), and pre-ANSI it would silently consume
    one of every query's nprobe slots while owning no corpus vectors.
    A zero-norm query vector must rank candidates as null-cosine
    (last), not error."""
    from aind_protein_data_transformation_spark.operators.similarity import (
        ivf_topk,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i % 5 + 1), float((i * 3) % 7 + 1)]) for i in range(20)],
        "neighbor_id bigint, ce array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 2.0]), (101, [0.0, 0.0])],
        "query_id bigint, qe array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [1.0, 4.0])],
        "centroid_id bigint, centroid_vec array<double>",
    )
    rows = ivf_topk(queries, corpus, cents, k=3, nprobe=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q[100]) == 3 and all(
        r.cosine is not None for r in by_q[100]
    )
    # zero-norm query: candidates rank by (null cosine, neighbor_id)
    assert len(by_q[101]) == 3
    assert all(r.cosine is None for r in by_q[101])


def test_assign_buckets_ivf_exhaustive_probe_equals_flat(spark, sf_dir):
    """The hierarchical path's correctness anchor: with nprobe large
    enough to probe EVERY coarse bucket, the candidate set is the whole
    codebook and the result must EQUAL the flat exact assignment
    (same cosine argmax, same lowest-centroid-id tie-break). This is
    what pins the fine stage's argmax + tie-break as exact; the
    approximation at small nprobe comes only from probe pruning."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets,
        assign_buckets_ivf,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    cents = stride_centroids(corpus, 10)
    flat = {r.vid: r.bucket for r in assign_buckets(corpus, cents).collect()}
    n_coarse = cents.filter(
        F.pmod(F.xxhash64(F.col("centroid_id")), F.lit(3)) == 0
    ).count()
    assert n_coarse >= 2  # the fixture must exercise a real two-level split
    ivf = {
        r.vid: r.bucket
        for r in assign_buckets_ivf(
            corpus, cents, coarse_stride=3, nprobe=n_coarse
        ).collect()
    }
    assert ivf == flat


def test_assign_buckets_ivf_small_nprobe_agreement(spark, sf_dir):
    """At the documented operating point (nprobe=2) the hierarchical
    assignment is APPROXIMATE by construction; pin the contract that
    holds regardless — every vector assigned exactly once — plus the
    fixture's measured agreement as a cliff detector. The fixture
    embeddings are ISOTROPIC random vectors — the known-hostile IVF
    regime (a coarse quantizer carries little information when the data
    has no cluster structure): measured agreement here is 0.534 with
    nprobe=2 of ~6 coarse picks (vs 0.29 for random probing). The
    clustered-data test below is where the approximation's real-world
    quality is pinned; this bound only catches structural collapse
    (probe ranking bug, candidate join dropping rows)."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets,
        assign_buckets_ivf,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    cents = stride_centroids(corpus, 10)
    flat = {r.vid: r.bucket for r in assign_buckets(corpus, cents).collect()}
    rows = assign_buckets_ivf(corpus, cents, coarse_stride=3, nprobe=2).collect()
    got = {r.vid: r.bucket for r in rows}
    assert len(rows) == len(got) == len(flat)  # exactly one bucket per vector
    agree = sum(1 for v, b in got.items() if flat[v] == b) / len(flat)
    assert agree >= 0.45, f"agreement collapsed: {agree:.3f}"


def test_assign_buckets_ivf_recovers_flat_on_clustered_data(spark):
    """The regime the operator exists for: data with CLUSTER structure
    (the 100-TB corpora SemDeDup/IVF serve are embedding spaces with
    dense semantic neighborhoods, not isotropic noise). Build tight,
    well-separated clusters — each member a small deterministic
    perturbation of its cluster axis — and the hierarchical assignment
    must reproduce the flat exact assignment at nprobe=2."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets,
        assign_buckets_ivf,
        stride_centroids,
    )

    dim, n_clusters, per = 16, 12, 25
    rows = []
    for c in range(n_clusters):
        axis = c % dim
        for i in range(per):
            v = [0.0] * dim
            v[axis] = 10.0 + c  # well-separated cluster direction
            v[(axis + 7) % dim] = 0.01 * (i % 5)  # tiny within-cluster jitter
            rows.append((c * per + i, v))
    corpus = spark.createDataFrame(rows, "vid long, ve array<double>")
    cents = stride_centroids(corpus, 5)  # every 5th member a centroid
    flat = {r.vid: r.bucket for r in assign_buckets(corpus, cents).collect()}
    ivf = {
        r.vid: r.bucket
        for r in assign_buckets_ivf(
            corpus, cents, coarse_stride=4, nprobe=2
        ).collect()
    }
    assert ivf == flat


def test_assign_buckets_ivf_guards(spark, sf_dir):
    """coarse_stride < 2 is the flat regime; a stride that thins the
    codebook to zero picks must raise, not silently assign nothing."""
    import pytest
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets_ivf,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    cents = stride_centroids(corpus, 40)
    with pytest.raises(ValueError, match="flat-scan regime"):
        assign_buckets_ivf(corpus, cents, coarse_stride=1)
    with pytest.raises(ValueError, match="zero\\s+coarse picks|zero coarse picks"):
        assign_buckets_ivf(corpus, cents, coarse_stride=10_000_000)


def test_assign_buckets_ivf_plan_is_distributed(spark, sf_dir):
    """The operator's regime claim in the plan itself: the only
    nested-loop/broadcast-cartesian stage is the vector x COARSE-PICKS
    probe (the declared driver-sized object, sqrt(K) rows); the
    codebook-sized relations (cent_coarse, live) reach their joins as
    equi-joins with NO forced broadcast hint, so at a codebook past
    the driver budget they shuffle instead of materializing on one
    node. No CartesianProduct anywhere."""
    from pyspark.sql import functions as F

    from aind_protein_data_transformation_spark.catalog import load_table
    from aind_protein_data_transformation_spark.operators.similarity import (
        assign_buckets_ivf,
        stride_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("ve"))
    cents = stride_centroids(corpus, 10)
    df = assign_buckets_ivf(corpus, cents, coarse_stride=3, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # exactly one nested-loop stage: the coarse probe crossJoin
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    # the fine-stage joins are hash equi-joins on their keys
    assert "coarse_bucket" in plan and "centroid_id" in plan
