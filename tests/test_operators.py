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
