"""connected_components: min-label propagation fixpoint on known graphs."""

from pyspark.sql import functions as F

from aind_protein_data_transformation_spark.operators.graph import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = connected_components(df).collect()
    return {r.node: r.component for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4 forces multiple propagation rounds
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_separate_reps(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_triangle_with_tail_and_duplicate_edges(spark):
    got = _cc(spark, [(7, 8), (8, 9), (9, 7), (9, 42), (7, 8)])
    assert got == {7: 7, 8: 7, 9: 7, 42: 7}
