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


def test_long_chain_converges_within_log_rounds(spark):
    """A 120-node chain has diameter 119 — plain min-propagation would
    need 119 rounds and the old max_iter=25 default would have returned
    a HALF-MERGED clustering silently. Pointer jumping must converge it
    well inside the default budget (O(log diameter) rounds)."""
    got = _cc(spark, [(i, i + 1) for i in range(120)])
    assert set(got.values()) == {0}
    assert len(got) == 121


def test_random_graph_matches_union_find(spark):
    """Agreement with a driver-side union-find on a deterministic
    pseudo-random graph (no RNG: edges from a hash recurrence)."""
    n, edges = 200, []
    x = 1
    for _ in range(260):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % n
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % n
        if a != b:
            edges.append((a, b))

    parent = list(range(n))

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_graph = {v for e in edges for v in e}
    want = {u: find(u) for u in in_graph}
    # canonicalize union-find roots to the component MIN (find() roots
    # are already mins here because unions always point max -> min, but
    # path order could leave a stale non-min root; normalize anyway)
    comp_min = {}
    for u, r in want.items():
        comp_min[r] = min(comp_min.get(r, u), u)
    want = {u: comp_min[r] for u, r in want.items()}

    assert _cc(spark, edges) == want


def test_unconverged_raises_not_silent(spark):
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
