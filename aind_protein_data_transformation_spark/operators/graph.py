"""Connected components over candidate-pair graphs.

A near-dup pipeline's LSH stage emits PAIRS, but dedup decisions need
CLUSTERS: if A~B and B~C, one representative must survive for {A,B,C}
even when (A,C) was never a candidate. That transitive-closure step is
a connected-components computation on the pair graph.

Algorithm: iterative min-label propagation — every node starts labeled
with itself; each round every node takes the min of its own and its
neighbors' labels; converged when no label changes. Rounds needed =
graph diameter, and duplicate clusters are shallow (near-clique), so
3-5 rounds is typical. Each round is one shuffle-join plus one
aggregation — the same per-round cost profile as the MapReduce CC
algorithms in the literature (e.g. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14); label propagation is
chosen here for its plan simplicity since dup-cluster diameters are
tiny. Lineage is truncated each round with an eager localCheckpoint so the
plan does not grow with the iteration count; a production run on a real
cluster would point this at a checkpoint directory instead
(``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``) to also
survive executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns (node, component) where component is the minimum node id
    reachable from ``node``. Only nodes appearing in at least one edge
    are returned (isolated corpus documents are their own trivial
    cluster and never enter the pair graph).
    """
    # Materialize the symmetrized edge list once: every iteration joins
    # against it, and without the checkpoint the edge relation's whole
    # upstream plan (e.g. a MinHash-LSH pipeline) would re-execute per
    # round.
    sym = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .union(edges.select(F.col(dst).alias("e_src"), F.col(src).alias("e_dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("e_src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # Labels only ever decrease under min-propagation, so the label sum
    # is strictly monotone until the fixpoint: comparing one decimal
    # aggregate per round replaces a join-based changed-row count
    # (decimal(38) so the test never overflows at any corpus size).
    def label_sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev = label_sum(labels)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.e_src == labels.node)
            .groupBy(F.col("e_dst").alias("m_node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.m_node, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    return labels.select("node", F.col("label").alias("component"))
