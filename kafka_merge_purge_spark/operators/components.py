"""Connected components over a pair list — dedup *clustering*.

Near-dup operators (minhash_lsh_pairs, embedding_near_dup_pairs) emit
pairs; deduplication needs the transitive closure: every document in a
duplicate cluster maps to one canonical id.  This is min-label
propagation (the Pregel-style formulation): every node starts labeled
with itself; each round a node takes the min of its own label and its
neighbors' labels; at fixpoint the label IS the cluster id (the minimum
node id reachable).

Scale shape: one shuffle per round (neighbor-min groupBy + label join),
O(graph diameter) rounds — near-dup graphs are shallow (dup clusters
are cliques or near-cliques, diameter ≲ 3), so this converges in a few
rounds where a general graph might need many.  Lineage is truncated
with ``localCheckpoint`` each round (executor-local materialization —
NOT a driver collect) so the plan doesn't grow exponentially with
iterations; convergence is detected with a scalar count per round.

The DuckDB oracle expresses the same fixpoint as a recursive CTE
(min reachable node id per node), so the result is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id in the node's connected component."""
    bi = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    bi = bi.unionByName(bi.select(F.col("v").alias("u"), F.col("u").alias("v"))).cache()
    labels = (
        bi.select(F.col("u").alias("node")).distinct().withColumn("lbl", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            bi.join(labels, bi["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                labels["node"],
                F.least(labels["lbl"], F.coalesce(nbr_min["nbr_lbl"], labels["lbl"])).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    bi.unpersist()
    return labels.select(F.col("node"), F.col("lbl").alias("component"))
