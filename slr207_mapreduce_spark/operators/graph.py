"""Connected components — the cluster-merge step of a dedup pipeline
(near-dup PAIRS become duplicate GROUPS only after transitive closure).

Iterative label propagation over DataFrames: every node starts as its own
label (its id); each round, every node takes the min label among itself
and its neighbors; stop at fixpoint. Converges in O(diameter) rounds.

Scale notes:
- Each round is one join + one aggregation on the (symmetrized) edge list —
  the classic MapReduce CC construction; Spark shuffles on node id.
- ``localCheckpoint`` truncates lineage each round: without it the plan
  doubles per iteration and planning time explodes by round ~15.
- For web-scale graphs the large-star/small-star variant halves rounds;
  diameter of near-dup clusters is tiny (duplicates of a common source),
  so plain propagation is the right tool here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``;
    cluster_id = min node id reachable (deterministic canonical label)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: the loop re-evaluates sym every round, and the
        # symmetrizing union would otherwise recompute the (possibly very
        # expensive) upstream edge pipeline twice per round
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # partially-propagated labels would silently split components —
        # loud failure beats wrong clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))
