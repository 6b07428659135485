"""Connected components over near-duplicate pairs — the step after
pair generation in every dedup pipeline: pairs (a,b) form a graph;
each component keeps one representative document.

Implementation is iterative min-label propagation on DataFrames
(small-star style): every vertex repeatedly adopts the smallest label
among itself and its neighbors until a fixed point. Each round is one
shuffle (groupBy vertex); rounds ≈ graph diameter (near-dup clusters
are tiny, so 2-4 rounds). This is the canonical Spark shape for
iterative algorithms the optimizer can't express — loop in the
driver, converge by comparing a 1-row aggregate, never collect the
data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex in `pairs`; component =
    min vertex id reachable. Converges when no label changes."""
    # materialize the edge set ONCE — without this every iteration
    # re-evaluates the (potentially expensive) upstream pair-generation
    # plan, and label lineage grows a join per round until planning
    # itself dominates. localCheckpoint truncates lineage; cluster
    # deployments would use checkpoint() on reliable storage.
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("vertex"), F.col("u").alias("component"))
        .localCheckpoint()
    )
    # labels only ever decrease (min over own + neighbors), so
    # Σcomponent strictly decreases every non-converged round: a 1-row
    # aggregate detects the fixpoint without the old-vs-new join the
    # naive convergence check needs (halves the per-round job count —
    # round latency, not data volume, dominates this loop). Summed as
    # decimal(38,0): many vertices with snowflake-scale 64-bit ids
    # would overflow a long sum, which throws under ANSI mode.
    def _label_sum(df):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iter):
        # candidate label per vertex: min over (own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels, edges.v == labels.vertex)
            .select(F.col("u").alias("vertex"), "component")
        )
        labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(rounds ~ graph diameter — raise max_iter for long-chain graphs)"
        )
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster summary: representative (min doc id), size, members —
    ready for the 'keep one per cluster' join back to the corpus."""
    cc = connected_components(pairs)
    return cc.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.array_join(F.array_sort(F.collect_list(F.col("vertex").cast("string"))), ",").alias(
            "members"
        ),
    ).select(
        F.col("component").alias("representative"), "cluster_size", "members"
    )
