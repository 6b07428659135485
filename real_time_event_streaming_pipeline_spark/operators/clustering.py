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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Loop-stage sizing: after the edge set is materialized its row count
# is known exactly, so the per-round join/groupBy runs on
# ceil(n_edges / this) partitions instead of the static
# shuffle-partition count. At 100 TB (billions of edges) this keeps
# every partition ~1M rows; at test scale it collapses the loop to a
# couple of tasks per round — round latency is scheduling-bound, not
# data-bound, so idle tasks are pure overhead.
_EDGES_PER_PARTITION = 1_000_000


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 20,
    pairs_unique: bool = False,
) -> DataFrame:
    """(vertex, component) for every vertex in `pairs`; component =
    min vertex id reachable. Converges when no label changes.

    `pairs_unique=True` asserts the input has one row per undirected
    pair (a < b) — the contract of every pair generator in
    operators/dedup.py — and skips the defensive `distinct()` on the
    symmetrized edge set, saving a full shuffle of the edges."""
    # materialize the edge set ONCE — without this every iteration
    # re-evaluates the (potentially expensive) upstream pair-generation
    # plan, and label lineage grows a join per round until planning
    # itself dominates. localCheckpoint truncates lineage; cluster
    # deployments would use checkpoint() on reliable storage.
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).union(
        pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    )
    if not pairs_unique:
        e = e.distinct()
    edges = e.localCheckpoint()
    # count is ~free on the checkpointed partitions and buys exact
    # loop sizing (see _EDGES_PER_PARTITION); coalesce is narrow — no
    # extra shuffle, and never increases the partition count
    n_edges = edges.count()
    n_part = max(1, math.ceil(n_edges / _EDGES_PER_PARTITION))
    if n_part < edges.rdd.getNumPartitions():
        edges = edges.coalesce(n_part)
    labels = (
        edges.select("u")
        .distinct()
        .select(F.col("u").alias("vertex"), F.col("u").alias("component"))
    )

    # labels only ever decrease (min over own + neighbors), so
    # Σcomponent strictly decreases every non-converged round: a 1-row
    # aggregate detects the fixpoint without the old-vs-new join the
    # naive convergence check needs (halves the per-round job count —
    # round latency, not data volume, dominates this loop). No
    # pre-loop baseline sum is computed: with the strict a<b pair
    # contract every non-empty symmetrized edge set forces at least
    # one label change in round 0 (the larger endpoint of any edge
    # adopts the smaller), so a round-0 early exit is unreachable and
    # round 0's own sum is the baseline; the fixpoint therefore needs
    # max_iter >= diameter + 1 (the confirming round). Summed as
    # decimal(38,0): many vertices with snowflake-scale 64-bit ids
    # would overflow a long sum, which throws under ANSI mode.
    def _label_sum(df):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    if n_edges == 0:  # empty graph: nothing to propagate
        return labels
    prev_sum = None
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
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(rounds ~ graph diameter — raise max_iter for long-chain graphs)"
    )


def dedup_clusters(pairs: DataFrame, pairs_unique: bool = True) -> DataFrame:
    """Cluster summary: representative (min doc id), size, members —
    ready for the 'keep one per cluster' join back to the corpus.
    Pair generators in operators/dedup.py emit one row per (a < b)
    pair, so the symmetrized edge set is distinct by construction."""
    cc = connected_components(pairs, pairs_unique=pairs_unique)
    return cc.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.array_join(F.array_sort(F.collect_list(F.col("vertex").cast("string"))), ",").alias(
            "members"
        ),
    ).select(
        F.col("component").alias("representative"), "cluster_size", "members"
    )
