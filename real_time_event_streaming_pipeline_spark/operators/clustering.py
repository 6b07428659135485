"""Connected components over near-duplicate pairs — the step after
pair generation in every dedup pipeline: pairs (a,b) form a graph;
each component keeps one representative document.

Implementation is iterative min-label propagation on DataFrames with
ADAPTIVE POINTER HALVING (r8): every round each vertex adopts the
smallest label among itself and its neighbors (one shuffle, groupBy
vertex); from round 3 on, each round additionally shortcuts its label
to its label's own label (one self-join) — the path-compression step
of Shiloach-Vishkin-style CC. Halving turns the round bound from
O(diameter) into 3 + O(log diameter) while the common near-dup graph
(star/clique clusters, diameter ≤ 3) converges before the extra join
ever runs. CHAINED duplicates — templated documents where doc i
near-matches doc i+k — produce path graphs whose diameter grows with
the corpus; plain propagation hit its max_iter=20 ceiling at a
2000-vertex chain, the halving variant converges in ~13 rounds
(pinned in tests/test_clustering.py). The fixpoint is unchanged
(component = min reachable id; labels only ever decrease, and
label(label) ≤ label by monotonicity), so the output is
bit-identical. This is the canonical Spark shape for
iterative algorithms the optimizer can't express — loop in the
driver, converge by comparing a 1-row aggregate, never collect the
data itself. The halving join keys on the current label, so a huge
component concentrates rows on its root's key — the classic
pointer-jumping hub; AQE skew-split handles it, the same posture as
the banded dedup joins.
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


def lazy_checkpoint_materialized(df: DataFrame, action):
    """localCheckpoint(eager=False) paired with the single-reference
    action that materializes it, as ONE construct (r14, closing the
    r13 ADVICE item): the r8 regression — a lazily-checkpointed plan
    referenced twice before any action — silently recomputes its
    lineage once per reference (the plan's two legs race to fill the
    block-store cache inside one job). Pairing checkpoint and
    materializing action structurally means a caller cannot hold the
    checkpointed frame without its action having run first, so the
    invariant no longer depends on comment discipline. Returns
    (checkpointed_df, action_result); the invariant itself is pinned
    mechanically by tests/test_clustering.py::
    test_lazy_checkpoint_materializes_upstream_once (an accumulator
    counts upstream evaluations)."""
    out = df.localCheckpoint(eager=False)
    return out, action(out)


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
    # Symmetrize via inline(), not union-of-two-selects (r13 opt):
    # the union form put the pair-generation subtree in the plan
    # TWICE — exchange reuse deduplicates everything below the
    # generator's last shuffle, but its post-shuffle join/filter
    # stages re-executed once per union leg. inline() emits both
    # directions from one narrow pass, so the generator runs exactly
    # once regardless of its shape. Checkpoint is lazy: count() is
    # the materializing action (one job, not two).
    e = pairs.select(
        F.inline(
            F.array(
                F.struct(F.col(a_col).alias("u"), F.col(b_col).alias("v")),
                F.struct(F.col(b_col).alias("u"), F.col(a_col).alias("v")),
            )
        )
    )
    if not pairs_unique:
        e = e.distinct()
    # count materializes the lazy checkpoint and buys exact loop
    # sizing (see _EDGES_PER_PARTITION); coalesce is narrow — no
    # extra shuffle, and never increases the partition count
    edges, n_edges = lazy_checkpoint_materialized(e, lambda d: d.count())
    n_part = max(1, math.ceil(n_edges / _EDGES_PER_PARTITION))
    if n_part < edges.rdd.getNumPartitions():
        edges = edges.coalesce(n_part)

    # labels only ever decrease (min over own + neighbors), so
    # Σcomponent strictly decreases every non-converged round: a 1-row
    # aggregate detects the fixpoint without the old-vs-new join the
    # naive convergence check needs (halves the per-round job count —
    # round latency, not data volume, dominates this loop). The fused
    # round 0 below computes the baseline sum; every loop round
    # compares against the previous round's sum, so a round that
    # changes nothing exits immediately (the fixpoint needs one
    # confirming round, same as before the r13 restructure); with
    # pointer halving the fixpoint needs max_iter >= log2(diameter) +
    # O(1) rounds (the last one confirming). Summed as
    # decimal(38,0): many vertices with snowflake-scale 64-bit ids
    # would overflow a long sum, which throws under ANSI mode.
    def _label_sum(df):
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).first()[0]

    if n_edges == 0:  # empty graph: nothing to propagate
        return edges.select(
            F.col("u").alias("vertex"), F.col("u").alias("component")
        )
    # Round 0, join-free (r13 opt): the initial labels are the
    # identity (vertex -> vertex), so round 0's neighbor join would
    # just rename edges — min(own, neighbors) over identity labels is
    # a direct groupBy over (u, v) ∪ (u, u). One shuffle replaces the
    # old init-distinct + round-0 join + groupBy; the output labels
    # are identical by construction. Checkpoints in this loop are
    # LAZY: the per-round 1-row label-sum action is what materializes
    # them, so each round runs one job, not a checkpoint job plus a
    # sum job (the mid-round halving checkpoint below stays eager —
    # both sides of the halving self-join read it, and a lazy
    # checkpoint would let the two join legs race to compute the
    # union+groupBy lineage twice within the same job, the r8 ADVICE
    # regression).
    labels, prev_sum = lazy_checkpoint_materialized(
        edges.select(F.col("u").alias("vertex"), F.col("v").alias("component"))
        .unionByName(
            edges.select(F.col("u").alias("vertex"), F.col("u").alias("component"))
        )
        .groupBy("vertex")
        .agg(F.min("component").alias("component")),
        _label_sum,
    )
    for rnd in range(1, max_iter):
        # candidate label per vertex: min over (own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels, edges.v == labels.vertex)
            .select(F.col("u").alias("vertex"), "component")
        )
        labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
        )
        if rnd >= 2:
            # pointer halving, engaged adaptively: the common near-dup
            # graph (star/clique clusters, diameter ≤ 3) converges
            # before round 2 and never pays the extra self-join; a
            # graph still moving at round 2 has real depth, and from
            # here each round shortcuts component ← component's own
            # label, halving distance-to-root: total rounds ≤
            # 3 + O(log diameter). Every label IS a vertex id (a min
            # over vertex ids), so the left join always matches;
            # coalesce is defensive. Labels are monotone
            # non-increasing, so halving only shrinks them — the
            # fixpoint, and therefore the output, is identical.
            # materialize the propagated labels BEFORE deriving hop
            # (r8 ADVICE): both sides of the halving join otherwise
            # consume the un-checkpointed union+groupBy lineage, and
            # exchange reuse is not guaranteed — the per-round cost
            # halving is meant to reduce would partly be paid back by
            # executing the propagation twice.
            labels = labels.localCheckpoint()
            hop = labels.select(
                F.col("vertex").alias("_lv"), F.col("component").alias("_lc")
            )
            labels = labels.join(hop, labels.component == hop._lv, "left").select(
                "vertex",
                F.coalesce("_lc", "component").alias("component"),
            )
        labels, new_sum = lazy_checkpoint_materialized(labels, _label_sum)
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(rounds ~ log2(graph diameter) with pointer halving — raise "
        "max_iter for pathological graphs)"
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
