"""Connected-components dedup clustering."""

from __future__ import annotations

from real_time_event_streaming_pipeline_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
)


def test_multi_hop_chain_converges(spark):
    """a-b, b-c, c-d is one component even though a and d never share
    an edge (requires >1 propagation round)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "a_id long, b_id long",
    )
    cc = {(r.vertex, r.component) for r in connected_components(pairs).collect()}
    assert {(1, 1), (2, 1), (3, 1), (4, 1)} <= cc
    assert {(10, 10), (11, 10)} <= cc
    assert {(20, 20), (21, 20), (22, 20)} <= cc


def test_long_chain_converges_in_log_rounds(spark):
    """A 2000-vertex path graph (diameter 1999 — the chained-template
    shape the sf1 soak corpus exposed): plain min-propagation needs
    ~diameter rounds and would blow the max_iter=20 ceiling; pointer
    halving must converge within ~log2(1999)+O(1) rounds and label
    every vertex with the chain head."""
    n = 2000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    cc = connected_components(pairs, max_iter=20).collect()
    assert len(cc) == n
    assert all(r.component == 0 for r in cc)


def test_cluster_summary(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "a_id long, b_id long")
    rows = dedup_clusters(pairs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.representative, r.cluster_size, r.members) == (5, 3, "5,7,9")


def test_lazy_checkpoint_materializes_upstream_once(spark):
    """Mechanical pin of the lazy-checkpoint invariant (r14, closing
    the r13 ADVICE item): lazy_checkpoint_materialized must leave the
    checkpointed frame fully materialized, so a downstream plan that
    references it TWICE (the r8 double-execution shape: both legs of a
    self-join) never re-runs the upstream lineage. An accumulator
    inside an upstream UDF counts evaluations: exactly one per row
    during the materializing action, zero more during the double-
    reference consumption."""
    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.operators.clustering import (
        lazy_checkpoint_materialized,
    )

    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def counted(v):
        acc.add(1)
        return v

    n = 100
    base = spark.range(n).select(counted(F.col("id")).alias("k"))
    ck, n_rows = lazy_checkpoint_materialized(base, lambda d: d.count())
    assert n_rows == n
    assert acc.value == n, "materializing action must evaluate upstream exactly once"

    # double reference: self-join both legs read the checkpointed frame
    a, b = ck.alias("a"), ck.alias("b")
    joined = a.join(b, F.col("a.k") == F.col("b.k")).count()
    assert joined == n
    assert acc.value == n, (
        f"upstream re-ran after materialization (accumulator {acc.value} != {n}): "
        "the lazy checkpoint was consumed before its action"
    )
