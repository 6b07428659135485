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
