"""Streaming ANN index refresh: an IVF index built on a base corpus
stays correct as new embeddings arrive via foreachBatch appends —
search over the streamed-in index must equal search over an index
batch-built from the full corpus (assignment is deterministic given
the frozen centroid set), and probes must prune unvisited cell
partitions at the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.streaming.ann_index import (
    build_ivf_index,
    search,
    start_index_refresh,
)

N_BASE = 300  # the base corpus trains the frozen centroid artifact


def test_streamed_index_matches_batch_index(spark, sf_small, tmp_path):
    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < N_BASE)
    incoming = emb.filter(F.col("vec_id") >= N_BASE)

    live_dir = str(tmp_path / "live_index")
    build_ivf_index(base, live_dir, n_centroids=16)

    # stream the rest in, multiple micro-batches
    staging = str(tmp_path / "staging")
    incoming.repartition(3).write.parquet(staging)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = start_index_refresh(stream, live_dir, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # ground truth: batch index over the full corpus under the SAME
    # frozen centroid artifact the live index persisted — assignment
    # depends only on the artifact, so streamed == batch
    from real_time_event_streaming_pipeline_spark.streaming.ann_index import (
        _load_centroids,
    )

    full_dir = str(tmp_path / "full_index")
    build_ivf_index(emb, full_dir, cents=_load_centroids(live_dir))

    queries = emb.filter(F.col("vec_id") % 100 == 7)
    got = search(spark, live_dir, queries, k=5, n_probe=4)
    want = search(spark, full_dir, queries, k=5, n_probe=4)
    assert got.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # streamed vectors are actually in the index and findable
    n_new = spark.read.parquet(live_dir + "/cells").filter(
        F.col("n_id") >= N_BASE
    ).count()
    assert n_new == incoming.count()


def test_index_refresh_epoch_replay_no_dupes(spark, sf_small, tmp_path):
    """Failure injection for the index append: erase the newest commit
    marker so the restarted refresh replays its last epoch. The
    epoch-scoped overwrite must leave the cell table bit-identical —
    an append-mode sink would double every vector of that epoch."""
    from conftest import uncommit_newest_epoch

    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < N_BASE)
    incoming = emb.filter(F.col("vec_id") >= N_BASE)
    live_dir = str(tmp_path / "live_index")
    build_ivf_index(base, live_dir, n_centroids=16)

    staging = str(tmp_path / "staging")
    incoming.repartition(3).write.parquet(staging)
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
        )
        q = start_index_refresh(stream, live_dir, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    cells = live_dir + "/cells"
    before = sorted(
        (r.n_id, r.cell, r.epoch) for r in spark.read.parquet(cells).collect()
    )
    assert len(before) == emb.count()

    uncommit_newest_epoch(ckpt)
    run()  # replays the epoch whose commit vanished
    after = sorted(
        (r.n_id, r.cell, r.epoch) for r in spark.read.parquet(cells).collect()
    )
    assert after == before


def test_search_prunes_unprobed_cells(spark, sf_small, tmp_path):
    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    index_dir = str(tmp_path / "index")
    build_ivf_index(emb, index_dir, n_centroids=16)
    one_query = emb.filter(F.col("vec_id") == 7)
    res = search(spark, index_dir, one_query, k=3, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the cell filter must reach the partitioned scan, not a post-scan Filter
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_cell_table_epoch_compaction_preserves_search(spark, sf_small, tmp_path):
    """compact_epochs with partition_cols=['cell'] on the streamed
    index: search results must be identical afterwards, the cell=K
    subdirectories must survive (so probe-time partition pruning keeps
    working), and the file count must drop."""
    from real_time_event_streaming_pipeline_spark.sources.maintenance import (
        compact_epochs,
        table_file_stats,
    )

    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < N_BASE)
    incoming = emb.filter(F.col("vec_id") >= N_BASE)
    live_dir = str(tmp_path / "live_index")
    build_ivf_index(base, live_dir, n_centroids=16)
    staging = str(tmp_path / "staging")
    incoming.repartition(3).write.parquet(staging)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = start_index_refresh(stream, live_dir, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cells = live_dir + "/cells"
    queries = emb.filter(F.col("vec_id") % 100 == 7)
    want = sorted(tuple(r) for r in search(spark, live_dir, queries, k=5, n_probe=4).collect())
    files_before = table_file_stats(spark, cells)["n_files"]

    res = compact_epochs(spark, cells, upto_epoch=10**6, partition_cols=["cell"])
    assert res["epochs_merged"] >= 3  # base (epoch=-1) + streamed epochs
    assert table_file_stats(spark, cells)["n_files"] < files_before

    got = sorted(tuple(r) for r in search(spark, live_dir, queries, k=5, n_probe=4).collect())
    assert got == want
    # pruning still reaches the scan through the compacted layout
    res_df = search(spark, live_dir, queries.limit(1), k=3, n_probe=2)
    plan = res_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_search_dedupes_cross_epoch_redelivery(spark, sf_small, tmp_path):
    """A vec_id re-delivered in a later epoch exists under TWO epoch=N
    partitions; search must rank it once (latest epoch wins), not let
    the duplicate push a real neighbor out of the top k."""
    emb = load(spark, sf_small, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < N_BASE)
    live_dir = str(tmp_path / "idx")
    build_ivf_index(base, live_dir, n_centroids=16)

    # redeliver an already-indexed slice as a streamed epoch
    redelivered = base.filter(F.col("vec_id") % 5 == 0)
    staging = str(tmp_path / "staging")
    redelivered.coalesce(1).write.parquet(staging)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 10)
        .parquet(staging)
    )
    q = start_index_refresh(stream, live_dir, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    queries = base.filter(F.col("vec_id") % 7 == 3)
    got = search(spark, live_dir, queries, k=5, n_probe=4).collect()
    pairs = [(r.q_id, r.n_id) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate neighbor in top-k"
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r.rank)
    for q_id, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q_id
