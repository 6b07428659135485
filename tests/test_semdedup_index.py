"""Incremental semantic dedup (streaming/semdedup_index.py): streamed
micro-batches deduped against the frozen-centroid cell index must
equal the one-shot batch sweep over the union, and — on margin-bearing
data, where IVF candidate recall vs the exact pair set is 1.0 — equal
the EXACT all-pairs survivor set too. Replays must be idempotent."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.operators import similarity as S
from real_time_event_streaming_pipeline_spark.streaming.semdedup_index import (
    batch_semdedup_survivors,
    ingest_embeddings_batch,
    init_semdedup_index,
    read_survivors,
    start_semdedup_ingest,
)

N_CLUSTERS, PER_CLUSTER, DIM, SIGMA = 8, 20, 32, 0.04
THRESHOLD = 0.9
N_CENTROIDS, N_PROBE = 8, 2


@pytest.fixture(scope="module")
def emb(spark):
    """Planted clusters, ids round-robin so the first-n centroid
    sample covers every cluster (the test_ann_clustered recipe)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for pnt in range(PER_CLUSTER):
        for c in range(N_CLUSTERS):
            v = centers[c] + SIGMA * rng.standard_normal(DIM)
            v /= np.linalg.norm(v)
            rows.append((pnt * N_CLUSTERS + c, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    df.count()
    yield df
    df.unpersist()


def _ids(df):
    return {r.vec_id for r in df.select("vec_id").collect()}


def test_streamed_semdedup_matches_batch_and_exact(spark, emb, tmp_path):
    index_dir = str(tmp_path / "index")
    init_semdedup_index(
        emb, index_dir, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )
    cents = S.sample_centroids(emb, N_CENTROIDS)

    n = emb.count()
    cut1, cut2 = n // 3, 2 * n // 3
    batches = [
        emb.filter(F.col("vec_id") < cut1),
        emb.filter((F.col("vec_id") >= cut1) & (F.col("vec_id") < cut2)),
        emb.filter(F.col("vec_id") >= cut2),
    ]
    for i, b in enumerate(batches):
        ingest_embeddings_batch(b, i, index_dir, THRESHOLD, N_PROBE)
    inc = _ids(read_survivors(spark, index_dir))

    batch_twin = _ids(
        batch_semdedup_survivors(
            emb, THRESHOLD, cents=cents, n_probe=N_PROBE
        )
    )
    assert inc == batch_twin
    # on clustered data the candidate path has recall 1.0, so the
    # streamed result also equals the EXACT all-pairs survivor set
    exact_dropped = (
        S.neardup_pairs(emb, threshold=THRESHOLD)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    exact = _ids(emb.join(exact_dropped, "vec_id", "left_anti"))
    assert inc == exact
    assert 0 < len(inc) < n  # dedup actually dropped cluster members


def test_semdedup_epoch_replay_idempotent(spark, emb, tmp_path):
    index_dir = str(tmp_path / "index")
    init_semdedup_index(
        emb, index_dir, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )
    mid = emb.count() // 2
    b0 = emb.filter(F.col("vec_id") < mid)
    b1 = emb.filter(F.col("vec_id") >= mid)
    ingest_embeddings_batch(b0, 0, index_dir, THRESHOLD, N_PROBE)
    ingest_embeddings_batch(b1, 1, index_dir, THRESHOLD, N_PROBE)
    want = _ids(read_survivors(spark, index_dir))
    cells_n = spark.read.parquet(os.path.join(index_dir, "cells")).count()

    ingest_embeddings_batch(b1, 1, index_dir, THRESHOLD, N_PROBE)  # replay
    assert _ids(read_survivors(spark, index_dir)) == want
    assert spark.read.parquet(os.path.join(index_dir, "cells")).count() == cells_n


def test_semdedup_streaming_end_to_end(spark, emb, tmp_path):
    """The real streaming machinery (availableNow, one epoch per
    file), restarted on the same checkpoint: nothing changes."""
    src = str(tmp_path / "arriving")
    os.makedirs(src)
    import shutil
    import time

    n = emb.count()
    now = time.time() - 600
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        part_dir = os.path.join(src, f"_stage{i}")
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("overwrite").parquet(part_dir)
        part = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:02d}.parquet")
        shutil.copyfile(part, dst)
        os.utime(dst, (now + 60 * i, now + 60 * i))
        shutil.rmtree(part_dir)

    index_dir = str(tmp_path / "index")
    init_semdedup_index(
        emb, index_dir, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )
    ckpt = str(tmp_path / "ckpt")
    q = start_semdedup_ingest(
        spark, src, index_dir, ckpt, threshold=THRESHOLD, n_probe=N_PROBE
    )
    q.awaitTermination(180)
    streamed = _ids(read_survivors(spark, index_dir))
    cents = S.sample_centroids(emb, N_CENTROIDS)
    want = _ids(
        batch_semdedup_survivors(emb, THRESHOLD, cents=cents, n_probe=N_PROBE)
    )
    assert streamed == want

    q2 = start_semdedup_ingest(
        spark, src, index_dir, ckpt, threshold=THRESHOLD, n_probe=N_PROBE
    )
    q2.awaitTermination(180)
    assert _ids(read_survivors(spark, index_dir)) == streamed

def test_semdedup_n_probe_is_frozen_contract(spark, emb, tmp_path):
    """r12 ADVICE (medium): n_probe is persisted at init and validated
    on ingest — a mismatching explicit value errors instead of
    silently altering candidacy mid-index."""
    index_dir = str(tmp_path / "index")
    init_semdedup_index(
        emb, index_dir, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )
    b = emb.filter(F.col("vec_id") < 20)
    with pytest.raises(ValueError, match="n_probe"):
        ingest_embeddings_batch(b, 0, index_dir, THRESHOLD, N_PROBE + 1)
    # omitted n_probe inherits the stored contract
    ingest_embeddings_batch(b, 0, index_dir, THRESHOLD)
    assert len(_ids(read_survivors(spark, index_dir))) > 0


def test_semdedup_legacy_meta_rejected(spark, emb, tmp_path):
    """A pre-r13 bare-list centroids.json (no persisted n_probe, no
    role column in its cells) must fail loudly, not load."""
    import json

    index_dir = str(tmp_path / "index")
    os.makedirs(index_dir)
    cents = S.sample_centroids(emb, N_CENTROIDS)
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump(cents, f)
    b = emb.filter(F.col("vec_id") < 20)
    with pytest.raises(ValueError, match="rebuild"):
        ingest_embeddings_batch(b, 0, index_dir, THRESHOLD)


def test_semdedup_n_dropped_counts_batch_rows_only(spark, emb, tmp_path):
    """r12 ADVICE (low): with out-of-id-order batches the shared
    kernel's b_id = max(pair ids) can name an INDEX-side id; the
    semi-join against the batch keeps n_dropped = rows actually
    dropped from THIS batch (survivor parquet stays consistent)."""
    index_dir = str(tmp_path / "index")
    init_semdedup_index(
        emb, index_dir, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )
    mid = emb.count() // 2
    hi = emb.filter(F.col("vec_id") >= mid)  # LARGE ids arrive first
    lo = emb.filter(F.col("vec_id") < mid)
    r0 = ingest_embeddings_batch(hi, 0, index_dir, THRESHOLD)
    r1 = ingest_embeddings_batch(lo, 1, index_dir, THRESHOLD)
    surv0 = spark.read.parquet(
        os.path.join(index_dir, "survivors", "epoch=0")
    ).count()
    surv1 = spark.read.parquet(
        os.path.join(index_dir, "survivors", "epoch=1")
    ).count()
    assert r0["n_dropped"] == hi.count() - surv0
    assert r1["n_dropped"] == lo.count() - surv1
