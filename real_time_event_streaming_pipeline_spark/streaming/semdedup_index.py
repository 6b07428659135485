"""Incremental SEMANTIC dedup against a persisted IVF cell index —
the embedding-space sibling of streaming/dedup_index.py: new
micro-batches of vectors are deduped against the accumulated index
instead of re-running the all-corpus SemDeDup sweep.

Semantics: vector b is a duplicate iff some vector a with a smaller
id, anywhere in the corpus seen so far, shares >= 1 of the n_probe
IVF cells with b and round(cos(a, b), 6) >= threshold — exactly the
candidate rule of operators/similarity.neardup_pairs_ivf_candidates
computed against a FROZEN centroid set. Because cell assignment
depends only on (vector, centroids), a pair's candidacy is identical
whether both members arrive in one batch or epochs apart, so the
streamed survivor set equals the one-shot batch sweep for any
id-ordered split (pinned in tests/test_semdedup_index.py on the
clustered fixture, where IVF candidate recall vs the exact pair set
is 1.0 by construction).

Index contents: (cell, id, vec) — one row per vector per probed cell
(the multi-probe analogue of the band rows in dedup_index; storing
all n_probe assignments makes "share >= 1 cell" an equi-join). As in
the MinHash index, EVERY seen vector is recorded, duplicates
included, so a dup-of-a-dup is still caught. Epoch-scoped overwrites
give replay idempotence; compact_epochs bounds directory growth.

At 100 TB: per-epoch cost is O(new vectors * n_probe) assignment
rows + one cell equi-join whose per-cell fan-in is corpus/n_centroids
x batch/n_centroids x n_probe^2 — n_centroids is the scale dial, and
the centroid set is swapped by an offline rebuild + directory swap
exactly like streaming/ann_index.py documents. The per-candidate
verify here is the expression cosine (bit-identical fold to the
oracle); the Arrow GEMM swap used by the batch sweep applies
unchanged when candidate volume warrants it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    cosine,
    nearest_cells,
    neardup_pairs_ivf_candidates,
    pairs_from_cell_rows,
    sample_centroids,
)


def _cells_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "cells")


def _survivors_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "survivors")


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "centroids.json")


def init_semdedup_index(
    centroid_source: DataFrame,
    index_dir: str,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Freeze the centroid set — the index's immutable contract. The
    source is typically the first arriving corpus slice (at scale: a
    k-means sample); no vectors are ingested here."""
    cents = sample_centroids(centroid_source, n_centroids, id_col, vec_col)
    os.makedirs(index_dir, exist_ok=True)
    with open(_meta_path(index_dir), "w") as f:
        json.dump(cents, f)


def _load_centroids(index_dir: str) -> list[tuple[int, list[float]]]:
    with open(_meta_path(index_dir)) as f:
        return [(int(c), v) for c, v in json.load(f)]


def read_survivors(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_survivors_dir(index_dir))


def batch_semdedup_survivors(
    emb: DataFrame,
    threshold: float = 0.9,
    cents: list[tuple[int, list[float]]] | None = None,
    n_centroids: int | None = None,
    n_probe: int = 10,
    id_col: str = "vec_id",
    n_rows: int | None = None,
) -> DataFrame:
    """The batch twin: vectors with no smaller-id IVF-candidate match
    in the whole input — one anti-join off the candidate pair set.
    ``n_centroids=None`` inherits the corpus-scaled cell count
    (constant occupancy — see neardup_pairs_ivf_candidates); the
    streaming index keeps its explicit frozen-centroid contract."""
    dropped = (
        neardup_pairs_ivf_candidates(
            emb, threshold, id_col=id_col, n_centroids=n_centroids,
            n_probe=n_probe, cents=cents, n_rows=n_rows,
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return emb.join(dropped, id_col, "left_anti")


def _cross_dropped_kernel(
    batch_cells: DataFrame, idx_cells: DataFrame, threshold: float
) -> DataFrame:
    """Batch-vs-index candidate verify on the cell equi-join, executed
    per cell as the two-stage Arrow GEMM (BLAS prefilter over
    normalized vectors, then the exact left-to-right float64 fold on
    survivors — operators/similarity.pairs_from_cell_rows discipline).
    Replaces the r7 per-row expression cosine, whose interpreted
    64-dim fold over every cell-sharing candidate made per-epoch cost
    explode as the index grew (the r7 verdict #5 'index-rescan
    blowup': ~10⁸ candidate folds by epoch 3 of the sf1 soak).
    Emitted values are bit-identical: the authoritative
    round(cos, 6) >= threshold filter runs JVM-side on the exact-fold
    cosine, exactly like the batch path."""
    import pandas as pd

    pre_threshold = threshold - 1e-6  # HALF_UP superset margin
    both = batch_cells.select("cell", "_id", "_vec", F.lit("n").alias("_side")).unionByName(
        idx_cells.select("cell", "_id", "_vec", F.lit("i").alias("_side"))
    )

    def _k(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np  # runs on executors

        empty = pd.DataFrame(
            {"b_id": pd.Series(dtype="int64"), "cos_raw": pd.Series(dtype="float64")}
        )
        old = pdf[pdf["_side"] == "i"]
        new = pdf[pdf["_side"] == "n"]
        if len(old) == 0 or len(new) == 0:
            return empty
        A = np.stack(old["_vec"].to_numpy()).astype(np.float64)
        B = np.stack(new["_vec"].to_numpy()).astype(np.float64)
        a_ids = old["_id"].to_numpy()
        b_ids = new["_id"].to_numpy()
        dim = A.shape[1]
        na = np.zeros(len(A))
        nb = np.zeros(len(B))
        for d in range(dim):
            na += A[:, d] * A[:, d]
            nb += B[:, d] * B[:, d]
        if (na == 0).any() or (nb == 0).any():
            bad = list(a_ids[na == 0]) + list(b_ids[nb == 0])
            raise ValueError(f"zero-norm embedding(s) {bad[:5]}: cosine undefined")
        ra, rb = np.sqrt(na), np.sqrt(nb)
        fast = (A * (1.0 / ra)[:, None]) @ (B * (1.0 / rb)[:, None]).T
        mask = (a_ids[:, None] < b_ids[None, :]) & (fast >= pre_threshold - 1e-9)
        ai, bi = np.nonzero(mask)
        if len(ai) == 0:
            return empty
        Aa, Bb = A[ai], B[bi]
        dots = np.zeros(len(ai))
        for d in range(dim):
            dots += Aa[:, d] * Bb[:, d]
        cos = dots / (ra[ai] * rb[bi])
        keep = cos >= pre_threshold
        return pd.DataFrame({"b_id": b_ids[bi][keep], "cos_raw": cos[keep]})

    cand = both.groupBy("cell").applyInPandas(_k, "b_id long, cos_raw double")
    return cand.filter(F.round("cos_raw", 6) >= threshold).select("b_id")


def ingest_embeddings_batch(
    batch: DataFrame,
    epoch_id: int,
    index_dir: str,
    threshold: float = 0.9,
    n_probe: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Dedup one micro-batch of vectors against the index, then commit
    the batch's cell rows to it. Returns {"n_dropped": ...}."""
    spark = batch.sparkSession
    cents = _load_centroids(index_dir)
    batch_cells = (
        batch.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .withColumn("cell", F.explode(nearest_cells(F.col("_vec"), cents, n_probe)["cell"]))
        .localCheckpoint()
    )

    cells_path = _cells_dir(index_dir)
    cross_dropped = None
    if os.path.isdir(cells_path):
        idx = spark.read.parquet(cells_path)
        cross_dropped = _cross_dropped_kernel(
            batch_cells, idx.select("cell", "_id", "_vec"), threshold
        ).select(F.col("b_id").alias(id_col))
    # reuse the checkpointed cell assignment: re-deriving it through
    # neardup_pairs_ivf_candidates would evaluate the n_centroids-dot
    # nearest_cells expression a second time over the whole batch
    within_dropped = pairs_from_cell_rows(batch_cells, threshold).select(
        F.col("b_id").alias(id_col)
    )
    dropped = (
        within_dropped
        if cross_dropped is None
        else within_dropped.unionByName(cross_dropped)
    ).distinct().localCheckpoint()  # materialize BEFORE the index write below
    survivors = batch.join(dropped, id_col, "left_anti")

    batch_cells.write.mode("overwrite").parquet(
        os.path.join(cells_path, f"epoch={int(epoch_id)}")
    )
    survivors.write.mode("overwrite").parquet(
        os.path.join(_survivors_dir(index_dir), f"epoch={int(epoch_id)}")
    )
    return {"n_dropped": dropped.count()}


def start_semdedup_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
    threshold: float = 0.9,
    n_probe: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Stream an embedding directory through the incremental semantic
    dedup (availableNow drain; drop the trigger for a live feed). The
    index must be init'd (frozen centroids) before starting."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_embeddings_batch(
            batch_df, epoch_id, index_dir, threshold, n_probe, id_col, vec_col
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
