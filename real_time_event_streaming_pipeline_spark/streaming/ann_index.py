"""Streaming ANN index refresh (SCALING.md roadmap item 5).

An IVF index that stays queryable while new embeddings stream in:

- the **centroid set** is fixed at build time (the index contract —
  any vector's cell depends only on it, so assignment is deterministic
  no matter when or in which micro-batch a vector arrives);
- the **cell table** is parquet partitioned by (epoch, cell); a
  refresh is a pure partition-wise append from `foreachBatch` — no
  rebuild, no read-modify-write. Each epoch OVERWRITES its own
  `epoch=N` subtree, so a foreachBatch replay after a crash rewrites
  the same paths instead of appending duplicates (the exactly-once
  discipline shared with streaming/dedup_index.py, replay-tested in
  tests/test_streaming_ann.py);
- the **search** reads only the probed cells: the `cell IN (...)`
  predicate prunes parquet partitions, so scan cost is
  corpus × n_probe/n_centroids regardless of index size.

At 100 TB: cells are the unit of parallelism AND of storage pruning —
a 4096-centroid index over 10^10 vectors keeps per-cell files in the
hundreds of MB, appends touch only the cells present in a batch, and
centroid drift is handled by rebuilding the index offline with new
centroids, then swapping directories (same immutable-contract model
as the reference's last-writer-wins DynamoDB tables, SURVEY.md §1.1).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine, nearest_cells, sample_centroids


def _cells_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "cells")


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "centroids.json")


def _load_centroids(index_dir: str) -> list[tuple[int, list[float]]]:
    with open(_meta_path(index_dir)) as f:
        return [(int(c), v) for c, v in json.load(f)]


def _assigned(df: DataFrame, cents, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        nearest_cells(vec_col, cents, 1)[0]["cell"].alias("cell"),
    )


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: list[tuple[int, list[float]]] | None = None,
) -> None:
    """Assign every vector to its nearest centroid and lay the cell
    table down partitioned by cell; persist the centroid set as the
    index's metadata. The base build lands under epoch=-1 so streamed
    epochs (0, 1, ...) sit beside it in one partition scheme.
    ``cents`` accepts a prebuilt centroid artifact (the frozen
    contract — e.g. another index's persisted metadata) instead of
    training one here."""
    if cents is None:
        cents = sample_centroids(emb, n_centroids, id_col, vec_col)
    os.makedirs(index_dir, exist_ok=True)
    with open(_meta_path(index_dir), "w") as f:
        json.dump(cents, f)
    _assigned(emb, cents, id_col, vec_col).write.partitionBy("cell").parquet(
        os.path.join(_cells_dir(index_dir), "epoch=-1")
    )


def start_index_refresh(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Keep the index current as embeddings stream in: each micro-batch
    is assigned against the frozen centroid set and appended to the
    partitioned cell table. Each epoch overwrites its OWN epoch=N
    subtree — foreachBatch is at-least-once, so a replayed epoch must
    rewrite, not append beside its previous attempt. Returns the
    StreamingQuery."""
    cents = _load_centroids(index_dir)

    def refresh(batch: DataFrame, epoch_id: int) -> None:
        _assigned(batch, cents, id_col, vec_col).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(os.path.join(_cells_dir(index_dir), f"epoch={int(epoch_id)}"))

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(refresh)
        .start()
    )


def search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over the index as it stands now. The probed cell ids are
    plan literals, so the `cell` filter prunes the partitioned cell
    table at the source — unprobed cells are never read."""
    from pyspark.sql import Window

    cents = _load_centroids(index_dir)
    cell_tbl = spark.read.parquet(_cells_dir(index_dir))
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cells", nearest_cells("q_vec", cents, n_probe))
        .select("q_id", "q_vec", F.explode(F.col("cells")["cell"]).alias("cell"))
    )
    probed = [r.cell for r in q.select("cell").distinct().collect()]
    # cross-epoch redelivery guard: a vec_id re-sent (or updated) in a
    # later epoch exists under BOTH epoch=N partitions — without this
    # dedup the same n_id occupies two adjacent ranks and pushes a real
    # neighbor out of the top k. Latest epoch wins among the PROBED
    # rows; an updated vector that moved to an unprobed cell is only
    # healed by compaction (rewrite old epochs), the documented
    # maintenance pass for mutable corpora.
    wv = Window.partitionBy("n_id").orderBy(F.desc("epoch"))
    visible = (
        cell_tbl.filter(F.col("cell").isin(probed))
        .withColumn("_v", F.row_number().over(wv))
        .filter(F.col("_v") == 1)
        .drop("_v")
    )
    scored = (
        visible.join(F.broadcast(q), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "n_id",
            F.round("cos", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
