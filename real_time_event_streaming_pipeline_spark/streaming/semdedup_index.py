"""Incremental SEMANTIC dedup against a persisted IVF cell index —
the embedding-space sibling of streaming/dedup_index.py: new
micro-batches of vectors are deduped against the accumulated index
instead of re-running the all-corpus SemDeDup sweep.

Semantics (r12 — the asymmetric home-vs-probe rule, unified with the
registered batch face per r11 verdict #4): vector b is a duplicate
iff some vector a with a smaller id, anywhere in the corpus seen so
far, is an ASYM candidate of b — home(a) ∈ probes(b) or
home(b) ∈ probes(a), against a FROZEN centroid set — and
round(cos(a, b), 6) >= threshold. This is exactly the candidate rule
of operators/similarity.neardup_pairs_ivf_asym; the batch face, the
survivors sweep below, and this index now share ONE implementation
(asym_cell_rows + pairs_from_asym_cell_rows) instead of being twins
by convention. Because home/probe assignment depends only on
(vector, centroids), a pair's candidacy is identical whether both
members arrive in one batch or epochs apart, so the streamed
survivor set equals the one-shot batch sweep for any id-ordered
split (pinned in tests/test_semdedup_index.py on the clustered
fixture, where candidate recall vs the exact pair set is 1.0 by
construction).

Index contents: (cell, id, vec, role) — one 'h' row at the vector's
home cell + n_probe 'p' rows at its probed cells (1 + n_probe = 7
payload copies at the default, vs the retired symmetric layout's
10). Storing BOTH roles makes each OR-rule direction an equi-join:
a cross pair surfaces either in the index vector's home cell (index
'h' × batch 'p') or the batch vector's home cell (batch 'h' × index
'p'). As in the MinHash index, EVERY seen vector is recorded,
duplicates included, so a dup-of-a-dup is still caught. Epoch-scoped
overwrites give replay idempotence; compact_epochs bounds directory
growth. (An index written before r12 lacks the role column and must
be rebuilt — the same offline rebuild + directory swap a centroid
change requires.)

At 100 TB: per-epoch cost is O(new vectors * (1 + n_probe))
assignment rows + one cell equi-join whose per-cell GEMM is
homes × probes (~16× fewer gate FLOPs than the symmetric all-pairs
form at the default operating point) — n_centroids is the scale
dial, and the centroid set is swapped by an offline rebuild +
directory swap exactly like streaming/ann_index.py documents. The
per-candidate verify is the two-stage f32-gated Arrow kernel with
the exact f64 refold — emitted values bit-identical to the
expression cosine.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    asym_cell_rows,
    neardup_pairs_ivf_asym,
    pairs_from_asym_cell_rows,
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
    n_probe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Freeze the index's immutable contract: the centroid set AND
    n_probe. Both determine OR-rule candidacy, so both are persisted
    here and validated on every ingest (r12 ADVICE: n_probe was
    documented as contract but never stored — a caller resuming with
    a different value, or a future default change, would silently
    alter candidacy across epochs and break streamed==batch). The
    source is typically the first arriving corpus slice (at scale: a
    k-means sample); no vectors are ingested here."""
    cents = sample_centroids(centroid_source, n_centroids, id_col, vec_col)
    os.makedirs(index_dir, exist_ok=True)
    with open(_meta_path(index_dir), "w") as f:
        json.dump({"n_probe": int(n_probe), "centroids": cents}, f)


def _load_meta(index_dir: str) -> tuple[list[tuple[int, list[float]]], int]:
    """(centroids, n_probe) from centroids.json. A legacy bare-list
    file predates the n_probe contract (and the role column) and must
    be rebuilt — same loud failure as the schema change."""
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    if isinstance(meta, list):
        raise ValueError(
            "semdedup index at "
            f"{index_dir!r} was built before the persisted-n_probe "
            "contract (r13); rebuild it with init_semdedup_index"
        )
    cents = [(int(c), v) for c, v in meta["centroids"]]
    return cents, int(meta["n_probe"])


def read_survivors(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_survivors_dir(index_dir))


def batch_semdedup_survivors(
    emb: DataFrame,
    threshold: float = 0.9,
    cents: list[tuple[int, list[float]]] | None = None,
    n_centroids: int | None = None,
    n_probe: int = 6,
    id_col: str = "vec_id",
    n_rows: int | None = None,
) -> DataFrame:
    """The batch twin: vectors with no smaller-id asym-candidate match
    in the whole input — one anti-join off the candidate pair set of
    the SAME generator the registered `llm_semdedup` face uses
    (neardup_pairs_ivf_asym; r12 unification). ``n_centroids=None``
    inherits the corpus-scaled cell count (constant occupancy); the
    streaming index keeps its explicit frozen-centroid contract."""
    dropped = (
        neardup_pairs_ivf_asym(
            emb, threshold, id_col=id_col, n_centroids=n_centroids,
            n_probe=n_probe, cents=cents, n_rows=n_rows,
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return emb.join(dropped, id_col, "left_anti")


def _cross_dropped(
    batch_cells: DataFrame, idx_cells: DataFrame, threshold: float
) -> DataFrame:
    """Batch-vs-index asym candidate verify: union the two role-tagged
    row sets under a ``_side`` marker and run the SHARED pair kernel
    (operators/similarity.pairs_from_asym_cell_rows,
    cross_sides_only=True) — only index×batch pairings are scored, so
    the per-epoch cost never re-pairs the index against itself (the
    r7 'index-rescan blowup' guard, carried over from the symmetric
    kernel this replaces in r12). Emitted values are bit-identical to
    the batch face's: same f32 gate, same exact f64 refold, same
    JVM-side round(cos, 6) >= threshold filter."""
    both = batch_cells.select(
        "cell", "_id", "_vec", "role", F.lit("n").alias("_side")
    ).unionByName(
        idx_cells.select("cell", "_id", "_vec", "role", F.lit("i").alias("_side"))
    )
    return pairs_from_asym_cell_rows(
        both, threshold, cross_sides_only=True
    ).select("b_id")


def ingest_embeddings_batch(
    batch: DataFrame,
    epoch_id: int,
    index_dir: str,
    threshold: float = 0.9,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Dedup one micro-batch of vectors against the index, then commit
    the batch's role-tagged cell rows to it. ``n_probe`` is part of
    the index contract exactly like the frozen centroids — it is read
    from centroids.json; passing an explicit value that differs from
    the stored one is an error (r12 ADVICE), because a mismatched
    epoch's OR-rule candidacy would silently diverge from the rest of
    the index. Returns {"n_dropped": ...}."""
    spark = batch.sparkSession
    cents, stored_probe = _load_meta(index_dir)
    if n_probe is None:
        n_probe = stored_probe
    elif int(n_probe) != stored_probe:
        raise ValueError(
            f"n_probe={n_probe} does not match this index's frozen "
            f"contract (n_probe={stored_probe} in centroids.json); "
            "candidacy must be identical across epochs — rebuild the "
            "index to change n_probe"
        )
    batch_cells = asym_cell_rows(
        batch, cents, n_probe, id_col=id_col, vec_col=vec_col
    ).localCheckpoint()

    cells_path = _cells_dir(index_dir)
    cross_dropped = None
    if os.path.isdir(cells_path):
        idx = spark.read.parquet(cells_path)
        cross_dropped = _cross_dropped(
            batch_cells, idx.select("cell", "_id", "_vec", "role"), threshold
        ).select(F.col("b_id").alias(id_col))
    # reuse the checkpointed cell assignment: re-deriving it through
    # neardup_pairs_ivf_asym would run the assignment kernel a second
    # time over the whole batch
    within_dropped = pairs_from_asym_cell_rows(batch_cells, threshold).select(
        F.col("b_id").alias(id_col)
    )
    dropped = (
        within_dropped
        if cross_dropped is None
        else within_dropped.unionByName(cross_dropped)
    ).distinct()
    # r12 ADVICE: the shared kernel emits b_id = max(pair ids), so a
    # batch that violates the documented id-ordered contract can
    # surface an INDEX-side id here — harmless for the anti-join (no
    # batch row carries that id) but it would inflate n_dropped. Keep
    # only ids actually present in this batch before counting.
    dropped = dropped.join(
        batch.select(id_col), id_col, "left_semi"
    ).localCheckpoint()  # materialize BEFORE the index write below
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
    n_probe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Stream an embedding directory through the incremental semantic
    dedup (availableNow drain; drop the trigger for a live feed). The
    index must be init'd (frozen centroids + n_probe) before starting;
    n_probe defaults to the index's stored contract and an explicit
    mismatching value fails per-epoch in ingest_embeddings_batch."""
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
