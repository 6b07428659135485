"""Incremental near-duplicate detection against a persisted MinHash
band index — the production dedup shape: new micro-batches are deduped
against the EXISTING corpus index instead of re-sweeping the union.

Semantics (chosen to be exactly parallelizable AND exactly
incremental): a document d is a duplicate iff some document k with a
smaller id, anywhere in the corpus seen so far, either shares an LSH
band bucket with d at estimated Jaccard >= threshold or equals d's
text exactly (the exact clause covers sub-k-token documents, which
have no shingles hence no signature — without it a byte-identical
copy of a short doc would be invisible). In one batch that is

    survivors = docs  ANTI-JOIN  {b_id of minhash_lsh_pairs(docs)}

(pairs carry a_id < b_id, so the b_id side is precisely "has a
smaller-id match"). Incrementally it decomposes per micro-batch into

    dropped(d) = d matches an INDEXED doc with smaller id
               | d matches a smaller-id doc in its OWN batch

because every earlier-arriving doc is in the index by the time d's
batch runs. When ids are assigned in arrival order (the streaming
corpus contract) the two are identical batch-for-batch — the closure
property pinned in tests/test_dedup_index.py against
`batch_minhash_survivors` over the union.

The index stores the band rows of EVERY seen document (survivors and
duplicates alike): a duplicate of a duplicate must still be caught
even when its direct match was itself dropped. Index growth is
O(corpus x bands) rows of (band, bhash, id, sig) — the signature, not
the payload; document text never enters the index.

Crash safety: each epoch writes its band rows and its survivors to an
epoch=N subdirectory with overwrite mode, so a foreachBatch replay
after a mid-epoch crash overwrites the same paths instead of
appending duplicates (the same exactly-once discipline as the upsert
sink's staged swap, streaming/sinks.py). A replay that runs AFTER the
epoch's band rows landed still computes the identical survivor set:
the only extra index rows are the batch's own, and the strict
`idx_id < id` comparison makes them replicate the within-batch rule,
not contradict it.

At 100 TB: the per-epoch cost is O(new docs) signatures + one
equi-join against the index on (band, bhash) — at cluster scale the
index side would be laid out bucketed by bhash so the join co-locates
without a full index shuffle; the epoch=N layout additionally gives
time-travel (dedup state as of any epoch) and cheap compaction
(rewrite old epochs into one, keep the newest ones as-is).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.dedup import est_jaccard, minhash_band_rows, pairs_from_band_rows


# Band-hash compatibility tag. bhash values are only comparable when
# the base hash function AND the banding parameters match — the r6
# xxhash64→md5-60bit swap is exactly the kind of change that would
# otherwise let every near-dup of a pre-swap document silently survive
# (new bhashes never equal indexed ones; no error, no schema change).
# The tag is stamped on first commit and checked on every ingest.
_INDEX_FORMAT = "minhash-md5h60-v1"


def _format_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_FORMAT")


def _check_or_stamp_format(
    index_dir: str, k: int, num_hashes: int, bands: int
) -> None:
    tag = f"{_INDEX_FORMAT};k={k};num_hashes={num_hashes};bands={bands}"
    p = _format_path(index_dir)
    if os.path.exists(p):
        with open(p) as fh:
            found = fh.read().strip()
        if found != tag:
            raise ValueError(
                f"dedup index at {index_dir} was built as '{found}' but this "
                f"engine writes '{tag}': band hashes are not comparable "
                "across hash functions or banding parameters — rebuild the "
                "index from the corpus instead of mixing formats"
            )
        return
    if os.path.isdir(_bands_dir(index_dir)):
        raise ValueError(
            f"dedup index at {index_dir} has band rows but no _FORMAT "
            "marker (built by a pre-versioning engine, possibly with a "
            "different base hash) — rebuild the index from the corpus"
        )
    os.makedirs(index_dir, exist_ok=True)
    # tmp + os.replace: a crash mid-write must not leave a truncated
    # marker that permanently hard-fails every future ingest with a
    # misleading "built as <garbage>" error — the same atomic-publish
    # discipline as _checkpoint_app_id and the cursor file (ADVICE r6)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(tag)
    os.replace(tmp, p)


def _bands_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "bands")


def _hashes_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "hashes")


def _survivors_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "survivors")


def read_index_bands(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The accumulated band rows across every committed epoch, or None
    before the first epoch lands."""
    path = _bands_dir(index_dir)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def read_index_hashes(spark: SparkSession, index_dir: str) -> DataFrame | None:
    path = _hashes_dir(index_dir)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def read_survivors(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_survivors_dir(index_dir))


def batch_minhash_survivors(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 256,
) -> DataFrame:
    """The batch twin: documents with no smaller-id match in the whole
    input, where a match is EITHER a band collision at est-Jaccard >=
    threshold OR exact text equality. The exact clause is not
    redundant belt-and-braces: a document shorter than k tokens has no
    shingles, hence no signature, and would otherwise be invisible to
    the minhash side even as a byte-identical copy. For docs with
    signatures, exact equality implies identical signatures (est 1.0),
    so the clause only ever ADDS the short-doc coverage. One anti-join
    off the union of the two dropped sets — the ground truth the
    incremental path reproduces for any batch split."""
    from ..operators.dedup import minhash_lsh_pairs

    near_dropped = (
        minhash_lsh_pairs(docs, k, num_hashes, bands, id_col, max_bucket)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("b_id").alias(id_col))
    )
    # shuffle (md5, id) only — the payload never moves (the
    # exact_dedup_by_hash shape); non-minimum ids per hash drop.
    # NULL text is excluded: SQL equality semantics (NULL != NULL) —
    # and the incremental path's equi-join on content_md5 could never
    # match a NULL key, so including NULLs here (the window would
    # group them) would break the streamed==batch closure
    exact_dropped = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col)).alias("_md5"), F.col(id_col))
        .withColumn("_min", F.min(id_col).over(W.partitionBy("_md5")))
        .filter(F.col(id_col) != F.col("_min"))
        .select(id_col)
    )
    dropped = near_dropped.unionByName(exact_dropped).distinct()
    return docs.join(dropped, id_col, "left_anti")


def ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    index_dir: str,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 256,
) -> dict:
    """Dedup one micro-batch against the index, then commit the batch
    to it. Callable directly (batch backfill) or from foreachBatch.
    Matching = band collision at est-Jaccard >= threshold OR exact
    text equality (see batch_minhash_survivors on why the exact
    clause exists: sub-k-token docs have no signature).

    Bucket capping mirrors the batch twin's `_capped_bucket_lists` rule on the
    UNION-so-far: a (band, bhash) bucket whose accumulated distinct
    docs (index + this batch) exceed ``max_bucket`` produces no
    matches — neither within-batch nor against the index — bounding
    the per-key join fan-in at max_bucket² even when boilerplate
    floods one bucket. Distinct-doc counting keeps a replay that runs
    AFTER the epoch's band rows landed idempotent (its own rows don't
    double the count). Exact streamed==batch equivalence holds as
    long as no bucket's FINAL union size exceeds the cap; when one
    crosses the cap mid-stream, verdicts issued while it was under
    the cap stand (the one-shot sweep would retroactively un-drop
    them — anti-monotone, so no online algorithm can match it), and
    the returned stats surface the condition instead of hiding it.

    Returns {"n_dropped": ..., "n_overfull_buckets": ...}."""
    _check_or_stamp_format(index_dir, k, num_hashes, bands)
    spark = batch.sparkSession
    # one signature pass serves the index lookup, the within-batch
    # pairing, and the index append — localCheckpoint so the shingle
    # explode + 32-way min-agg runs once, not three times
    banded = minhash_band_rows(batch, k, num_hashes, bands, id_col).localCheckpoint()
    hashes = batch.select(
        F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col)
    ).localCheckpoint()

    idx = read_index_bands(spark, index_dir)
    # union-so-far bucket sizes for the batch's keys only (semi join);
    # the index side reads (band, bhash, id) — column-pruned, far
    # lighter than the sig-carrying match join below
    union_rows = banded.select("band", "bhash", id_col)
    if idx is not None:
        union_rows = idx.select("band", "bhash", id_col).unionByName(union_rows)
    overfull = (
        union_rows.join(
            banded.select("band", "bhash").distinct(), ["band", "bhash"], "left_semi"
        )
        .groupBy("band", "bhash")
        .agg(F.count_distinct(id_col).alias("_uc"))
        .filter(F.col("_uc") > max_bucket)
        .select("band", "bhash")
        .localCheckpoint()
    )
    capped = banded.join(overfull, ["band", "bhash"], "left_anti")
    if idx is not None:
        cross_dropped = (
            capped.join(
                idx.select(
                    "band",
                    "bhash",
                    F.col(id_col).alias("_idx_id"),
                    F.col("sig").alias("_idx_sig"),
                ),
                ["band", "bhash"],
            )
            .filter(
                (F.col("_idx_id") < F.col(id_col))
                & (est_jaccard(F.col("_idx_sig"), F.col("sig"), num_hashes) >= threshold)
            )
            .select(id_col)
            .distinct()
        )
    else:
        cross_dropped = None
    idx_h = read_index_hashes(spark, index_dir)
    if idx_h is None and idx is not None:
        # a band table without a hash table is a broken/legacy index:
        # silently skipping the exact check would let byte-identical
        # short-doc copies through — the condition the clause exists
        # to catch. Rebuild the index (or backfill hashes/) instead.
        raise RuntimeError(
            f"dedup index at {index_dir} has bands/ but no hashes/ — "
            "pre-exact-clause layout; rebuild or backfill before ingesting"
        )
    if idx_h is not None:
        cross_exact = (
            hashes.join(
                idx_h.select("content_md5", F.col(id_col).alias("_idx_id")),
                "content_md5",
            )
            .filter(F.col("_idx_id") < F.col(id_col))
            .select(id_col)
        )
    else:
        cross_exact = None
    # within-batch pairing runs on the capped rows: every surviving
    # bucket has union size <= max_bucket, so the generator's own
    # per-batch cap (kept as belt) can never bind
    within_dropped = (
        pairs_from_band_rows(capped, num_hashes, id_col, max_bucket)
        .filter(F.col("est_jaccard") >= threshold)
        .select(F.col("b_id").alias(id_col))
    )
    within_exact = (
        hashes.filter(F.col("content_md5").isNotNull())
        .withColumn("_min", F.min(id_col).over(W.partitionBy("content_md5")))
        .filter(F.col(id_col) != F.col("_min"))
        .select(id_col)
    )
    dropped = within_dropped.unionByName(within_exact)
    if cross_dropped is not None:
        dropped = dropped.unionByName(cross_dropped)
    if cross_exact is not None:
        dropped = dropped.unionByName(cross_exact)
    dropped = dropped.distinct()
    # materialize the verdict BEFORE touching the index: on a replay
    # the bands overwrite below deletes the very files the (lazy)
    # cross-match plan references — the survivor write would then read
    # through to vanished parquet. The dropped set is ids only, so the
    # checkpoint is tiny.
    dropped = dropped.localCheckpoint()
    survivors = batch.join(dropped, id_col, "left_anti")

    # epoch-scoped overwrites: a replayed epoch rewrites its own
    # subdirectories, never appends beside its previous attempt
    banded.write.mode("overwrite").parquet(
        os.path.join(_bands_dir(index_dir), f"epoch={epoch_id}")
    )
    hashes.write.mode("overwrite").parquet(
        os.path.join(_hashes_dir(index_dir), f"epoch={epoch_id}")
    )
    survivors.write.mode("overwrite").parquet(
        os.path.join(_survivors_dir(index_dir), f"epoch={epoch_id}")
    )
    # truncation must never be silent: both counts are on checkpointed
    # (already materialized) frames, so these are metadata-cheap jobs
    return {
        "n_dropped": dropped.count(),
        "n_overfull_buckets": overfull.count(),
    }


def start_dedup_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int = 1,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
):
    """Stream a document directory through the incremental dedup:
    every micro-batch is checked against (then committed to) the band
    index; survivors accumulate under index_dir/survivors. availableNow
    drains what is present and stops — drop it for a live feed."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            batch_df, epoch_id, index_dir, k, num_hashes, bands, threshold, id_col
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
