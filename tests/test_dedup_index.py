"""Incremental dedup against the persisted MinHash band index
(streaming/dedup_index.py): streamed micro-batches deduped against the
accumulated index must produce exactly the surviving-doc set of one
batch sweep over the union, replays of an epoch must not change the
outcome, and a crash between the two epoch writes must heal on
replay."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.streaming.dedup_index import (
    batch_minhash_survivors,
    ingest_batch,
    read_index_bands,
    read_survivors,
    start_dedup_ingest,
)

THRESHOLD = 0.5


def _id_ordered_files(spark, sf_dir, src, n_files=3):
    """Documents laid out as n_files id-ordered arrival files — the
    production fixture from streaming/corpus_ingest.stage_epoch_files
    (one contiguous id-range per file, mtimes in id order)."""
    from real_time_event_streaming_pipeline_spark.streaming.corpus_ingest import (
        stage_epoch_files,
    )

    stage_epoch_files(spark, sf_dir, src, n_files)
    return [f for f in sorted(os.listdir(src)) if f.endswith(".parquet")]


def _batches(spark, src):
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    return [spark.read.parquet(f) for f in files]


def test_streamed_dedup_matches_batch_sweep(spark, sf_small, tmp_path):
    src = str(tmp_path / "arriving")
    files = _id_ordered_files(spark, sf_small, src)
    assert len(files) == 3
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    q = start_dedup_ingest(spark, src, index_dir, ckpt, threshold=THRESHOLD)
    q.awaitTermination(180)

    streamed = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    union = load(spark, sf_small, "documents")
    batch = {
        r.doc_id
        for r in batch_minhash_survivors(union, threshold=THRESHOLD).collect()
    }
    n_docs = union.count()
    assert streamed == batch
    assert len(streamed) < n_docs  # some documents were actually dropped

    # one epoch per file actually ran
    offsets = os.listdir(os.path.join(ckpt, "offsets"))
    assert len([f for f in offsets if not f.startswith(".")]) >= 3

    # the index remembers every seen document (duplicates included):
    # a dup of a dup must be caught even when its match was dropped
    idx_docs = {r.doc_id for r in read_index_bands(spark, index_dir).select("doc_id").distinct().collect()}
    assert len(idx_docs) == n_docs

    # restart on the same checkpoint: nothing new, nothing changes
    q2 = start_dedup_ingest(spark, src, index_dir, ckpt, threshold=THRESHOLD)
    q2.awaitTermination(180)
    again = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    assert again == streamed


def test_epoch_replay_idempotent(spark, sf_small, tmp_path):
    """Re-running a completed epoch (foreachBatch's at-least-once
    failure mode) must leave the index and survivor set bit-identical:
    epoch-scoped overwrites, not appends."""
    src = str(tmp_path / "arriving")
    _id_ordered_files(spark, sf_small, src, n_files=2)
    index_dir = str(tmp_path / "index")
    b0, b1 = _batches(spark, src)

    ingest_batch(b0, 0, index_dir, threshold=THRESHOLD)
    ingest_batch(b1, 1, index_dir, threshold=THRESHOLD)
    surv = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    bands_n = read_index_bands(spark, index_dir).count()

    ingest_batch(b1, 1, index_dir, threshold=THRESHOLD)  # replay
    assert {r.doc_id for r in read_survivors(spark, index_dir).collect()} == surv
    assert read_index_bands(spark, index_dir).count() == bands_n


def test_crash_between_band_and_survivor_writes_heals(spark, sf_small, tmp_path):
    """Simulated crash window: epoch 1's band rows landed but its
    survivors did not (the state between ingest_batch's two writes).
    The replay sees its own band rows already in the index; the strict
    smaller-id comparison makes that replicate the within-batch rule,
    so the healed state equals the uninterrupted run."""
    src = str(tmp_path / "arriving")
    _id_ordered_files(spark, sf_small, src, n_files=2)
    index_dir = str(tmp_path / "index")
    b0, b1 = _batches(spark, src)

    ingest_batch(b0, 0, index_dir, threshold=THRESHOLD)
    ingest_batch(b1, 1, index_dir, threshold=THRESHOLD)
    expected = {r.doc_id for r in read_survivors(spark, index_dir).collect()}

    # rewind to the crash state: survivors of epoch 1 vanish, bands stay
    shutil.rmtree(os.path.join(index_dir, "survivors", "epoch=1"))
    ingest_batch(b1, 1, index_dir, threshold=THRESHOLD)  # replay heals
    assert {r.doc_id for r in read_survivors(spark, index_dir).collect()} == expected


def test_batch_sweep_split_invariance(spark, sf_small):
    """The semantics' closure property, no streaming machinery: feeding
    id-ordered halves through ingest_batch equals the one-shot sweep.
    (Guards the semantics itself — if batch_minhash_survivors and
    ingest_batch ever drift, the streaming test can't tell which side
    broke.)"""
    docs = load(spark, sf_small, "documents")
    mid = sorted(r.doc_id for r in docs.select("doc_id").collect())[docs.count() // 2]
    import tempfile

    with tempfile.TemporaryDirectory() as index_dir:
        ingest_batch(docs.filter(F.col("doc_id") < mid), 0, index_dir, threshold=THRESHOLD)
        ingest_batch(docs.filter(F.col("doc_id") >= mid), 1, index_dir, threshold=THRESHOLD)
        inc = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    one_shot = {
        r.doc_id for r in batch_minhash_survivors(docs, threshold=THRESHOLD).collect()
    }
    assert inc == one_shot


def test_band_index_compaction_preserves_dedup(spark, sf_small, tmp_path):
    """compact_epochs over the band index: merge the first two epochs,
    then verify (a) the band-row multiset is unchanged modulo the
    epoch lineage column, (b) a subsequent incremental batch still
    produces exactly the batch-sweep survivor set — compaction must be
    invisible to dedup semantics."""
    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.sources.maintenance import (
        compact_epochs,
        table_file_stats,
    )

    docs = load(spark, sf_small, "documents")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut1, cut2 = ids[len(ids) // 3], ids[2 * len(ids) // 3]
    index_dir = str(tmp_path / "index")
    ingest_batch(docs.filter(F.col("doc_id") < cut1), 0, index_dir, threshold=THRESHOLD)
    ingest_batch(
        docs.filter((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)),
        1,
        index_dir,
        threshold=THRESHOLD,
    )
    bands_dir = index_dir + "/bands"
    key = lambda r: (r.doc_id, r.band, r.bhash, tuple(r.sig))  # noqa: E731
    rows_before = sorted(map(key, spark.read.parquet(bands_dir).collect()))
    files_before = table_file_stats(spark, bands_dir)["n_files"]

    res = compact_epochs(spark, bands_dir, upto_epoch=1)
    assert res["epochs_merged"] == 2
    assert table_file_stats(spark, bands_dir)["n_files"] < files_before
    assert sorted(map(key, spark.read.parquet(bands_dir).collect())) == rows_before

    # the third batch dedups against the compacted index identically
    ingest_batch(docs.filter(F.col("doc_id") >= cut2), 2, index_dir, threshold=THRESHOLD)
    inc = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    want = {r.doc_id for r in batch_minhash_survivors(docs, threshold=THRESHOLD).collect()}
    assert inc == want


def test_epoch_compaction_heals_interrupted_run(spark, sf_small, tmp_path):
    """A compaction that died between backup and staging-rename leaves
    ._old_epochs behind; the next invocation must restore it and then
    complete normally with identical content."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.sources.maintenance import (
        compact_epochs,
    )

    docs = load(spark, sf_small, "documents")
    mid = sorted(r.doc_id for r in docs.select("doc_id").collect())[docs.count() // 2]
    index_dir = str(tmp_path / "index")
    ingest_batch(docs.filter(F.col("doc_id") < mid), 0, index_dir, threshold=THRESHOLD)
    ingest_batch(docs.filter(F.col("doc_id") >= mid), 1, index_dir, threshold=THRESHOLD)
    bands_dir = index_dir + "/bands"
    key = lambda r: (r.doc_id, r.band, r.bhash)  # noqa: E731
    want = sorted(map(key, spark.read.parquet(bands_dir).collect()))

    # simulate the crash state: epochs moved into backup, no staging
    backup = os.path.join(bands_dir, "._old_epochs")
    os.makedirs(backup)
    for d in list(os.listdir(bands_dir)):
        if d.startswith("epoch="):
            os.rename(os.path.join(bands_dir, d), os.path.join(backup, d))
    shutil.rmtree(os.path.join(bands_dir, "epoch=1")) if os.path.isdir(
        os.path.join(bands_dir, "epoch=1")
    ) else None

    res = compact_epochs(spark, bands_dir, upto_epoch=1)
    assert res["epochs_merged"] == 2
    assert sorted(map(key, spark.read.parquet(bands_dir).collect())) == want


def test_short_doc_exact_dupes_caught(spark, tmp_path):
    """Documents shorter than the shingle size k have no minhash
    signature; the exact-hash clause must still drop their
    byte-identical copies — incrementally AND in the batch twin, with
    the closure property intact across the split."""
    rows = [
        (1, "hello world", "s"),          # short: 2 tokens < k=3
        (2, "hello world", "s"),          # exact copy, same batch
        (3, "totally different", "s"),
        (4, None, "s"),                   # NULL text: never matches anything
        (10, "hello world", "s"),         # exact copy, later batch
        (11, "a much longer document with plenty of tokens for shingles", "s"),
        (12, "a much longer document with plenty of tokens for shingles", "s"),
        (13, None, "s"),                  # second NULL: SQL equality — no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # 2/10 short-copies dropped; 12 minhash-dropped; NULLs always survive
    want = {1, 3, 4, 11, 13}

    one_shot = {
        r.doc_id for r in batch_minhash_survivors(docs, threshold=THRESHOLD).collect()
    }
    assert one_shot == want

    index_dir = str(tmp_path / "index")
    ingest_batch(docs.filter(F.col("doc_id") < 10), 0, index_dir, threshold=THRESHOLD)
    ingest_batch(docs.filter(F.col("doc_id") >= 10), 1, index_dir, threshold=THRESHOLD)
    inc = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    assert inc == want  # incl. NULL-text docs: closure holds with NULLs


def test_bucket_cap_follows_union_rule(spark, tmp_path):
    """The over-full-bucket cap must use UNION-so-far sizes, matching
    the batch twin's _cap_buckets rule: a boilerplate bucket over the
    cap produces no matches within the batch OR against the index,
    the condition is surfaced in the returned stats, and a later
    arrival into the suppressed bucket also survives — equal to the
    one-shot sweep over the union."""
    # cyclic rotations of a doubled 7-word cycle: DISTINCT texts (so
    # the exact clause never fires) with IDENTICAL trigram SETS, hence
    # identical minhash signatures -> all docs land in the same
    # (band, bhash) bucket in EVERY band
    cyc = "alpha bravo charlie delta echo foxtrot golf".split()

    def rot(r):
        seq = cyc[r:] + cyc[:r]
        return " ".join(seq * 2)

    df = spark.createDataFrame(
        [(i, rot(i), "s") for i in range(6)],
        "doc_id long, text string, source string",
    )
    # sanity: uncapped, the identical-signature docs ARE minhash-dropped
    assert batch_minhash_survivors(df, threshold=THRESHOLD).count() == 1
    # capped at 4, every 6-doc bucket is suppressed -> everything survives
    assert batch_minhash_survivors(df, threshold=THRESHOLD, max_bucket=4).count() == 6

    index_dir = str(tmp_path / "index")
    stats0 = ingest_batch(df, 0, index_dir, threshold=THRESHOLD, max_bucket=4)
    assert stats0["n_overfull_buckets"] > 0
    assert stats0["n_dropped"] == 0
    assert {r.doc_id for r in read_survivors(spark, index_dir).collect()} == set(range(6))

    late = spark.createDataFrame(
        [(10, rot(6), "s")], "doc_id long, text string, source string"
    )
    stats1 = ingest_batch(late, 1, index_dir, threshold=THRESHOLD, max_bucket=4)
    assert stats1["n_dropped"] == 0  # bucket still over cap: no match issued
    inc = {r.doc_id for r in read_survivors(spark, index_dir).collect()}
    union = df.unionByName(late)
    want = {
        r.doc_id
        for r in batch_minhash_survivors(union, threshold=THRESHOLD, max_bucket=4).collect()
    }
    assert inc == want == set(range(6)) | {10}


def test_epoch_compaction_heals_post_rename_crash(spark, sf_small, tmp_path):
    """The other crash window: the consolidated subtree was renamed in
    but the backup was not yet cleared. The heal must restore the
    originals OVER the half-committed target (the target is always one
    of the backed-up epochs) — leaving both behind would double every
    compacted row."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from real_time_event_streaming_pipeline_spark.sources.maintenance import (
        compact_epochs,
    )

    docs = load(spark, sf_small, "documents")
    mid = sorted(r.doc_id for r in docs.select("doc_id").collect())[docs.count() // 2]
    index_dir = str(tmp_path / "index")
    ingest_batch(docs.filter(F.col("doc_id") < mid), 0, index_dir, threshold=THRESHOLD)
    ingest_batch(docs.filter(F.col("doc_id") >= mid), 1, index_dir, threshold=THRESHOLD)
    bands_dir = index_dir + "/bands"
    key = lambda r: (r.doc_id, r.band, r.bhash)  # noqa: E731
    want = sorted(map(key, spark.read.parquet(bands_dir).collect()))

    # snapshot originals, compact fully (upto beyond all epochs — the
    # target must still be the highest MERGED epoch), then recreate
    # the backup to simulate dying before its cleanup
    snap = str(tmp_path / "snap")
    shutil.copytree(bands_dir, snap)
    res = compact_epochs(spark, bands_dir, upto_epoch=10**6)
    assert res["epochs_merged"] == 2
    # reserved negative target: a foreachBatch replay (epochs >= 0)
    # can never overwrite the consolidated subtree
    assert os.path.isdir(os.path.join(bands_dir, "epoch=-2"))
    assert not os.path.isdir(os.path.join(bands_dir, "epoch=1"))
    backup = os.path.join(bands_dir, "._old_epochs")
    os.makedirs(backup)
    for d in os.listdir(snap):
        if d.startswith("epoch="):
            shutil.copytree(os.path.join(snap, d), os.path.join(backup, d))

    res2 = compact_epochs(spark, bands_dir, upto_epoch=10**6)
    assert res2["epochs_merged"] == 2
    assert sorted(map(key, spark.read.parquet(bands_dir).collect())) == want


def test_index_format_marker_guards_incompatible_index(spark, sf_small, tmp_path):
    """Band hashes are only comparable when the base hash and banding
    parameters match (the r6 xxhash64->md5 swap would otherwise let
    every near-dup of a pre-swap document silently survive): the index
    is stamped with a format tag on first commit, a mismatched tag
    refuses ingest loudly, and an unstamped-but-populated index (built
    by a pre-versioning engine) is equally refused."""
    import pytest

    docs = load(spark, sf_small, "documents").limit(20)
    index_dir = str(tmp_path / "idx")
    ingest_batch(docs, 0, index_dir, threshold=THRESHOLD)
    marker = os.path.join(index_dir, "_FORMAT")
    assert os.path.exists(marker)

    # same parameters: re-ingest accepted (replay path unchanged)
    ingest_batch(docs, 1, index_dir, threshold=THRESHOLD)

    # different banding parameters -> different bhash space: refused
    with pytest.raises(ValueError, match="not comparable"):
        ingest_batch(docs, 2, index_dir, threshold=THRESHOLD, bands=4)

    # a pre-versioning index (band rows, no marker): refused
    os.remove(marker)
    with pytest.raises(ValueError, match="_FORMAT"):
        ingest_batch(docs, 3, index_dir, threshold=THRESHOLD)
