"""Property-based checks (hypothesis) for the engine's determinism
invariants. Few examples, tiny data — each example is a Spark job."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.citystream import (
    enrich_events,
    windowed_agg,
)
from real_time_event_streaming_pipeline_spark.plans.relational import _exact_sum

MONEY = st.decimals(
    min_value="-99999.99", max_value="99999.99", places=2
).map(float)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(MONEY, min_size=1, max_size=40), parts=st.integers(1, 8))
@settings(**_SETTINGS)
def test_exact_sum_partitioning_invariant(spark, vals, parts):
    """_exact_sum must not depend on row order or partition count, and
    must equal the decimal-exact sum of 2-decimal inputs."""
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(parts)
    got = df.agg(_exact_sum(F.col("x"), 2).alias("s")).first().s
    want = round(sum(round(v * 100) for v in vals)) / 100.0
    assert got == pytest.approx(want, abs=0)


@given(
    offsets=st.lists(st.integers(0, 86_400), min_size=1, max_size=30, unique=True)
)
@settings(**_SETTINGS)
def test_window_bucket_assignment(spark, offsets):
    """Every event lands in exactly the floor(epoch/300)*300 bucket and
    total counts are preserved (no event lost or duplicated)."""
    base = int(datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp())
    rows = [
        (i, datetime.fromtimestamp(base + o, tz=timezone.utc).replace(tzinfo=None), i, "view", 1.0, "{}")
        for i, o in enumerate(offsets)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    agg = windowed_agg(enrich_events(df)).collect()
    assert sum(r.event_count for r in agg) == len(offsets)
    starts = {r.window_start for r in agg}
    want = {
        datetime.fromtimestamp((base + o) // 300 * 300, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        for o in offsets
    }
    assert starts == want


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=12
    ),
    parts=st.integers(1, 4),
)
@settings(**_SETTINGS)
def test_jaccard_pair_explode_equals_naive_join(spark, texts, parts):
    """The grouped pair-explode candidate generation must produce the
    exact pair set of the naive shingle self-join, for any corpus and
    partitioning (including empty/short docs)."""
    from real_time_event_streaming_pipeline_spark.operators.dedup import (
        doc_shingles,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)
    got = {
        (r.a_id, r.b_id, r.n_common)
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    sh = doc_shingles(docs, 3).collect()
    by_doc: dict[int, set] = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    want = set()
    ids = sorted(by_doc)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = len(by_doc[a] & by_doc[b])
            if common:
                want.add((a, b, common))
    assert got == want


@given(parts=st.integers(1, 6), seed_rows=st.integers(20, 60))
@settings(**_SETTINGS)
def test_hash_sample_partitioning_invariant(spark, parts, seed_rows):
    """The deterministic Bernoulli sample picks the same ids under any
    partitioning (rand()-based sampling has no such property)."""
    import hashlib

    from real_time_event_streaming_pipeline_spark.plans.relational import split_bucket

    df = spark.createDataFrame(
        [(i,) for i in range(seed_rows)], "doc_id long"
    ).repartition(parts)
    picked = {
        r.doc_id for r in df.filter(split_bucket(F.col("doc_id"), 1000) < 100).collect()
    }
    want = {
        i
        for i in range(seed_rows)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1000 < 100
    }
    assert picked == want


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5), min_size=2, max_size=12
    )
)
@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
def test_fuzzy_linkage_blocking_complete(names):
    """Deletion-neighborhood blocking must reproduce the brute-force
    edit-distance-<=1 pair set for ARBITRARY short strings — the
    completeness claim llm_fuzzy_linkage's oracle relies on, checked
    in pure Python (the Spark plan mirrors this construction
    expression-for-expression)."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    def variants(s: str) -> set[str]:
        return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}

    brute = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    vs = [variants(s) for s in names]
    blocked = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if vs[i] & vs[j] and lev(names[i], names[j]) <= 1
    }
    assert blocked == brute
