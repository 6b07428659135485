"""Operator edge cases the sf0.01 oracle corpus can't reach (planted
fixtures): anti-join non-empty path, as-of ties, upstream-empty
windows, rollup null keys vs real nulls."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.plans.citystream import (
    enrich_events,
    windowed_agg,
)


def test_anti_join_finds_orphans(spark):
    cust = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "c_custkey long, c_name string, c_acctbal double",
    )
    orders = spark.createDataFrame([(10, 1), (11, 1), (12, 3)], "o_orderkey long, o_custkey long")
    got = [
        r.c_custkey
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").collect()
    ]
    assert got == [2]


def test_asof_prior_or_equal_tie(spark):
    """A view at exactly the purchase timestamp counts as 'prior'."""
    from real_time_event_streaming_pipeline_spark.plans import relational as R

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
            (2, "2024-01-01 00:00:00", 7, "purchase", 1.0, "{}"),
            (3, "2024-01-01 00:05:00", 7, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.createOrReplaceTempView("_asof_fixture")

    # reuse the operator body via the same composition
    from pyspark.sql import Window

    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_probe")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(0).alias("is_probe")
    )
    merged = purchases.unionByName(views)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn(
            "view_id",
            F.last(F.when(F.col("is_probe") == 0, F.col("event_id")), ignorenulls=True).over(w),
        )
        .filter(F.col("is_probe") == 1)
        .select("event_id", "view_id")
        .collect()
    )
    assert {(r.event_id, r.view_id) for r in out} == {(2, 1), (3, 1)}


def test_windowed_agg_empty_input(spark):
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    assert windowed_agg(enrich_events(ev)).count() == 0


def test_windowed_agg_bucket_boundaries(spark):
    """Events at exact 5-minute boundaries go into the bucket they
    start (inclusive start, exclusive end)."""
    ev = spark.createDataFrame(
        [
            (0, "2024-01-01 00:00:00", 0, "view", 1.0, "{}"),
            (1, "2024-01-01 00:04:59", 0, "view", 1.0, "{}"),
            (2, "2024-01-01 00:05:00", 0, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_agg(enrich_events(ev))
    got = {(r.window_start, r.event_count) for r in agg.collect()}
    assert got == {("2024-01-01 00:00:00", 2), ("2024-01-01 00:05:00", 1)}


def test_rollup_real_null_vs_all(spark):
    """coalesce-to-'(all)' must not conflate a genuine NULL key with
    the rollup total row — documents the engine's convention."""
    df = spark.createDataFrame([("A", 1), (None, 2)], "k string, v int")
    out = df.rollup("k").agg(F.sum("v").alias("s")).collect()
    # Spark rollup emits: (A,1), (None literal from data, 2), (None total, 3)
    sums = sorted(r.s for r in out)
    assert sums == [1, 2, 3]


def test_ewma_matches_reference_recurrence(spark, sf_small):
    """applyInPandas EWMA == the hand-rolled recurrence, bitwise after
    the 6-decimal round, for every user."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.operators.timeseries import (
        ewma_by_key,
    )

    ev = load(spark, sf_small, "events")
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma_by_key(ev, alpha=0.2).collect()
    }
    rows = sorted(
        ev.select("user_id", "ts", "event_id", "value").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    want = {}
    prev_user, y = None, None
    for r in rows:
        y = r.value if r.user_id != prev_user else (1 - 0.2) * y + 0.2 * r.value
        prev_user = r.user_id
        want[(r.user_id, r.event_id)] = round(y, 6)
    assert len(got) == len(want)
    assert got == want


def test_ngram_lsh_route_matches_exact_on_margin_fixture(spark):
    """The r8-verdict #4 parity pin: on a margin-bearing corpus (every
    true near-dup pair well above the 0.5 threshold, background pairs
    well below it), the LSH-candidates + exact-verify route must emit
    the IDENTICAL pair set — same (a_id, b_id, n_common, jaccard) —
    and therefore identical clusters, as the exact kept-shingle join.
    This is what licenses q_dedup_clusters' corpus-size route switch."""
    from real_time_event_streaming_pipeline_spark.operators.clustering import (
        dedup_clusters,
    )
    from real_time_event_streaming_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_lsh,
    )

    # 80 planted near-dup pairs at jaccard 19/21 ≈ 0.905 (22-token docs
    # differing in the single trailing token; per-pair banding miss
    # probability (1 − 0.905⁴)⁸ ≈ 1.4e-4, so margin-bearing means the
    # full pair set survives) + 160 background docs of unique tokens
    # (zero cross-doc shingle overlap)
    rows = []
    for g in range(80):
        base = [f"w{g}_{i}" for i in range(22)]
        rows.append((2 * g, " ".join(base)))
        rows.append((2 * g + 1, " ".join(base[:-1] + [f"x{g}"])))
    for b in range(160):
        rows.append((1000 + b, " ".join(f"u{b}_{i}" for i in range(22))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    exact = {tuple(r) for r in ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()}
    lsh = {tuple(r) for r in ngram_jaccard_pairs_lsh(docs, k=3, threshold=0.5).collect()}
    assert len(exact) == 80  # every planted pair, no background pair
    assert lsh == exact
    cl_exact = {tuple(r) for r in dedup_clusters(ngram_jaccard_pairs(docs)).collect()}
    cl_lsh = {tuple(r) for r in dedup_clusters(ngram_jaccard_pairs_lsh(docs)).collect()}
    assert cl_lsh == cl_exact


def test_minhash_estimator_unbiased():
    """Guard on the permutation family's statistical quality (the r9
    fix): mean minhash match-fraction over many true-J pairs must sit
    near J. The old (i+1)·const LCG family was linearly dependent and
    read ~0.53 for true 0.905 — this pins the property driver-side
    (pure Python, no Spark) so a future 'simplification' of _perm
    can't silently wreck banding recall again."""
    import hashlib

    from real_time_event_streaming_pipeline_spark.operators.dedup import (
        _MERSENNE,
        _perm,
    )

    def shingles(t, k=3):
        toks = t.split(" ")
        return list(
            dict.fromkeys(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
        )

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _MERSENNE

    perms = [_perm(i) for i in range(32)]
    # distinctness: no permutation is a scalar multiple of another
    assert len({a for a, _ in perms}) == 32
    total = 0
    for g in range(100):
        base = [f"q{g}_{i}" for i in range(22)]
        sa = [h60(s) for s in shingles(" ".join(base))]
        sb = [h60(s) for s in shingles(" ".join(base[:-1] + [f"z{g}"]))]
        total += sum(
            1
            for a, b in perms
            if min((a * h + b) % _MERSENNE for h in sa)
            == min((a * h + b) % _MERSENNE for h in sb)
        )
    mean = total / 100 / 32
    assert abs(mean - 19 / 21) < 0.04, mean  # true J = 19/21 ≈ 0.905
