"""Behavior tests for plans/filters.py — planted-input semantics for
the Gopher rule gate, char entropy, chunking, corpus CUBE, and DSIR
weights (the registered queries are pinned cross-engine by the DuckDB
oracle; these check the MATH on inputs with known answers)."""

from __future__ import annotations

import hashlib
import math

from real_time_event_streaming_pipeline_spark.catalog import load
from real_time_event_streaming_pipeline_spark.plans.filters import (
    _CHUNK_STRIDE,
    _CHUNK_WORDS,
    q_char_entropy,
    q_corpus_stats_cube,
    q_doc_chunking,
    q_dsir_weights,
    q_gopher_rules,
)


def _plant_docs(spark, tmp_path, rows):
    """Write planted documents as a sf_dir the queries can load."""
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_gopher_rules_planted(spark, tmp_path):
    normal = "the cat sat on that mat and then ran off to find food " * 2  # 28 words
    short = "too few words here"  # fails r_nwords
    longwords = " ".join(["abcdefghijklmno"] * 30)  # mwl 15 > 10
    symbolic = " ".join(["the", "of", "that"] + ["###"] * 27)  # 10%+ symbols
    sf = _plant_docs(
        spark,
        tmp_path,
        [(t.strip(), "en", "s0") for t in (normal, short, longwords, symbolic)],
    )
    out = {r.doc_id: r for r in q_gopher_rules(spark, sf).collect()}
    assert out[0].passes and out[0].r_nwords and out[0].r_stop
    assert not out[1].r_nwords and not out[1].passes
    assert not out[2].r_wordlen and not out[2].passes
    assert out[2].mean_wl_micro == 15_000_000
    assert not out[3].r_symbol and not out[3].passes
    assert out[3].symbol_ppm == 27 * 1_000_000 // 30


def test_char_entropy_known_values(spark, tmp_path):
    sf = _plant_docs(
        spark, tmp_path, [("aaaa", "en", "s0"), ("abab", "en", "s0")]
    )
    out = {r.doc_id: r for r in q_char_entropy(spark, sf).collect()}
    # single repeated char: ln(1) = 0 entropy
    assert (out[0].entropy_micronats, out[0].distinct_chars, out[0].n_chars) == (0, 1, 4)
    # two equiprobable chars: entropy = ln 2 -> round(ln .5 * 1e6) = -693147
    assert out[1].entropy_micronats == round(-math.log(0.5) * 1_000_000)
    assert out[1].distinct_chars == 2


def test_chunking_reconstructs_and_covers(spark, tmp_path, sf_small):
    # planted doc: 50 words -> starts 0, 24, 48 -> lengths 32, 26, 2
    words = [f"w{i:02d}" for i in range(50)]
    sf = _plant_docs(spark, tmp_path, [(" ".join(words), "en", "s0")])
    rows = sorted(q_doc_chunking(spark, sf).collect(), key=lambda r: r.chunk_id)
    assert [r.chunk_tokens for r in rows] == [_CHUNK_WORDS, 26, 2]
    for r in rows:
        expected = " ".join(words[r.start_word : r.start_word + _CHUNK_WORDS])
        assert r.chunk_md5 == hashlib.md5(expected.encode()).hexdigest()

    # real corpus: every doc fully covered, strides exact
    docs = {r.doc_id: r.n_words for r in q_doc_chunking(spark, sf_small).collect()}
    per_doc = {}
    for r in q_doc_chunking(spark, sf_small).collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = chunks[0].n_words
        assert len(chunks) == (n - 1) // _CHUNK_STRIDE + 1
        last = chunks[-1]
        assert last.start_word + last.chunk_tokens == n  # tail reaches the end
        for c in chunks:
            assert c.chunk_tokens == min(_CHUNK_WORDS, n - c.start_word)


def test_corpus_cube_totals_consistent(spark, sf_small):
    rows = q_corpus_stats_cube(spark, sf_small).collect()
    total = [r for r in rows if r.g_lang == 1 and r.g_source == 1]
    leaves = [r for r in rows if r.g_lang == 0 and r.g_source == 0]
    assert len(total) == 1
    n_docs = load(spark, sf_small, "documents").count()
    assert total[0].n_docs == n_docs
    assert sum(r.n_docs for r in leaves) == n_docs
    assert sum(r.total_tokens for r in leaves) == total[0].total_tokens


def test_dsir_upweights_target_like_docs(spark, tmp_path):
    # en docs share one vocabulary, de docs another; an en-vocab doc
    # must score strictly above a de-vocab doc
    en = [("alpha beta gamma alpha beta " * 4, "en", "s0") for _ in range(3)]
    de = [("zeta eta theta zeta eta " * 4, "de", "s0") for _ in range(3)]
    sf = _plant_docs(spark, tmp_path, en + de)
    out = {r.doc_id: r.dsir_micronats for r in q_dsir_weights(spark, sf).collect()}
    assert min(out[i] for i in (0, 1, 2)) > max(out[i] for i in (3, 4, 5))


def test_knn_classify_planted_clusters(spark, tmp_path):
    """Two tight, well-separated embedding clusters with one held-out
    query each (vec_id % 20 == 0): the vote must be unanimous and the
    prediction correct."""
    from real_time_event_streaming_pipeline_spark.plans.llmdata import q_knn_classify

    # cluster A around e1 (label 1): ids 0..10; cluster B around e3
    # (label 2): ids 12..22. Queries (vec_id % 20 == 0): 0 and 20 —
    # each cluster keeps 5 corpus members after the holdout.
    rows = []
    for j in range(12):
        vid = j * 2
        if j <= 5:
            vec, label = [1.0, 0.01 * j, 0.0, 0.0], 1
        else:
            vec, label = [0.0, 0.01 * j, 1.0, 0.0], 2
        rows.append((vid, vec, label))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.q_id: r for r in q_knn_classify(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 20}
    assert out[0].pred_label == 1 and out[0].correct
    assert out[20].pred_label == 2 and out[20].correct
    assert out[0].votes == 5 and out[20].votes == 5  # unanimous


def test_bigram_logprob_matches_local_model(spark, tmp_path):
    """Replicate the add-one-smoothed bigram LM in plain Python on a
    planted corpus and assert exact micro-nat equality; a repetitive
    doc must outscore a same-length all-distinct doc per bigram."""
    import math
    from collections import Counter

    from real_time_event_streaming_pipeline_spark.plans.filters import (
        q_bigram_logprob,
    )

    texts = ["x y x y x y", "p q r s t u", "x y p q x y"]
    sf = _plant_docs(spark, tmp_path, [(t, "en", "s0") for t in texts])

    docs_toks = [t.split() for t in texts]
    cb = Counter(b for toks in docs_toks for b in zip(toks, toks[1:]))
    cu = Counter()
    for (w1, _), c in cb.items():
        cu[w1] += c
    v = len({w for toks in docs_toks for w in toks})
    expect = {}
    for i, toks in enumerate(docs_toks):
        tf = Counter(zip(toks, toks[1:]))
        score = sum(
            c * round(math.log((cb[b] + 1) / (cu[b[0]] + v)) * 1_000_000)
            for b, c in tf.items()
        )
        expect[i] = (sum(tf.values()), score)

    out = {
        r.doc_id: (r.n_bigrams, r.logprob_micronats)
        for r in q_bigram_logprob(spark, sf).collect()
    }
    assert out == expect
    # per-bigram average: repetitive >> distinct
    assert out[0][1] / out[0][0] > out[1][1] / out[1][0]


def test_fuzzy_linkage_planted_and_no_cartesian(spark, tmp_path, sf_small):
    """Deletion-neighborhood blocking must find substitution AND
    insert/delete pairs at distance 1, skip distance-2 pairs, and
    never plan an all-pairs join."""
    from real_time_event_streaming_pipeline_spark.plans.filters import q_fuzzy_linkage

    names = [(0, "abc"), (1, "abcd"), (2, "axc"), (3, "xyz"), (4, "abc")]
    spark.createDataFrame(names, "c_custkey long, c_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in q_fuzzy_linkage(spark, str(tmp_path)).collect()
    }
    assert got == {
        (0, 1, 1),  # insert: abc -> abcd
        (0, 2, 1),  # substitution: abc -> axc
        (0, 4, 0),  # exact duplicate
        (1, 4, 1),
        (2, 4, 1),
    }

    plan = (
        q_fuzzy_linkage(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cep_pattern_planted(spark, tmp_path):
    """Pattern semantics on a planted sequence: a clean view->purchase
    within horizon matches (first purchase wins), an error between
    blocks the match, and an out-of-horizon purchase doesn't count."""
    from datetime import datetime, timedelta

    from real_time_event_streaming_pipeline_spark.plans.windowing import (
        q_cep_pattern,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + timedelta(minutes=minutes)

    rows = [
        # user 1: view -> purchase(+5m) matches; second purchase ignored
        (1, at(0), 1, "view"), (2, at(5), 1, "purchase"), (3, at(10), 1, "purchase"),
        # user 2: view -> error -> purchase: blocked
        (4, at(0), 2, "view"), (5, at(5), 2, "error"), (6, at(10), 2, "purchase"),
        # user 3: purchase 40m later: out of the 30m horizon
        (7, at(0), 3, "view"), (8, at(40), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {(r.user_id, r.v_id, r.p_id, r.gap_us) for r in q_cep_pattern(spark, str(tmp_path)).collect()}
    assert got == {(1, 1, 2, 5 * 60 * 1_000_000)}


def test_ts_similarity_planted_correlations(spark, tmp_path):
    """Planted hourly series: user 100 moves WITH query user 0
    (r=+1), user 200 moves AGAINST it (r=-1) — the ranking must put
    100 first and 200 last."""
    from datetime import datetime, timedelta

    from real_time_event_streaming_pipeline_spark.plans.windowing import (
        q_ts_similarity,
    )

    t0 = datetime(2024, 1, 1, 0, 30, 0)
    base = [10.0, 20.0, 30.0, 40.0]
    rows = []
    eid = 0
    for h, v in enumerate(base):
        for uid, val in ((0, v), (100, v * 2), (200, 50.0 - v)):
            rows.append((eid, t0 + timedelta(hours=h), uid, "view", val, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {(r.qu, r.other): (r.r, r.rk) for r in q_ts_similarity(spark, str(tmp_path)).collect()}
    assert out[(0, 100)] == (1.0, 1)
    assert out[(0, 200)][0] == -1.0
    assert out[(0, 200)][1] == 2


def test_knn_classify_ivf_variant_structure(spark, sf_small):
    """The IVF-backed knn variant (the 100x scale path) must produce
    one integer-vote prediction per held-out query through the same
    vote stage; prediction AGREEMENT with exact is data-dependent
    (this corpus's cosine margins sit at the random ceiling) and is
    deliberately not pinned."""
    from real_time_event_streaming_pipeline_spark.catalog import load
    from real_time_event_streaming_pipeline_spark.plans.llmdata import q_knn_classify

    n_queries = (
        load(spark, sf_small, "embeddings").filter("vec_id % 20 = 0").count()
    )
    out = q_knn_classify(spark, sf_small, method="ivf").collect()
    assert len(out) == n_queries
    assert all(1 <= r.votes <= 5 for r in out)
    assert all(r.correct == (r.pred_label == r.true_label) for r in out)


def test_char_entropy_empty_text_drops_like_oracle(spark, tmp_path):
    """An empty-text doc must vanish from the entropy output (as
    DuckDB's generate_series(1,0) drops it) — guards Spark's
    descending-sequence surprise on sequence(1, 0)."""
    sf = _plant_docs(spark, tmp_path, [("", "en", "s0"), ("ab", "en", "s0")])
    out = {r.doc_id for r in q_char_entropy(spark, sf).collect()}
    assert out == {1}


def test_exact_median_continuous_domain_guard(spark):
    """r10 verdict #5: _exact_median's driver-side histogram walk is
    bounded by the DISTINCT count — a continuous double column (one
    distinct value per row) must trip the guard and route to the
    distributed rank-selection fallback, which must agree with the
    histogram path AND with a by-hand median, on odd and even counts."""
    import statistics

    from real_time_event_streaming_pipeline_spark.plans.curation import (
        _exact_median,
        _exact_median_distributed,
    )
    from pyspark.sql import functions as F

    for n in (999, 1000):
        # high-cardinality continuous values, unsorted arrival order
        vals = [((i * 7919) % n) + ((i * 104729) % 1000) / 1000.0 for i in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        want = statistics.median(vals)
        # the guard: max_distinct below the cardinality forces the
        # distributed path; the result must match the python median
        got_guarded = _exact_median(df, "x", max_distinct=50)
        assert got_guarded == want, (n, got_guarded, want)
        # the distributed walk directly
        assert _exact_median_distributed(df, "x") == want
        # and the histogram path (bound not tripped) agrees
        assert _exact_median(df, "x") == want


def test_exact_median_guard_ignores_nulls(spark):
    import statistics

    from real_time_event_streaming_pipeline_spark.plans.curation import (
        _exact_median,
        _exact_median_distributed,
    )

    vals = [1.5, None, 2.5, 3.5, None, 4.5, 5.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = statistics.median([v for v in vals if v is not None])
    assert _exact_median(df, "x") == want
    assert _exact_median_distributed(df, "x") == want
