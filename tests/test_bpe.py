"""BPE tokenizer: the distributed trainer/encoder (operators/bpe.py)
against an INDEPENDENT pure-Python reference (Sennrich-style tuple
merging with Counters — a different code path from the fold-based
Catalyst expressions), plus pins for the two subtle semantics the
string representation must get right: mid-symbol false matches and
greedy non-overlapping runs.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from real_time_event_streaming_pipeline_spark.operators import bpe as B
from real_time_event_streaming_pipeline_spark.plans.tokenize import (
    NUM_MERGES,
    q_bpe_encode,
    q_bpe_train,
)

from conftest import SF_SMALL

# ---------------------------------------------------------------------------
# Independent reference implementation (tuple-based, no string reprs)
# ---------------------------------------------------------------------------


def _ref_word_types(texts):
    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return c


def _ref_stats(vocab):
    stats = Counter()
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += freq
    return stats


def _ref_merge(pair, syms):
    a, b = pair
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts, k):
    vocab = {tuple(list(w) + [B.EOW]): f for w, f in _ref_word_types(texts).items()}
    merges = []
    for rank in range(1, k + 1):
        stats = _ref_stats(vocab)
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, cnt))
        vocab = {_ref_merge((a, b), s): f for s, f in vocab.items()}
    return merges


def _ref_encode_doc(text, merges):
    toks = []
    for w in text.split(" "):
        syms = (list(w) if w else []) + [B.EOW]
        for _rank, a, b, _cnt in merges:
            syms = list(_ref_merge((a, b), syms))
        toks.extend(syms)
    return toks


# ---------------------------------------------------------------------------
# Trainer and encoder vs the reference on the real corpus
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_texts(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    return [r.text for r in docs.select("text").collect()]


def test_train_matches_reference(spark, small_texts):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = B.train(docs, NUM_MERGES)
    exp = _ref_train(small_texts, NUM_MERGES)
    assert got == exp
    # the learned table exercises multi-level merges (a merged symbol
    # merging again) — otherwise the depth-k replay is untested
    merged_lhs = [l for _r, l, _rh, _c in got if len(l.replace(B.EOW, "#")) > 1]
    assert merged_lhs, "no second-level merge in the learned table"


def test_train_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = B.train(docs.repartition(7), 5)
    b = B.train(docs.repartition(2), 5)
    assert a == b


def test_encode_matches_reference(spark, small_texts):
    enc = q_bpe_encode(spark, SF_SMALL).orderBy("doc_id").collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").orderBy("doc_id")
    merges = _ref_train(small_texts, NUM_MERGES)
    for row, doc in zip(enc, docs.collect()):
        assert row.doc_id == doc.doc_id
        toks = _ref_encode_doc(doc.text, merges)
        assert row.n_bpe_tokens == len(toks)
        head = " ".join(toks[:12]).replace(B.EOW, B.EOW_DISPLAY)
        assert row.head_tokens == head
        assert row.n_words == len([w for w in doc.text.split(" ") if w])


def test_train_query_display_form(spark):
    rows = q_bpe_train(spark, SF_SMALL).collect()
    assert len(rows) == NUM_MERGES
    assert [r.merge_rank for r in rows] == list(range(1, NUM_MERGES + 1))
    for r in rows:
        assert B.EOW not in r.lhs + r.rhs + r.merged  # display form only
        assert r.merged == r.lhs + r.rhs or r.merged == (r.lhs + r.rhs).replace(
            B.EOW, B.EOW_DISPLAY
        )
        assert r.pair_count > 0


# ---------------------------------------------------------------------------
# Semantics pins on the fold-based merge pass
# ---------------------------------------------------------------------------


def _apply(spark, syms, lhs, rhs):
    df = spark.createDataFrame([(syms,)], "syms: array<string>")
    rep = F.concat(F.array_join(F.col("syms"), B.SEP), F.lit(B.SEP))
    out = df.select(B.merge_pass(rep, F.lit(lhs), F.lit(rhs)).alias("r")).first().r
    return [s for s in out.split(B.SEP) if s]


def test_merge_pass_no_mid_symbol_false_match(spark):
    # a plain string replace of "a␟b␟" would corrupt ["xa","b"] into
    # ["xab"]; the fold must leave it alone because the SYMBOL is
    # "xa", not "a"
    assert _apply(spark, ["xa", "b"], "a", "b") == ["xa", "b"]
    # prefix variant: rhs "b" must not match inside symbol "bc"
    assert _apply(spark, ["a", "bc"], "a", "b") == ["a", "bc"]


def test_merge_pass_greedy_non_overlapping(spark):
    assert _apply(spark, ["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _apply(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]
    # merged symbol never immediately re-merges as lhs within a pass
    assert _apply(spark, ["ab", "b", "b"], "ab", "b") == ["abb", "b"]


def test_doc_encode_equals_per_word_encode(spark):
    # cross-word safety: folding the whole document symbol stream must
    # equal encoding each word separately (trained lhs never carries
    # the EOW marker)
    texts = ["ererer er", "row brow row", "e er ere", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    merges = B.train(docs, 6)
    enc = B.encode(docs, merges).orderBy("doc_id").collect()
    for row, text in zip(enc, texts):
        toks = _ref_encode_doc(text, merges)
        assert row.n_bpe_tokens == len(toks)
        assert row.head_tokens == " ".join(toks[:12]).replace(B.EOW, B.EOW_DISPLAY)


def test_empty_and_degenerate_words(spark):
    docs = spark.createDataFrame(
        [(0, "a"), (1, "aaaa"), (2, "a a a a")], "doc_id: long, text: string"
    )
    merges = B.train(docs, 3)
    exp = _ref_train(["a", "aaaa", "a a a a"], 3)
    assert merges == exp
    enc = {r.doc_id: r for r in B.encode(docs, merges).collect()}
    for i, t in [(0, "a"), (1, "aaaa"), (2, "a a a a")]:
        toks = _ref_encode_doc(t, merges)
        assert enc[i].n_bpe_tokens == len(toks)


# ---------------------------------------------------------------------------
# property test: trainer vs the tuple reference on hypothesis corpora
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORD = st.text(alphabet="abc", min_size=1, max_size=6)


@given(
    texts=st.lists(
        st.lists(_WORD, min_size=1, max_size=8).map(" ".join), min_size=1, max_size=12
    ),
    k=st.integers(1, 5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_train_and_encode_property(spark, texts, k):
    """Tiny 'abc' corpora maximize merge collisions and tie-breaks —
    the adversarial regime for the fold/argmax machinery."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    merges = B.train(docs, k)
    assert merges == _ref_train(texts, k)
    enc = {r.doc_id: r for r in B.encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        toks = _ref_encode_doc(t, merges)
        assert enc[i].n_bpe_tokens == len(toks)
        assert enc[i].head_tokens == " ".join(toks[:12]).replace(B.EOW, B.EOW_DISPLAY)


# ---------------------------------------------------------------------------
# plan-shape guards (scale properties SCALING.md documents)
# ---------------------------------------------------------------------------


def test_bpe_pair_counts_partial_aggregate(spark):
    """Each training round's pair count must map-side combine: two
    HashAggregates around a single Exchange, so the per-round shuffle
    carries (pair, partial-count) states, not raw pair rows."""
    docs = spark.createDataFrame(
        [(0, "er er row"), (1, "row er")], "doc_id: long, text: string"
    )
    pc = B.pair_counts(B.word_types(docs))
    plan = pc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2  # word groupBy + pair groupBy
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan


def test_bpe_argmax_is_bounded_collect(spark):
    """The per-round argmax must reach the driver as a 1-row
    TakeOrdered (per-partition heap + merge), never a global sort."""
    docs = spark.createDataFrame(
        [(0, "er er row"), (1, "row er")], "doc_id: long, text: string"
    )
    from pyspark.sql import functions as SF

    top = (
        B.pair_counts(B.word_types(docs))
        .orderBy(SF.col("cnt").desc(), SF.col("lhs").asc(), SF.col("rhs").asc())
        .limit(1)
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_wordmap_encode_equals_doc_fold(spark):
    """The scale-shaped encode (fold per distinct word + join) must
    equal folding the whole document stream — the semantics the DuckDB
    twin states. Includes double-space/empty-word and empty-doc
    edges."""
    texts = ["er er row brow", "row  row", "", "a", "brow er a a er row"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    merges = B.train(docs, 5)
    got = {r.doc_id: r for r in B.encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        doc_toks = [
            s
            for s in docs.filter(F.col("doc_id") == i)
            .select(B.encode_expr(F.col("text"), merges).alias("r"))
            .first()
            .r.split(B.SEP)
            if s
        ]
        assert got[i].n_bpe_tokens == len(doc_toks)
        assert got[i].head_tokens == " ".join(doc_toks[:12]).replace(
            B.EOW, B.EOW_DISPLAY
        )
