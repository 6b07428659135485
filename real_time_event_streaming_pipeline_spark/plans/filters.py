"""Heuristic quality filtering and corpus analytics (north-star
LLM-data extension, third wave): the rule-based gates and corpus
roll-ups a training-data pipeline runs alongside the statistical
signals in plans/curation.py — Gopher-style composite filter rules,
character-distribution entropy (garbled/random-text detector),
RAG-style overlapping chunking, a lang×source corpus CUBE, and
DSIR-style importance weights for domain-targeted data selection.

All operators follow the package's cross-engine determinism
discipline (see plans/curation.py module docstring): ratios that feed
booleans or outputs are integer-scaled (micro units, one int/int
division), transcendentals are taken once per distinct key on an
IEEE-exact double ratio and immediately rounded to integer micro-nats
(the pattern driver-validated by llm_unigram_logprob), and sampling /
bucketing uses the deterministic multiplicative hash. Shuffle
profile: every operator here is one token/char explode into one or
two hash aggregations — the same class as llm_token_freq /
llm_unigram_logprob, which scale by adding partitions; no windows
over unbounded partitions, no driver collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

# ---------------------------------------------------------------------------
# Gopher-style composite quality rules
# ---------------------------------------------------------------------------

# Bounds adapted to the driver corpus (10-99 words/doc, synthetic
# prose); the canonical Gopher bounds (50..100k words) would pass or
# fail everything at once and test nothing. Rule STRUCTURE is the
# reference point (Rae et al. 2021, "Scaling Language Models" §A1.1),
# constants are corpus-tuned and centralised here.
_GOPHER_MIN_WORDS = 20
_GOPHER_MAX_WORDS = 80
_GOPHER_MIN_MWL_MICRO = 3_000_000  # mean word length in micro-chars
_GOPHER_MAX_MWL_MICRO = 10_000_000
_GOPHER_MIN_ALPHA_PPM = 800_000  # >= 80% of words contain a letter
_GOPHER_MAX_SYMBOL_PPM = 100_000  # <= 10% of words are symbol-ish (#, ...)
_GOPHER_MIN_STOPWORDS = 2  # distinct stopwords present
_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "that")


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gate: per document, the five classic
    repetition-independent quality rules (word-count bounds, mean word
    length bounds, alpha-word fraction, symbol-word fraction, stopword
    presence) and the composite pass flag.

    Everything a boolean depends on is integer: mean word length and
    the two fractions are computed in micro/ppm units with one
    BIGINT div, so no engine's float rounding can flip a rule at the
    boundary. One explode → one hash agg keyed by doc_id (map-side
    combine applies: the per-token projections collapse into partial
    counts before the shuffle), then a projection."""
    return gopher_rules_df(load(spark, sf_dir, "documents"))


def gopher_rules_df(docs: DataFrame) -> DataFrame:
    """DataFrame-level core of q_gopher_rules — also the per-batch
    gate of streaming/corpus_ingest.py."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("term")).alias("sum_len"),
        F.count_if(F.col("term").rlike("[A-Za-z]")).alias("n_alpha"),
        F.count_if(F.col("term").rlike("#|\\.\\.\\.")).alias("n_symbol"),
        F.count_distinct(
            F.when(F.col("term").isin(*_STOPWORDS), F.col("term"))
        ).alias("n_stop"),
    )
    # BIGINT `div` (not float `/` + floor): sum_len*1e6 can exceed the
    # 2^53 double-exact range on long documents, and a float quotient
    # landing one ULP under an integer would flip a boundary rule
    mwl = F.expr("sum_len * CAST(1000000 AS BIGINT) div n_words")
    alpha_ppm = F.expr("n_alpha * CAST(1000000 AS BIGINT) div n_words")
    symbol_ppm = F.expr("n_symbol * CAST(1000000 AS BIGINT) div n_words")
    out = per_doc.select(
        "doc_id",
        "n_words",
        mwl.alias("mean_wl_micro"),
        alpha_ppm.alias("alpha_ppm"),
        symbol_ppm.alias("symbol_ppm"),
        F.col("n_stop").cast("long").alias("n_stop"),
        F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS).alias("r_nwords"),
        mwl.between(_GOPHER_MIN_MWL_MICRO, _GOPHER_MAX_MWL_MICRO).alias("r_wordlen"),
        (alpha_ppm >= _GOPHER_MIN_ALPHA_PPM).alias("r_alpha"),
        (symbol_ppm <= _GOPHER_MAX_SYMBOL_PPM).alias("r_symbol"),
        (F.col("n_stop") >= _GOPHER_MIN_STOPWORDS).alias("r_stop"),
    )
    return out.withColumn(
        "passes",
        F.col("r_nwords")
        & F.col("r_wordlen")
        & F.col("r_alpha")
        & F.col("r_symbol")
        & F.col("r_stop"),
    )


_GOPHER_RULES_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
agg AS (
  SELECT doc_id,
    count(*) AS n_words,
    sum(len(term)) AS sum_len,
    count(*) FILTER (WHERE regexp_matches(term, '[A-Za-z]')) AS n_alpha,
    count(*) FILTER (WHERE regexp_matches(term, '#|\\.\\.\\.')) AS n_symbol,
    CAST(count(DISTINCT CASE WHEN term IN {_STOPWORDS!r} THEN term END) AS BIGINT)
      AS n_stop
  FROM tok GROUP BY doc_id
),
scaled AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
    CAST(sum_len * 1000000 // n_words AS BIGINT) AS mean_wl_micro,
    CAST(n_alpha * 1000000 // n_words AS BIGINT) AS alpha_ppm,
    CAST(n_symbol * 1000000 // n_words AS BIGINT) AS symbol_ppm,
    n_stop
  FROM agg
)
SELECT *,
  (r_nwords AND r_wordlen AND r_alpha AND r_symbol AND r_stop) AS passes
FROM (
  SELECT doc_id, n_words, mean_wl_micro, alpha_ppm, symbol_ppm, n_stop,
    n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS} AS r_nwords,
    mean_wl_micro BETWEEN {_GOPHER_MIN_MWL_MICRO} AND {_GOPHER_MAX_MWL_MICRO}
      AS r_wordlen,
    alpha_ppm >= {_GOPHER_MIN_ALPHA_PPM} AS r_alpha,
    symbol_ppm <= {_GOPHER_MAX_SYMBOL_PPM} AS r_symbol,
    n_stop >= {_GOPHER_MIN_STOPWORDS} AS r_stop
  FROM scaled
)
"""


# ---------------------------------------------------------------------------
# Character-distribution entropy (garbled/random-text detector)
# ---------------------------------------------------------------------------


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the per-document character distribution in
    micro-nats — near-zero entropy flags repeated-char junk, maximal
    entropy flags random bytes; natural text sits in a narrow band.

    Char extraction is position-explode + substr (an empty-pattern
    split differs between engines on trailing empties, so it is
    avoided). ln is taken once per distinct (doc, char) on the exact
    double ratio c/n and rounded to micro-nats immediately
    (llm_unigram_logprob discipline); the final per-doc division is
    BIGINT, with both operands non-negative so truncating and flooring
    division agree across engines.

    Shuffle profile: one char explode → hash agg on (doc_id, ch) →
    hash agg on doc_id; n_chars rides along from length(text), so no
    join back to the scan. Per-key state is O(alphabet) per doc.

    r13 opt NOT taken (measured, guide §1.1's "fresh ideal
    implementation is usually slower" case): a shuffle-free rewrite
    computing the histogram with nested higher-order array functions
    (0 Exchanges on paper) ran 2.3 s → 49 s at sf0.1 — HOF lambdas
    evaluate INTERPRETED, outside whole-stage codegen, and the inner
    per-distinct-char filter rebuilt the O(n_chars) char array per
    distinct char (O(n·k) allocations per row). The explode shape
    keeps every operator in codegen and its two exchanges carry only
    (doc_id, n, ch) — reverted to it and pinned the lesson here."""
    docs = load(spark, sf_dir, "documents")
    # guard: F.sequence(1, 0) generates DESCENDING [1, 0], not an
    # empty array — an empty-text doc must vanish from the explode
    # exactly as it does under DuckDB's generate_series(1, 0)
    idx = F.when(
        F.length("text") >= 1, F.sequence(F.lit(1), F.length("text"))
    ).otherwise(F.array().cast("array<int>"))
    chars = (
        docs.select("doc_id", "text", F.length("text").alias("n"))
        .select("doc_id", "n", F.explode(idx).alias("i"), F.col("text"))
        .select("doc_id", "n", F.expr("substr(text, i, 1)").alias("ch"))
    )
    counts = chars.groupBy("doc_id", "n", "ch").agg(F.count(F.lit(1)).alias("c"))
    mn = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")) * F.lit(1_000_000.0)
    ).cast("long")
    return (
        counts.select("doc_id", "n", (F.col("c") * mn).alias("cmn"))
        .groupBy("doc_id", "n")
        .agg(
            (-F.sum("cmn")).alias("neg_sum_micronats"),
            F.count(F.lit(1)).alias("distinct_chars"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_chars"),
            "distinct_chars",
            F.expr("neg_sum_micronats div n").alias("entropy_micronats"),
        )
    )


_CHAR_ENTROPY_SQL = """
WITH pos AS (
  SELECT doc_id, len(text) AS n, text,
    unnest(generate_series(1, len(text))) AS i
  FROM documents
),
chars AS (SELECT doc_id, n, substr(text, CAST(i AS INT), 1) AS ch FROM pos),
counts AS (SELECT doc_id, n, ch, count(*) AS c FROM chars GROUP BY doc_id, n, ch),
scored AS (
  SELECT doc_id, n,
    c * CAST(round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
      AS cmn
  FROM counts
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
  CAST(count(*) AS BIGINT) AS distinct_chars,
  CAST((-sum(cmn)) // n AS BIGINT) AS entropy_micronats
FROM scored
GROUP BY doc_id, n
"""


# ---------------------------------------------------------------------------
# RAG-style overlapping chunking
# ---------------------------------------------------------------------------

_CHUNK_WORDS = 32
_CHUNK_STRIDE = 24


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping word-window chunks
    (W=32, stride=24 — the retrieval/embedding chunker): one row per
    (doc, chunk) with the token span and an md5 of the chunk text, so
    the driver hash pins membership, ordering, and reconstruction
    without shipping the payload.

    Chunk starts are 0, S, 2S, ... while start < n_words, i.e.
    k ∈ [0, (n-1) div S] — all integer, no boundary ambiguity. The
    explode emits ~n/S rows per doc with no shuffle at all (chunking
    is a per-row map; the one Exchange in this plan is whatever the
    sink needs). At 100 TB this is the ideal shape: narrow
    projection, linear output, embarrassingly parallel."""
    return doc_chunks_df(load(spark, sf_dir, "documents"))


def doc_chunks_df(docs: DataFrame) -> DataFrame:
    """DataFrame-level core of q_doc_chunking — stateless map, so it
    runs unchanged on a streaming DataFrame or inside foreachBatch."""
    toks = F.split("text", " ")
    with_k = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n_words"),
        F.explode(
            F.sequence(
                F.lit(0), F.floor((F.size(toks) - 1) / F.lit(_CHUNK_STRIDE)).cast("int")
            )
        ).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_WORDS
    )
    return with_k.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("n_words").cast("long").alias("n_words"),
        (F.col("chunk_id").cast("long") * _CHUNK_STRIDE).alias("start_word"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


_DOC_CHUNKING_SQL = f"""
WITH sized AS (
  SELECT doc_id, str_split(text, ' ') AS toks, len(str_split(text, ' ')) AS n_words
  FROM documents
),
ks AS (
  SELECT doc_id, toks, n_words,
    unnest(generate_series(0, (n_words - 1) // {_CHUNK_STRIDE})) AS chunk_id
  FROM sized
)
SELECT doc_id,
  CAST(chunk_id AS BIGINT) AS chunk_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(chunk_id * {_CHUNK_STRIDE} AS BIGINT) AS start_word,
  CAST(len(toks[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_WORDS}])
       AS BIGINT) AS chunk_tokens,
  md5(array_to_string(
    toks[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_WORDS}],
    ' ')) AS chunk_md5
FROM ks
"""


# ---------------------------------------------------------------------------
# Corpus roll-up CUBE
# ---------------------------------------------------------------------------


def q_corpus_stats_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition CUBE over (lang, source): doc count, char
    mass, token mass at every granularity — the dataset-card /
    mixture-design summary. GROUPING() flags disambiguate rollup rows
    from genuine NULL dimension values.

    CUBE is a single pass: Spark expands the grouping sets and
    aggregates once with map-side partials (Expand → HashAggregate);
    the token count derives from n_chars-free arithmetic on the
    split-size projection, so the scan reads only three columns."""
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return (
        sized.cube("lang", "source")
        .agg(
            F.grouping("lang").cast("long").alias("g_lang"),
            F.grouping("source").cast("long").alias("g_source"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "lang", "source", "g_lang", "g_source",
            "n_docs", "total_chars", "total_tokens",
        )
    )


_CORPUS_STATS_CUBE_SQL = """
SELECT lang, source,
  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
  CAST(GROUPING(source) AS BIGINT) AS g_source,
  count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY CUBE (lang, source)
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights
# ---------------------------------------------------------------------------

_DSIR_TARGET_LANG = "en"


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023)
    reduced to its unigram core: per document, the importance weight
    ln p_target(doc) − ln p_raw(doc) under add-one-smoothed unigram
    LMs, target = the `en` slice, raw = everything else. High-weight
    docs look target-like and get upsampled when composing a
    domain-targeted mixture.

    Integer discipline: ln is taken per distinct term on each side's
    exact smoothed ratio and rounded to micro-nats; the per-doc score
    is a BIGINT dot product (tf × Δmicronats summed) — bitwise
    identical on any engine and partitioning.

    Shuffle profile identical to llm_unigram_logprob: one explode →
    (doc, term) tf agg (checkpointed diamond), a vocab-sized term-stat
    leg (one groupBy over tf), scalar totals broadcast, one join back
    on term — AQE handles the head-term skew by splitting the join."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        (F.col("lang") == _DSIR_TARGET_LANG).alias("is_t"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "is_t", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)
    stats = tf.groupBy("term").agg(
        F.sum(F.when(F.col("is_t"), F.col("tf")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_t"), F.col("tf")).otherwise(0)).alias("cr"),
    )
    totals = stats.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
        F.count(F.lit(1)).alias("v"),
    )
    mn = lambda c, t: F.round(  # noqa: E731 — local twin of the SQL expr
        F.log((c + F.lit(1)).cast("double") / (t + F.col("v")).cast("double"))
        * F.lit(1_000_000.0)
    ).cast("long")
    scored = (
        tf.join(stats, "term")
        .join(F.broadcast(totals))
        .select(
            "doc_id",
            "tf",
            (F.col("tf") * (mn(F.col("ct"), F.col("tt")) - mn(F.col("cr"), F.col("tr")))).alias(
                "wmn"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum("wmn").alias("dsir_micronats"),
    )


_DSIR_WEIGHTS_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang = '{_DSIR_TARGET_LANG}' AS is_t,
    unnest(str_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, is_t, term, count(*) AS tf FROM tok GROUP BY doc_id, is_t, term
),
stats AS (
  SELECT term,
    CAST(sum(CASE WHEN is_t THEN tf ELSE 0 END) AS BIGINT) AS ct,
    CAST(sum(CASE WHEN NOT is_t THEN tf ELSE 0 END) AS BIGINT) AS cr
  FROM tf GROUP BY term
),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr,
    CAST(count(*) AS BIGINT) AS v
  FROM stats
),
scored AS (
  SELECT doc_id, tf,
    tf * (CAST(round(ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + v AS DOUBLE)) * 1000000)
               AS BIGINT)
        - CAST(round(ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + v AS DOUBLE)) * 1000000)
               AS BIGINT)) AS wmn
  FROM tf JOIN stats USING (term) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
  CAST(sum(wmn) AS BIGINT) AS dsir_micronats
FROM scored
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Bigram LM scoring
# ---------------------------------------------------------------------------


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram language-model score per document — the
    next-order fluency proxy above llm_unigram_logprob: sum over
    bigram occurrences of ln P(w2 | w1), with add-one smoothing
    P(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V) so unseen continuations stay
    finite. Repetitive/templated text scores high, shuffled text low —
    the classic perplexity gate reduced to its countable core.

    Same micro-nat integer discipline as the unigram scorer: ln is
    taken once per distinct bigram TYPE on the exact smoothed ratio,
    rounded to BIGINT micro-nats, and per-doc scores are integer dot
    products — bitwise stable on any engine and partitioning.

    Shuffle profile: one bigram explode → (doc, w1, w2) tf agg
    (checkpointed diamond), a bigram-type stats leg (groupBy (w1,w2)
    then w1), scalar V broadcast, two equi-joins back (bigram type,
    then prefix) — both AQE-skew-splittable. The bigram-type table is
    the biggest intermediate; it grows sublinearly in corpus size
    (vocab² ceiling), not with the 100 TB payload."""
    docs = load(spark, sf_dir, "documents")
    # split ONCE into a named column: referencing the raw split()
    # expression from inside the transform lambda re-evaluates it (no
    # codegen CSE across the lambda boundary) — staging the array
    # measured 2x on the whole query
    toked = docs.select("doc_id", F.split("text", " ").alias("toks"))
    toks = F.col("toks")
    # guard: F.sequence(1, 0) would generate DESCENDING [1, 0] — an
    # empty array, not a reversed one, is the right "no bigrams" value
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bg = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(toks, i).alias("w1"),
                    F.element_at(toks, i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.localCheckpoint(eager=False)
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    cu = cb.groupBy("w1").agg(F.sum("cb").alias("cu"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .agg(F.count_distinct("term").alias("v"))
    )
    mn = F.round(
        F.log(
            (F.col("cb") + F.lit(1)).cast("double")
            / (F.col("cu") + F.col("v")).cast("double")
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    return (
        tf.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .join(F.broadcast(vocab))
        .select("doc_id", "tf", (F.col("tf") * mn).alias("mn"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum("mn").alias("logprob_micronats"),
        )
    )


_BIGRAM_LOGPROB_SQL = """
WITH tok AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM tok)
),
tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY doc_id, w1, w2),
cb AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cb FROM tf GROUP BY w1, w2),
cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY w1),
voc AS (
  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
  FROM (SELECT unnest(str_split(text, ' ')) AS term FROM documents)
),
scored AS (
  SELECT doc_id, tf,
    tf * CAST(round(ln(CAST(cb + 1 AS DOUBLE) / CAST(cu + v AS DOUBLE)) * 1000000)
              AS BIGINT) AS mn
  FROM tf JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN voc
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
  CAST(sum(mn) AS BIGINT) AS logprob_micronats
FROM scored
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Fuzzy entity linkage (SymSpell-style deletion-neighborhood blocking)
# ---------------------------------------------------------------------------


def q_fuzzy_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution at edit distance ≤ 1 over customer names —
    the record-linkage / fuzzy-dedup primitive, built the way it
    scales: each name emits its SymSpell deletion neighborhood (the
    name itself + every single-char deletion, O(L) variants), distance
    ≤1 pairs MUST share a variant (substitution pairs share a
    same-position deletion; insert/delete pairs share the shorter
    string itself), so candidate generation is an equi-join on the
    variant string — never an all-pairs product — followed by an exact
    levenshtein verify of the (distinct) candidates.

    Scale posture: n·L variant rows, one equi-join whose bucket sizes
    are bounded by the alphabet per position (not by n); the verify is
    a per-row expression. The brute-force O(n²) twin lives only in the
    DuckDB oracle, where it is the ground truth this blocking provably
    reproduces at k=1."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    # guard: F.sequence(1, 0) on a zero-length name would yield the
    # DESCENDING [1, 0] — same trap guarded at the q_char_entropy and
    # q_bigram_logprob call sites above; empty neighborhood is correct
    deletions = F.when(
        F.length("name") >= 1,
        F.transform(
            F.sequence(F.lit(1), F.length("name")),
            lambda i: F.concat(
                F.col("name").substr(F.lit(1), i - 1),
                F.col("name").substr(i + 1, F.length("name") - i),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    variants = cust.select(
        "id",
        "name",
        F.explode(F.array_union(F.array(F.col("name")), deletions)).alias("variant"),
    )
    # lazy checkpoint: the self-join would otherwise evaluate the
    # deletion explode once per side (the bigram tf diamond pattern)
    variants = variants.localCheckpoint(eager=False)
    b = variants.select(
        F.col("id").alias("b_id"),
        F.col("name").alias("b_name"),
        F.col("variant").alias("variant"),
    )
    cand = (
        variants.select(
            F.col("id").alias("a_id"), F.col("name").alias("a_name"), "variant"
        )
        .join(b, "variant")
        .filter(F.col("a_id") < F.col("b_id"))
        # (a_id, b_id) determines the name pair — dedup on the ids only
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", "a_name", "b_name")
    )
    # r13 opt: levenshtein computed once per candidate (named column
    # referenced by filter and projection) instead of once in the
    # filter and again in the projection for survivors
    return (
        cand.withColumn("_d", F.levenshtein("a_name", "b_name"))
        .filter(F.col("_d") <= 1)
        .select(
            "a_id",
            "b_id",
            "a_name",
            "b_name",
            F.col("_d").cast("long").alias("dist"),
        )
    )


_FUZZY_LINKAGE_SQL = """
SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
  a.c_name AS a_name, b.c_name AS b_name,
  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


# ---------------------------------------------------------------------------
# Multi-epoch ingestion audit
# ---------------------------------------------------------------------------


def q_corpus_ingest_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch audit of the multi-epoch streaming ingest: documents
    arrive as three id-ordered files (one micro-batch each), flow
    through the gate+chunk pipeline (streaming/corpus_ingest.py) with
    epoch tagging on, and this query reports per epoch how many
    documents survived the gate and how many chunks they produced.

    The REAL streaming machinery runs inside this query (availableNow
    drain into a scratch chunk store) — it is the driver-checkable
    face of the multi-epoch ingest path: file tiles are cut as
    closed-form contiguous id ranges (doc_id * n // (max+1) — no
    unpartitioned ntile window) and arrive in mtime order, so the oracle
    reconstructs epoch membership as pure SQL and every per-epoch
    count is value-checked, not just the union. The epoch column is
    the chunk store's partition-discovered lineage (each micro-batch
    writes its own epoch=N subtree)."""
    import shutil
    import tempfile

    from ..streaming.corpus_ingest import stage_epoch_files, start_corpus_ingest

    base = tempfile.mkdtemp(prefix="ingest_epochs_")
    try:
        src = stage_epoch_files(
            spark, sf_dir, os.path.join(base, "arriving"), n_files=3
        )
        out = os.path.join(base, "chunks")
        ckpt = os.path.join(base, "ckpt")
        q = start_corpus_ingest(spark, sf_dir, out, ckpt, source_dir=src)
        # awaitTermination returns False on timeout WITHOUT raising —
        # falling through would read a still-writing store and return
        # silently partial counts; fail loudly instead
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError("corpus ingest drain did not finish within 300s")
        rows = (
            spark.read.parquet(out)
            .groupBy(F.col("epoch").cast("long").alias("epoch"))
            .agg(
                F.count_distinct("doc_id").alias("n_docs"),
                F.count(F.lit(1)).alias("n_chunks"),
            )
            .collect()
        )
    finally:
        # the result (3 rows) is materialized above precisely so the
        # scratch chunk store can be deleted here — returning a lazy
        # DataFrame over `out` would leak one store per invocation
        # (bench runs this query twice per sweep)
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "epoch long, n_docs long, n_chunks long")


_CORPUS_INGEST_EPOCHS_SQL = f"""
WITH ep AS (
  SELECT doc_id,
    CAST(doc_id * 3 // ((SELECT max(doc_id) + 1 FROM documents)) AS BIGINT) AS epoch
  FROM documents
),
passing AS (SELECT doc_id FROM ({_GOPHER_RULES_SQL}) WHERE passes),
chunks AS (SELECT doc_id FROM ({_DOC_CHUNKING_SQL}) JOIN passing USING (doc_id))
SELECT epoch, count(DISTINCT doc_id) AS n_docs, CAST(count(*) AS BIGINT) AS n_chunks
FROM chunks JOIN ep USING (doc_id)
GROUP BY epoch
"""


QUERIES = {
    "llm_gopher_rules": q_gopher_rules,
    "llm_char_entropy": q_char_entropy,
    "llm_doc_chunking": q_doc_chunking,
    "llm_corpus_stats_cube": q_corpus_stats_cube,
    "llm_dsir_weights": q_dsir_weights,
    "llm_bigram_logprob": q_bigram_logprob,
    "llm_fuzzy_linkage": q_fuzzy_linkage,
    "llm_corpus_ingest_epochs": q_corpus_ingest_epochs,
}

ORACLE = {
    "llm_gopher_rules": _GOPHER_RULES_SQL,
    "llm_char_entropy": _CHAR_ENTROPY_SQL,
    "llm_doc_chunking": _DOC_CHUNKING_SQL,
    "llm_corpus_stats_cube": _CORPUS_STATS_CUBE_SQL,
    "llm_dsir_weights": _DSIR_WEIGHTS_SQL,
    "llm_bigram_logprob": _BIGRAM_LOGPROB_SQL,
    "llm_fuzzy_linkage": _FUZZY_LINKAGE_SQL,
    "llm_corpus_ingest_epochs": _CORPUS_INGEST_EPOCHS_SQL,
}
