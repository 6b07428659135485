"""LLM-data-pipeline queries (north-star extension, BASELINE.json):
dedup, similarity search, text analysis, multimodal columns — exposed
through the driver contract with DuckDB oracles wherever the
semantics are SQL-expressible.

The ANN faces (llm_emb_ann_lsh, llm_emb_ann_ivf, llm_emb_ann_pq) are
BITWISE oracle-checked since r7: the seeded hyperplanes / trained
centroids are deterministic md5-derived constructions the oracle SQL
inlines as literals, and the r11 corpus-scaled scheme switches were
verified on BOTH routes (fixed small-corpus scheme and the scaled
one) — see resolved_lsh_planes / resolved_ivf_scheme below and
tests/test_llmdata.py for the exact-ground-truth pins.

The MinHash/SimHash family is fully oracle-checked: signatures use the
md5-derived 60-bit hash (`operators/dedup._h60`), which DuckDB
reproduces digit-for-digit, so the oracle rebuilds the identical
signatures, band keys, capped buckets, and candidate pairs in ANSI
SQL (`_minhash_lsh_sql` / `_simhash_pairs_sql`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, table_rows_metadata
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as T

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        T.n_tokens(t).alias("n_tokens"),
        T.n_distinct_tokens(t).alias("n_distinct_tokens"),
        T.avg_token_len(t).alias("avg_token_len"),
        T.bpe_ish_token_count(t).alias("bpe_tokens"),
    )


_TEXT_STATS_SQL = """
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
  list_sum(list_transform(string_split(text, ' '), t -> length(t)))::DOUBLE
        / len(string_split(text, ' ')) AS avg_token_len,
  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.predicted_lang(t).alias("pred_lang"),
        T.stopword_count(t, "en").alias("en_stopwords"),
    )


_LANG_ID_SQL = """
WITH c AS (
  SELECT doc_id, lang,
    len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das'))) AS c_de,
    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and'))) AS c_en,
    len(list_filter(string_split(text,' '), t -> t IN ('el','la','y','los'))) AS c_es,
    len(list_filter(string_split(text,' '), t -> t IN ('le','la','et','les'))) AS c_fr
  FROM documents
)
SELECT doc_id, lang AS labeled_lang,
  CASE WHEN greatest(c_de,c_en,c_es,c_fr) = 0 THEN 'und'
       WHEN c_de = greatest(c_de,c_en,c_es,c_fr) THEN 'de'
       WHEN c_en = greatest(c_de,c_en,c_es,c_fr) THEN 'en'
       WHEN c_es = greatest(c_de,c_en,c_es,c_fr) THEN 'es'
       ELSE 'fr' END AS pred_lang,
  c_en AS en_stopwords
FROM c
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


_FINGERPRINT_SQL = """
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


_QUALITY_SQL = """
WITH f AS (
  SELECT doc_id,
    len(string_split(text,' '))::DOUBLE AS n,
    len(list_distinct(string_split(text,' ')))::DOUBLE AS nd,
    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and')))::DOUBLE AS stop
  FROM documents
)
SELECT doc_id,
  0.4 * least(n / 64.0, 1.0) + 0.4 * (nd / n) + 0.2 * least((stop / n) * 4.0, 1.0) AS quality
FROM f
"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load(spark, sf_dir, "documents")).select(
        "doc_id", "n_copies", F.md5("text").alias("content_md5")
    )


_DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS content_md5
FROM documents GROUP BY text
"""


def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retired from the registry in r7 (capacity consolidation): the
    row was the same group-by-content semantics as llm_dedup_exact
    with the columns reordered — the hash-groupBy operator itself
    (exact_dedup_by_hash, the 100 TB path where the group key is 16
    bytes instead of the payload) stays pinned by
    tests/test_llmdata.py equivalence against exact_dedup."""
    return D.exact_dedup_by_hash(load(spark, sf_dir, "documents"))


_DEDUP_EXACT_HASH_SQL = """
SELECT md5(text) AS content_md5, min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# Route resolutions memoized per sf_dir for the life of the process
# (r10 ADVICE #3): the query plan and its oracle callable are built at
# different times during a verify run, so resolving the corpus-size
# route independently in each could pick DIFFERENT routes if the
# corpus is rewritten in between — a spurious verify mismatch with
# both routes individually correct. One resolution per (process,
# sf_dir) makes query and oracle structurally route-consistent; a
# harness that legitimately rewrites a corpus in place must call
# clear_ngram_route_cache() between generations (tests use unique tmp
# dirs, so in practice the cache is write-once).
_NGRAM_ROUTE_CACHE: dict[str, str] = {}


def _route_key(sf_dir: str) -> str:
    """Canonical memo key for the route caches (r11 ADVICE #4): two
    spellings of the same directory (trailing slash, relative vs
    absolute, symlink) must resolve to ONE cache entry, or the
    query/oracle route-divergence hazard the memo closes reappears
    between differently-spelled callers."""
    return os.path.realpath(sf_dir)


def resolved_ngram_route(sf_dir: str) -> str:
    """'lsh' at/above _NGRAM_LSH_SWITCH docs else 'exact' — resolved
    from parquet footers once per sf_dir and memoized (see above)."""
    key = _route_key(sf_dir)
    route = _NGRAM_ROUTE_CACHE.get(key)
    if route is None:
        route = (
            "lsh"
            if table_rows_metadata(sf_dir, "documents") >= _NGRAM_LSH_SWITCH
            else "exact"
        )
        _NGRAM_ROUTE_CACHE[key] = route
    return route


def clear_ngram_route_cache() -> None:
    """Escape hatch for harnesses that rewrite a corpus under an
    sf_dir already routed this process."""
    _NGRAM_ROUTE_CACHE.clear()


# r12 (r11 verdict #1): whether the LSH/simhash bucket builders run
# the map-side bucket-sizing pass (_capped_bucket_lists presize=True)
# or the legacy collect-then-filter shape. The sizing pass exists to
# bound aggregation buffers BEFORE materialization — load-bearing
# only when a bucket could outgrow one reducer's memory, which a
# corpus of n docs bounds at n structs; below the same ~20k-doc bound
# the ngram route already uses, the worst bucket is trivially small
# and the pass is two pure-overhead exchanges (~0.4-0.8 s/face at
# sf0.1 — the r11 bench regression). Results and saturation counters
# are identical on both routes (parity pinned); memoized per
# (process, corpus) like the other route caches so query and oracle
# resolve together.
_BUCKET_PRESIZE_CACHE: dict[str, bool] = {}


def resolved_bucket_presize(sf_dir: str) -> bool:
    """True (pre-size buckets map-side) at/above _NGRAM_LSH_SWITCH
    documents, else False — parquet-footer resolved, memoized."""
    key = _route_key(sf_dir)
    got = _BUCKET_PRESIZE_CACHE.get(key)
    if got is None:
        got = table_rows_metadata(sf_dir, "documents") >= _NGRAM_LSH_SWITCH
        _BUCKET_PRESIZE_CACHE[key] = got
    return got


def clear_bucket_presize_cache() -> None:
    """Escape hatch mirroring clear_ngram_route_cache."""
    _BUCKET_PRESIZE_CACHE.clear()


def q_ngram_jaccard(
    spark: SparkSession,
    sf_dir: str,
    pair_method: str | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs, route-switched by corpus size
    exactly like q_dedup_clusters (r9 verdict #5 — this was the one
    registered superlinear face left): below _NGRAM_LSH_SWITCH docs
    the exact one-shuffle kept-shingle join; at/above it MinHash-LSH
    candidates + exact verification (ngram_jaccard_pairs_lsh), whose
    verified (n_common, jaccard) values are bit-identical per pair and
    whose recall loss is the banding-miss bound (negligible at the
    0.5 threshold's planted margins; route parity pinned in
    tests/test_operators.py). The oracle callable switches with the
    query via the SAME memoized resolution (resolved_ngram_route, r10
    ADVICE #3), so the face stays bitwise at every sf including soak
    corpora."""
    if pair_method is None:
        pair_method = resolved_ngram_route(sf_dir)
    gen = D.ngram_jaccard_pairs if pair_method == "exact" else D.ngram_jaccard_pairs_lsh
    return gen(
        load(spark, sf_dir, "documents"),
        k=3,
        threshold=0.5,
        max_doc_freq=100,
    )


def _ngram_jaccard_sql(src: str = "documents") -> str:
    """The exact n-gram Jaccard pair SQL over any (doc_id, text)
    relation ``src`` — parameterized so the corpus-build macro oracle
    can run the same pair logic over a staged survivor CTE."""
    return _NGRAM_JACCARD_SQL.replace("FROM documents", f"FROM {src}")


_NGRAM_JACCARD_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
    unnest(list_distinct(
      CASE WHEN len(toks) < 3 THEN []
           ELSE [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]
      END)) AS shingle
  FROM tok
),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT a_id, b_id, n_common,
  round(n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE, 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE >= 0.5
"""


def _ngram_jaccard_lsh_sql() -> str:
    """The LSH-route twin of _NGRAM_JACCARD_SQL: the shared mcand CTE
    chain (identical 60-bit hashes, permutations, band keys, bucket
    gates as the Spark operator) generates candidates, then the exact
    df-capped Jaccard verifies them — the same (n_common, jaccard)
    values per surviving pair as the exact SQL."""
    return f"""
WITH {_minhash_cte_sql()},
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS n_common
  FROM mcand c
  JOIN shr a ON a.doc_id = c.a_id
  JOIN shr b ON b.doc_id = c.b_id AND b.shingle = a.shingle
  GROUP BY c.a_id, c.b_id
)
SELECT a_id, b_id, n_common,
  round(n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE, 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE >= 0.5
"""


def _ngram_jaccard_oracle_sql(sf_dir: str) -> str:
    """Oracle generator: follows q_ngram_jaccard's corpus-size route
    switch (exact pair join below _NGRAM_LSH_SWITCH, LSH candidates +
    exact verify at/above it) — through the memoized
    resolved_ngram_route, so query and oracle can never disagree on
    the route within a process (r10 ADVICE #3)."""
    if resolved_ngram_route(sf_dir) == "exact":
        return _NGRAM_JACCARD_SQL
    return _ngram_jaccard_lsh_sql()


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise oracle-checked: md5-derived signatures are rebuilt
    identically in SQL (`_minhash_lsh_sql`); recall vs exact Jaccard
    additionally asserted in tests/test_llmdata.py.

    r8 capacity consolidation (VERDICT r7 #2): this is the registered
    face of the whole MinHash family — the survivor set (retired row
    llm_dedup_minhash_survivors) is the anti-join MODE of the same
    band pipeline (batch_minhash_survivors, streaming/dedup_index.py:
    drop the b_id side of these pairs plus exact-text non-minima), so
    a second registry row bought no new semantics. The survivor mode
    keeps its own bitwise DuckDB twin in tests/test_retired_faces.py
    and remains the closure target of the incremental band-index tests
    (tests/test_dedup_index.py)."""
    return D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"),
        presize=resolved_bucket_presize(sf_dir),
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise oracle-checked (`_simhash_pairs_sql`): per-bit vote
    sums, block keys, capped buckets, and hamming filter all rebuilt
    from the same md5-60bit token hash in SQL."""
    return D.simhash_neardup_pairs(
        load(spark, sf_dir, "documents"),
        presize=resolved_bucket_presize(sf_dir),
    )


def q_minhash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving-document set of a batch MinHash sweep: keep a doc
    iff no smaller-id doc band-matches it at est-Jaccard >= 0.5 OR
    equals its text exactly (the exact clause covers sub-k-token docs,
    which have no signature — see batch_minhash_survivors). This is
    the exact semantics the persisted-band-index incremental path
    (streaming/dedup_index.py) reproduces micro-batch by micro-batch —
    the closure is pinned in tests/test_dedup_index.py. Bitwise
    oracle-checked: the SQL twin (`_minhash_survivors_sql`) rebuilds
    the md5-60bit signatures, takes the b_id side of the est>=0.5
    pairs plus the non-minimum ids per content md5, and anti-joins —
    the same two dropped sets.

    Retired from the registry in r8 (capacity consolidation, VERDICT
    r7 #2): anti-join mode of llm_dedup_minhash_lsh (which stays
    registered and bitwise); this face keeps its DuckDB twin in
    tests/test_retired_faces.py."""
    from ..streaming.dedup_index import batch_minhash_survivors

    return batch_minhash_survivors(
        load(spark, sf_dir, "documents"), threshold=0.5
    ).select("doc_id", F.md5("text").alias("content_md5"))


def q_ngram_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same survivor semantics on the EXACT n-gram Jaccard pair set
    (deterministic across engines, so fully oracle-checked): documents
    minus the b_id side of the pair table — pairs carry a_id < b_id,
    so dropping b_ids is precisely 'drop docs with a smaller-id
    match'. One anti-join off the one-shuffle pair pipeline.

    Retired from the registry in r7 (capacity consolidation): the row
    is a one-line anti-join MODE of llm_dedup_ngram_jaccard (which
    stays registered and bitwise), so the external slot bought no new
    semantics. The survivor derivation itself stays oracle-pinned by
    tests/test_llmdata.py (this function vs the same DuckDB twin)."""
    docs = load(spark, sf_dir, "documents")
    dropped = (
        D.ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_doc_freq=100)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    return docs.join(dropped, "doc_id", "left_anti").select(
        "doc_id", F.md5("text").alias("content_md5")
    )


_NGRAM_SURVIVORS_SQL = f"""
SELECT doc_id, md5(text) AS content_md5 FROM documents
WHERE doc_id NOT IN (SELECT b_id FROM ({_NGRAM_JACCARD_SQL}))
"""

# md5-hex (first 15 digits) parsed as a 60-bit integer — the DuckDB
# twin of operators/dedup._h60. Signature arithmetic below mirrors
# minhash_signatures / minhash_band_rows / simhash constant-for-
# constant; the permutation (a_i, b_i) literals are the same _perm(i)
# values the Spark plan folds in.
_H60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _minhash_cte_sql(num_hashes: int = 32, bands: int = 8, max_bucket: int = 256) -> str:
    """Shared CTE chain `tok → sh → hh → msig → band → mok → mcand`
    rebuilding the MinHash/LSH candidate pipeline in ANSI SQL:
    identical shingles (the ngram oracle's list comprehension),
    identical 60-bit hash reduced mod 2^31-1, the 32 affine-permuted
    min-aggregates, per-band md5 keys over the comma-joined signature
    slice, the >=2 / <=max_bucket bucket gate, and distinct a<b pairs."""
    rpb = num_hashes // bands
    perms = [D._perm(i) for i in range(num_hashes)]
    mins = ",\n    ".join(
        f"min((h * {a} + {b}) % {D._MERSENNE}) AS m{i}" for i, (a, b) in enumerate(perms)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, {h} AS bhash FROM msig".format(
            b=b,
            h=_H60.format(
                x="concat_ws(',', " + ", ".join(f"m{b * rpb + r}" for r in range(rpb)) + ")"
            ),
        )
        for b in range(bands)
    )
    return f"""
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
    unnest(list_distinct(
      CASE WHEN len(toks) < 3 THEN []
           ELSE [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]
      END)) AS shingle
  FROM tok
),
hh AS (SELECT doc_id, {_H60.format(x='shingle')} % {D._MERSENNE} AS h FROM sh),
msig AS (
  SELECT doc_id,
    {mins}
  FROM hh GROUP BY doc_id
),
band AS (
  {band_selects}
),
mok AS (
  SELECT band, bhash FROM band GROUP BY band, bhash
  HAVING count(*) BETWEEN 2 AND {max_bucket}
),
mcand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM band a
  JOIN mok USING (band, bhash)
  JOIN band b ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
)"""


def _minhash_lsh_sql(num_hashes: int = 32) -> str:
    est = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(num_hashes))
    return f"""
WITH {_minhash_cte_sql(num_hashes=num_hashes)}
SELECT a_id, b_id, round(({est}) / {num_hashes}.0, 4) AS est_jaccard
FROM mcand
JOIN msig sa ON sa.doc_id = a_id
JOIN msig sb ON sb.doc_id = b_id
"""


def _minhash_survivors_sql(num_hashes: int = 32, threshold: float = 0.5) -> str:
    """Survivors = documents minus (b_id of est>=threshold pairs UNION
    non-minimum ids per content md5 over non-NULL text). The est
    filter uses the UNROUNDED k/num_hashes ratio like the Spark face
    (k/32 is an exact binary fraction, so >= compares identically)."""
    est = " + ".join(f"(sa.m{i} = sb.m{i})::INT" for i in range(num_hashes))
    return f"""
WITH {_minhash_cte_sql(num_hashes=num_hashes)},
near_dropped AS (
  SELECT DISTINCT a_id, b_id FROM mcand
  JOIN msig sa ON sa.doc_id = a_id
  JOIN msig sb ON sb.doc_id = b_id
  WHERE ({est}) / {num_hashes}.0 >= {threshold}
),
exact_dropped AS (
  SELECT doc_id FROM (
    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS mn
    FROM documents WHERE text IS NOT NULL
  ) WHERE doc_id <> mn
),
dropped AS (SELECT b_id AS doc_id FROM near_dropped UNION SELECT doc_id FROM exact_dropped)
SELECT doc_id, md5(text) AS content_md5 FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def _simhash_pairs_sql(
    bits: int = 32, max_hamming: int = 3, max_bucket: int = 256
) -> str:
    n_blocks = max_hamming + 1
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    votes = ",\n    ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    sig = " + ".join(f"(b{i} > 0)::BIGINT * {1 << i}" for i in range(bits))
    block_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, simhash, {b} AS blk, (simhash >> {b * block_bits}) & {mask} AS key FROM ssig"
        for b in range(n_blocks)
    )
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
hh AS (SELECT doc_id, {_H60.format(x='tok')} AS h FROM tok),
votes AS (
  SELECT doc_id,
    {votes}
  FROM hh GROUP BY doc_id
),
ssig AS (SELECT doc_id, {sig} AS simhash FROM votes),
blocked AS (
  {block_selects}
),
sok AS (
  SELECT blk, key FROM blocked GROUP BY blk, key
  HAVING count(*) BETWEEN 2 AND {max_bucket}
),
scand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM blocked a
  JOIN sok USING (blk, key)
  JOIN blocked b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
FROM scand
JOIN ssig sa ON sa.doc_id = a_id
JOIN ssig sb ON sb.doc_id = b_id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COS_DOT = (
    "list_sum(list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_COS_DOT.format(a=a, b=b)} / "
        f"(sqrt({_COS_DOT.format(a=a, b=a)}) * sqrt({_COS_DOT.format(a=b, b=b)}))"
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings),
scored AS (
  SELECT q_id, n_id, {_cos_sql('q_vec', 'n_vec')} AS cos
  FROM c, q WHERE n_id != q_id
)
SELECT q_id, n_id, round(cos, 6) AS cos, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM scored
)
WHERE rank <= 5
"""


def q_emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.neardup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.45)


_EMB_NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
  round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.45
"""


# Corpus-size plane switch for the LSH ANN face (r11, the IVF scheme
# precedent): below _LSH_SCALED_SWITCH vectors the historical 6-plane
# face (64 buckets — the r6-r10 oracle shape, plan byte-identical);
# at/above it scaled_plane_count(n) planes (occupancy ~256) with the
# probed-bucket corpus pruning. One SQL template serves any plane
# count. Memoized per (process, sf_dir) like the ngram/IVF routes.
_LSH_SCALED_SWITCH = 20_000
_LSH_PLANES_CACHE: dict[str, tuple[str, int]] = {}


def resolved_lsh_planes(sf_dir: str) -> tuple[str, int]:
    """('fixed6', 6) below _LSH_SCALED_SWITCH embedding rows, else
    ('scaled', scaled_plane_count(n)) — parquet-footer resolved,
    memoized."""
    key = _route_key(sf_dir)
    got = _LSH_PLANES_CACHE.get(key)
    if got is None:
        n = table_rows_metadata(sf_dir, "embeddings")
        if n >= _LSH_SCALED_SWITCH:
            got = ("scaled", S.scaled_plane_count(n))
        else:
            got = ("fixed6", 6)
        _LSH_PLANES_CACHE[key] = got
    return got


def clear_lsh_planes_cache() -> None:
    """Escape hatch mirroring clear_ngram_route_cache."""
    _LSH_PLANES_CACHE.clear()


def q_emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise oracle-checked since r6: the hyperplanes are seeded and
    data-independent, so the SQL twin inlines them as list literals and
    rebuilds the sign-bit buckets, the multiprobe XOR targets, the
    deduped candidate set, and the (cos desc, n_id) ranking — the
    per-bucket-top-k ∪ global-rank decomposition equals a global rank
    over the deduped candidates. Recall vs brute force additionally
    asserted in tests/test_llmdata.py.

    r11: plane count route-switches by corpus size (resolved_lsh_planes
    — fixed 6 below 20k vectors, scaled_plane_count(n) above, with the
    probed-bucket pruning inside lsh_ann_topk); the twin follows the
    SAME memoized resolution, so the face stays bitwise on both
    routes."""
    emb = load(spark, sf_dir, "embeddings")
    _, n_planes = resolved_lsh_planes(sf_dir)
    return S.lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=n_planes,
        # static query-count bound (vec_id < 5): lets the probed-bucket
        # prune gate decide without a driver collect (r14)
        n_queries=5,
    )


def _emb_ann_lsh_sql(
    sf_dir: str | None = None,
    k: int = 5,
    n_planes: int | None = None,
    multiprobe: int = 2,
) -> str:
    """ANSI-SQL twin of lsh_ann_topk: plane literals from the same
    seeded generator the Spark plan folds in; dot products use the
    proven left-to-right list_sum fold (bitwise equal to both the
    zip_with/aggregate expression and the kernel's dimension-at-a-time
    GEMM accumulation). ``n_planes=None`` follows the query's memoized
    route resolution for ``sf_dir`` (r11)."""
    if n_planes is None:
        n_planes = resolved_lsh_planes(sf_dir)[1] if sf_dir is not None else 6
    planes = S._hyperplanes(64, n_planes)
    lits = ["[" + ", ".join(repr(float(v)) for v in p) + "]" for p in planes]
    bucket = " + ".join(
        f"({_COS_DOT.format(a='embedding', b=lits[i])} > 0)::BIGINT * {1 << i}"
        for i in range(n_planes)
    )
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << i for i in range(n_planes)]
    if multiprobe >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)
        ]
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS q_vec, bucket AS sig FROM sigs WHERE vec_id < 5),
cand AS (
  SELECT DISTINCT q_id, c.vec_id AS n_id
  FROM q, (SELECT unnest({masks}) AS m) t
  JOIN sigs c ON c.bucket = xor(q.sig, t.m)
  WHERE c.vec_id != q_id
),
scored AS (
  SELECT q_id, n_id, {_cos_sql('qe.embedding', 'ne.embedding')} AS cos
  FROM cand
  JOIN embeddings qe ON qe.vec_id = q_id
  JOIN embeddings ne ON ne.vec_id = n_id
)
SELECT q_id, n_id, round(cos, 6) AS cos, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


# Corpus-size scheme switch for the registered IVF face (r10 verdict
# #3 — the fixed-16-cell face was the registry's one scale-killer):
# below _IVF_SCALED_SWITCH vectors the historical fixed-16-cell
# expression scheme (literal-folded assignment, the original
# oracle-frozen face); at/above it the corpus-scaled kernel scheme —
# scaled_cell_count(n) cells (occupancy ~256 held constant) assigned
# by the Arrow two-stage kernel. The assignment kernel is bit-identical
# to the expression (pinned), so ONE SQL template serves both routes;
# only the centroid count (and hence the regenerated literals) differs.
# Resolution is memoized per (process, sf_dir) exactly like the ngram
# route (r10 ADVICE #3) so query and oracle can never disagree.
_IVF_SCALED_SWITCH = 20_000
_IVF_SCHEME_CACHE: dict[str, tuple[str, int]] = {}


def resolved_ivf_scheme(sf_dir: str) -> tuple[str, int]:
    """('fixed16', 16) below _IVF_SCALED_SWITCH embedding rows, else
    ('scaled', scaled_cell_count(n)) — resolved from parquet footers
    once per sf_dir and memoized."""
    key = _route_key(sf_dir)
    got = _IVF_SCHEME_CACHE.get(key)
    if got is None:
        n = table_rows_metadata(sf_dir, "embeddings")
        if n >= _IVF_SCALED_SWITCH:
            got = ("scaled", S.scaled_cell_count(n))
        else:
            got = ("fixed16", 16)
        _IVF_SCHEME_CACHE[key] = got
    return got


def clear_ivf_scheme_cache() -> None:
    """Escape hatch mirroring clear_ngram_route_cache."""
    _IVF_SCHEME_CACHE.clear()


def q_emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise oracle-checked since r7 (was rows-only): the centroid
    sample orders by the engine-portable md5-60bit hash, so the twin's
    generator (_emb_ann_ivf_sql) rebuilds the IDENTICAL sample without
    Spark, replays the same _lloyd_spherical numpy rounds, and freezes
    the centroids into the SQL as literals — then cell assignment,
    probing, scoring, and ranking replay in ANSI SQL. Recall vs brute
    force additionally asserted in tests/test_llmdata.py.

    r11: scheme-switched by corpus size (resolved_ivf_scheme) — large
    corpora get scaled_cell_count(n) cells assigned by the two-stage
    Arrow kernel instead of the fixed 16-cell literal expression, so
    per-cell population (and with it the probed-cell GEMM) stays
    bounded as n grows. The oracle callable regenerates the centroid
    literals at the matching cell count via the same memoized
    resolution, so the face stays bitwise on BOTH routes (scaled-route
    pin in tests/test_llmdata.py)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    scheme, k_cells = resolved_ivf_scheme(sf_dir)
    if scheme == "fixed16":
        return S.ivf_ann_topk(emb, queries, k=5, order="md5h60")
    return S.ivf_ann_topk(
        emb,
        queries,
        k=5,
        n_centroids=k_cells,
        order="md5h60",
        scheme="kernel",
        # footer count: a pure prune hint for the sampler's threshold
        # fast path — cannot change the sample (see sample_centroids)
        n_rows=table_rows_metadata(sf_dir, "embeddings"),
        # static query-count bound (vec_id < 5): lets the probed-cell
        # prune gate decide without a driver collect (r14)
        n_queries=5,
    )


def _emb_ann_ivf_sql(
    sf_dir: str,
    k: int = 5,
    n_centroids: int | None = None,
    n_probe: int = 4,
    iters: int = 3,
) -> str:
    """Twin generator: replays sample_centroids(order='md5h60',
    kmeans='driver') via portable_sample_matrix + _lloyd_spherical —
    the same numpy code path the Spark face runs on the same float64
    matrix, hence bit-identical centroid literals. The SQL then
    re-derives every downstream step: per-row nearest cell (dot DESC,
    cell ASC — nearest_cells' (−dot, cell) struct sort), n_probe
    probed cells per query, candidate scoring with the proven
    left-to-right dot fold (the _topk_kernel GEMM equivalence carried
    over from the LSH/cosine twins), and the (cos DESC, n_id) global
    rank — which equals the per-cell-topk ∪ global-rank decomposition
    because each corpus vector lives in exactly one cell.

    ``n_centroids=None`` follows the query's memoized scheme
    resolution (resolved_ivf_scheme): 16 literals on the fixed route,
    scaled_cell_count(n) on the scaled route — the assignment kernel
    is bit-identical to the expression the SQL replays, so the same
    template serves both routes."""
    if n_centroids is None:
        n_centroids = resolved_ivf_scheme(sf_dir)[1]
    C = S._lloyd_spherical(
        S.portable_sample_matrix(sf_dir, S.lloyd_sample_size(n_centroids)),
        n_centroids,
        iters,
    )
    vals = ",\n    ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in C[i])}])"
        for i in range(n_centroids)
    )
    return f"""
WITH cents(cell, cv) AS (VALUES
    {vals}),
cell_scored AS (
  SELECT e.vec_id, e.embedding, c.cell,
    {_COS_DOT.format(a='e.embedding', b='c.cv')} AS d
  FROM embeddings e CROSS JOIN cents c
),
cell_ranked AS (
  SELECT vec_id, embedding, cell,
    row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell ASC) AS rk
  FROM cell_scored
),
corpus AS (SELECT vec_id AS n_id, embedding AS n_vec, cell FROM cell_ranked WHERE rk = 1),
qs AS (
  SELECT vec_id AS q_id, embedding AS q_vec, cell
  FROM cell_ranked WHERE rk <= {n_probe} AND vec_id < 5
),
scored AS (
  SELECT q.q_id, c.n_id, {_cos_sql('q.q_vec', 'c.n_vec')} AS cos
  FROM qs q JOIN corpus c USING (cell)
  WHERE c.n_id != q.q_id
)
SELECT q_id, n_id, round(cos, 6) AS cos, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM scored
)
WHERE rank <= {k}
"""


def q_emb_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise oracle-checked since r7 (was rows-only): codebooks
    train on the md5-ordered portable sample, so the twin's generator
    (_emb_ann_pq_sql) freezes bit-identical codebook literals and
    replays encode → LUT → ADC → shortlist → exact rerank in ANSI SQL.
    Recall vs brute force asserted in tests/test_ann_ivf_dlq.py."""
    emb = load(spark, sf_dir, "embeddings")
    return S.pq_ann_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, order="md5h60")


def _emb_ann_pq_sql(
    sf_dir: str,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    rerank: int = 4,
    sample: int = 512,
    iters: int = 5,
) -> str:
    """Twin generator for pq_ann_topk: books from the same _pq_lloyd
    numpy replay (bit-identical literals, including each code's
    ||c||² — inlined so no cross-engine fold is needed for it), then:
    per-(vector, subspace) argmin by (score ASC, code ASC) — exactly
    pq_encode's (score, code) struct sort; the per-query LUT as the
    identical generate_series fold over the flattened books; ADC as
    the same left-associated 4-term sum the F.aggregate fold produces;
    shortlist by (approx_cos DESC, n_id) row_number ≤ rerank·k; exact
    rerank with the proven cosine fold."""
    books = S._pq_lloyd(S.portable_sample_matrix(sf_dir, sample), m, n_codes, iters)
    sub = books.shape[2]
    book_vals = ",\n    ".join(
        f"({j}, {c}, [{', '.join(repr(float(v)) for v in books[j, c])}], "
        f"{float((books[j, c] ** 2).sum())!r})"
        for j in range(m)
        for c in range(n_codes)
    )
    flat = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(v)) for v in books[j, c]) + "]"
            for j in range(m)
            for c in range(n_codes)
        )
        + "]"
    )
    adc = " + ".join(
        f"q.lut[{j * n_codes} + c.codes[{j + 1}] + 1]" for j in range(m)
    )
    return f"""
WITH books(j, code, bv, norm2) AS (VALUES
    {book_vals}),
enc_scored AS (
  SELECT e.vec_id, b.j, b.code,
    b.norm2 - 2.0 * list_sum(list_transform(generate_series(1, {sub}),
        t -> e.embedding[b.j * {sub} + t]::DOUBLE * b.bv[t])) AS score
  FROM embeddings e CROSS JOIN books b
),
enc AS (
  SELECT vec_id, j, code FROM (
    SELECT vec_id, j, code,
      row_number() OVER (PARTITION BY vec_id, j ORDER BY score ASC, code ASC) AS rk
    FROM enc_scored
  ) WHERE rk = 1
),
codes AS (
  SELECT vec_id AS n_id, list(code ORDER BY j) AS codes,
    (SELECT sqrt({_COS_DOT.format(a='e.embedding', b='e.embedding')})
     FROM embeddings e WHERE e.vec_id = enc.vec_id) AS nrm
  FROM enc GROUP BY vec_id
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_vec,
    sqrt({_COS_DOT.format(a='embedding', b='embedding')}) AS q_nrm,
    list_transform(generate_series(0, {m * n_codes - 1}),
      i -> list_sum(list_transform(generate_series(1, {sub}),
        t -> embedding[(i // {n_codes}) * {sub} + t]::DOUBLE * {flat}[i + 1][t]))) AS lut
  FROM embeddings WHERE vec_id < 5
),
cand AS (
  SELECT q.q_id, c.n_id, ({adc}) / (q.q_nrm * c.nrm) AS approx_cos
  FROM codes c CROSS JOIN q
  WHERE c.n_id != q.q_id
),
short AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY approx_cos DESC, n_id ASC) AS arank
    FROM cand
  ) WHERE arank <= {rerank * k}
),
exact AS (
  SELECT s.q_id, s.n_id, {_cos_sql('qe.embedding', 'ne.embedding')} AS cos
  FROM short s
  JOIN embeddings qe ON qe.vec_id = s.q_id
  JOIN embeddings ne ON ne.vec_id = s.n_id
)
SELECT q_id, n_id, round(cos, 6) AS cos, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM exact
)
WHERE rank <= {k}
"""


def q_knn_classify(
    spark: SparkSession, sf_dir: str, method: str = "exact"
) -> DataFrame:
    """k-NN label propagation over the embedding space — the standard
    weak-labeling / label-QA pass of an embedding pipeline: every 20th
    vector is held out as a query, classified by majority vote of its
    k=5 exact-cosine neighbors among the rest (tie → smallest label).

    Composes the driver-green brute_force_topk ranking: neighbors are
    ranked on the RAW double cosine (fold-order matched to the SQL
    oracle's dot-product expansion; round(,6) is applied to the output
    column only), with n_id as the tiebreak — so rank membership is
    deterministic given both engines evaluate the identical
    double-precision fold; votes and the (votes desc, label asc)
    argmax are pure integers.
    Scale posture: the query side is the broadcast (held-out sets are
    small by construction); the corpus side streams through one scan.
    method="ivf" swaps the neighbor stage for the partition-pruned
    IVF path with the IDENTICAL vote stage — the 100x route, probing
    n_probe/n_centroids of the corpus per query. On THIS corpus the
    two disagree on predictions because cosine margins sit at the
    random ceiling (the semdedup data-dependence note,
    operators/similarity.py); on real clustered embeddings IVF recall
    is the tested dial. The registered/oracled query stays exact."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    topk = {"exact": S.brute_force_topk, "ivf": S.ivf_ann_topk}[method]
    nn = topk(corpus, queries, k=5)
    votes = (
        nn.join(
            corpus.select(F.col("vec_id").alias("n_id"), F.col("label").alias("n_label")),
            "n_id",
        )
        .groupBy("q_id", "n_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("votes"), F.asc("n_label"))
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("q_id", F.col("n_label").cast("long").alias("pred_label"), "votes")
    )
    truth = queries.select(
        F.col("vec_id").alias("q_id"), F.col("label").cast("long").alias("true_label")
    )
    return pred.join(truth, "q_id").select(
        "q_id",
        "true_label",
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


_KNN_CLASSIFY_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec, CAST(label AS BIGINT) AS true_label
  FROM embeddings WHERE vec_id % 20 = 0
),
c AS (
  SELECT vec_id AS n_id, embedding AS n_vec, label AS n_label
  FROM embeddings WHERE vec_id % 20 != 0
),
scored AS (
  SELECT q_id, n_id, n_label, {_cos_sql('q_vec', 'n_vec')} AS cos
  FROM c, q WHERE n_id != q_id
),
top AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
    FROM scored
  ) WHERE rank <= 5
),
votes AS (SELECT q_id, n_label, count(*) AS votes FROM top GROUP BY q_id, n_label),
pred AS (
  SELECT q_id, CAST(n_label AS BIGINT) AS pred_label, votes FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, n_label ASC) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT q_id, true_label, pred_label, votes, pred_label = true_label AS correct
FROM pred JOIN q USING (q_id)
"""


def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per embedding (the storage/ANN
    compression step of a 100 TB vector pipeline: 4× smaller than
    float32, 8× smaller than float64) + max absolute reconstruction
    error. Pure array-expression projection — no shuffle, no UDF; at
    scale it rides the embedding scan.

    Determinism: scale = max|x|/127, q = clamp(floor(x/scale + 0.5))
    — the same floor(+0.5) idiom the money sums use instead of
    round(), because every op here (max, divide, multiply, subtract,
    floor, abs) is IEEE-exact, so scale/q/max_err are bitwise
    identical in any engine with NO rounding in the projection. The
    all-zero vector degenerates to scale 0 → q all zeros, guarded
    identically on both sides.

    Output shape: `q` is emitted as a comma-joined STRING, not a raw
    array<int> — the driver's canonicalizer sorts result columns with
    pandas, and list-valued cells are unhashable there
    (CORRECTNESS_r02 `llm_emb_quantize` ERR). No raw array columns
    cross the verification boundary."""
    emb = load(spark, sf_dir, "embeddings")
    x = F.col("embedding")
    scale = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))) / F.lit(127.0)
    with_scale = emb.withColumn("scale", scale)
    q = F.when(
        F.col("scale") == 0, F.transform(x, lambda v: F.lit(0))
    ).otherwise(
        F.transform(
            x,
            lambda v: F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.floor(v.cast("double") / F.col("scale") + F.lit(0.5))),
            ).cast("int"),
        )
    )
    with_q = with_scale.withColumn("q", q)
    max_err = F.array_max(
        F.zip_with(
            x,
            F.col("q"),
            lambda a, b: F.abs(a.cast("double") - b.cast("double") * F.col("scale")),
        )
    )
    return with_q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("q").cast("array<string>"), ",").alias("q"),
        max_err.alias("max_err"),
    )


_EMB_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, v -> abs(v::DOUBLE))) / 127.0 AS scale
  FROM embeddings
),
qq AS (
  SELECT vec_id, embedding, scale,
    CASE WHEN scale = 0 THEN list_transform(embedding, v -> 0)
         ELSE list_transform(embedding, v ->
           CAST(greatest(-127.0, least(127.0, floor(v::DOUBLE / scale + 0.5))) AS INT))
    END AS q
  FROM s
)
SELECT vec_id, scale, array_to_string(q, ',') AS q,
  list_max(list_transform(generate_series(1, len(embedding)),
    i -> abs(embedding[i]::DOUBLE - q[i] * scale))) AS max_err
FROM qq
"""


# q_dedup_clusters routes pair generation by corpus size (parquet
# footer row count — no Spark job): below this, the exact one-shuffle
# n-gram join; at/above it, MinHash-LSH candidates + exact
# verification (ngram_jaccard_pairs_lsh — the designated route for
# the closed-vocabulary df-cap cliff, r8 verdict #4). sf0.1 (5k docs)
# stays exact; sf1 (50k) and every soak corpus take the LSH route.
_NGRAM_LSH_SWITCH = 20_000


def q_dedup_clusters(
    spark: SparkSession, sf_dir: str, pair_method: str | None = None
) -> DataFrame:
    """Connected components over n-gram near-dup pairs (the iterative
    min-label-propagation loop in operators/clustering.py). Pair
    generation is route-switched by corpus size (_NGRAM_LSH_SWITCH):
    the exact path's kept-shingle join is superlinear once a closed
    vocabulary saturates the shingle space (the measured sf1 df-cap
    cliff), so large corpora take LSH candidates + exact verification
    instead — same verified (n_common, jaccard) values, recall bounded
    by the banding miss probability (negligible on margin-bearing
    corpora; route parity pinned in tests/test_operators.py). Oracle:
    DuckDB recursive CTE computing min reachable id over the SAME
    route's pair set (the twin switches with the query — see
    _dedup_clusters_sql, both through the memoized
    resolved_ngram_route — r10 ADVICE #3), so the row stays bitwise
    at every sf."""
    from ..operators.clustering import dedup_clusters

    if pair_method is None:
        pair_method = resolved_ngram_route(sf_dir)
    gen = D.ngram_jaccard_pairs if pair_method == "exact" else D.ngram_jaccard_pairs_lsh
    pairs = gen(
        load(spark, sf_dir, "documents"), k=3, threshold=0.5, max_doc_freq=100
    )
    return dedup_clusters(pairs)


_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id,
    unnest(list_distinct(
      CASE WHEN len(toks) < 3 THEN []
           ELSE [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]
      END)) AS shingle
  FROM tok
),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
  FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE >= 0.5
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION SELECT b_id AS u, a_id AS v FROM pairs
),
reach AS (
  SELECT u AS vertex, u AS label FROM edges
  UNION
  SELECT e.u AS vertex, r.label
  FROM reach r JOIN edges e ON e.v = r.vertex
),
cc AS (SELECT vertex, min(label) AS component FROM reach GROUP BY vertex)
SELECT component AS representative,
       count(*) AS cluster_size,
       array_to_string(list_sort(list(CAST(vertex AS VARCHAR))), ',') AS members
FROM cc GROUP BY component
"""


def _dedup_clusters_lsh_sql() -> str:
    """The LSH-route twin of _DEDUP_CLUSTERS_SQL: MinHash banding
    candidates (the shared mcand CTE chain — identical 60-bit hashes,
    permutations, band keys, and bucket gates as the Spark operator)
    verified with the exact df-capped Jaccard, then the same
    recursive-CTE connected components. Selected by the oracle
    callable when the corpus is at/above _NGRAM_LSH_SWITCH, mirroring
    q_dedup_clusters' route switch — bitwise at soak scale too."""
    return f"""
WITH RECURSIVE {_minhash_cte_sql()},
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shr GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS n_common
  FROM mcand c
  JOIN shr a ON a.doc_id = c.a_id
  JOIN shr b ON b.doc_id = c.b_id AND b.shingle = a.shingle
  GROUP BY c.a_id, c.b_id
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON sa.doc_id = a_id
  JOIN sizes sb ON sb.doc_id = b_id
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)::DOUBLE >= 0.5
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION SELECT b_id AS u, a_id AS v FROM pairs
),
reach AS (
  SELECT u AS vertex, u AS label FROM edges
  UNION
  SELECT e.u AS vertex, r.label
  FROM reach r JOIN edges e ON e.v = r.vertex
),
cc AS (SELECT vertex, min(label) AS component FROM reach GROUP BY vertex)
SELECT component AS representative,
       count(*) AS cluster_size,
       array_to_string(list_sort(list(CAST(vertex AS VARCHAR))), ',') AS members
FROM cc GROUP BY component
"""


def _dedup_clusters_sql(sf_dir: str) -> str:
    """Oracle generator: the twin follows q_dedup_clusters' corpus-size
    route switch (exact pair join below _NGRAM_LSH_SWITCH, LSH
    candidates + exact verify at/above it) — through the memoized
    resolved_ngram_route shared with the query (r10 ADVICE #3)."""
    if resolved_ngram_route(sf_dir) == "exact":
        return _DEDUP_CLUSTERS_SQL
    return _dedup_clusters_lsh_sql()


def q_semdedup(
    spark: SparkSession, sf_dir: str, pair_method: str = "ivf_asym"
) -> DataFrame:
    """SemDeDup-style semantic deduplication: embedding-cosine
    near-dup pairs, connected components over them, and a per-vector
    keep/drop decision — keep iff the vector is its cluster's min-id
    representative. Vectors in no near-dup pair are their own
    singleton cluster (kept). This is the embedding-space twin of the
    shingle-based dedup_clusters pipeline.

    ``pair_method`` picks the pair generator (VERDICT r2 #3):
    - "ivf_asym" (registered default since r11 — SCALING.md item 13):
      asymmetric home-vs-probe IVF candidates + exact cosine verify —
      each vector ships 1× as home + 6× as probe instead of the
      symmetric path's 10×, and the per-cell gate GEMM is
      homes × probes (~16× fewer FLOPs). Measured sf30: pair stage
      32.3 → 12.6 s with the IDENTICAL pair set; recall 1.0 pinned on
      the no-margin planted fixture (the worst case) and vs the exact
      path at every testdata sf.
    - "ivf": the symmetric multi-probe candidate path (the r2-r10
      registered face) — kept callable; the streaming semdedup index
      still builds on its cell-row layout.
    - "exact": the blocked-GEMM all-pairs product — the test oracle
      and the small-corpus/exactness-mandatory spend.

    The operating point is DERIVED FROM THE DATA, not hard-coded (the
    r5-flagged fragility): ``calibrate_null_threshold`` estimates the
    null cosine distribution from a seeded md5-ordered sample and sets
    the threshold to the expected maximum of that null over all
    n(n−1)/2 pairs, floored at 0.45 — so the pair set stays
    signal-only as the corpus grows instead of flooding connected
    components with the n²-growing random tail (the measured sf1 soak
    failure). On this synthetic corpus the embeddings are isotropic
    noise (null σ = 1/√64; the 0.45-crossing pair count matches the
    null tail prediction), so the calibrated pair set is empty and
    every vector is its own kept singleton — the honest answer; real
    near-dup structure sits above the null maximum and survives
    (planted-fixture pin in tests/test_llmdata.py).

    Oracle: the same recursive-CTE reachability as
    _DEDUP_CLUSTERS_SQL, over the (exact) cosine pair set at the
    identical threshold inlined as a literal (_semdedup_sql) — identical
    output because candidate recall is 1.0 here."""
    from ..operators.clustering import connected_components

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()  # one scan feeds calibration AND centroid sizing
    thr = S.calibrate_null_threshold(emb, floor=0.45, n_rows=n)
    if pair_method == "ivf_asym":
        pairs = S.neardup_pairs_ivf_asym(emb, threshold=thr, n_rows=n)
    elif pair_method == "ivf":
        pairs = S.neardup_pairs_ivf_candidates(emb, threshold=thr, n_rows=n)
    else:
        pairs = S.neardup_pairs(emb, threshold=thr)
    cc = connected_components(pairs)
    return (
        emb.select("vec_id")
        .join(cc, F.col("vec_id") == F.col("vertex"), "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
        )
        .withColumn("keep", F.col("vec_id") == F.col("component"))
    )


def _semdedup_sql(sf_dir: str) -> str:
    """Twin generator (callable oracle): the operating point is
    derived ONCE by the Spark-free calibration replica — the identical
    sequential fold the Spark face runs on the identical md5-ordered
    sample — and inlined as a literal (ADVICE r6: re-deriving it with
    DuckDB avg/stddev_pop risks a 1-ulp divergence at a round-to-4
    boundary flipping the whole family red intermittently)."""
    thr = S.calibrate_null_threshold_py(sf_dir, floor=0.45)
    return _SEMDEDUP_SQL_TPL.replace("__THR__", repr(thr))


_SEMDEDUP_SQL_TPL = f"""
WITH RECURSIVE
e AS (SELECT vec_id, embedding FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= __THR__
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION SELECT b_id AS u, a_id AS v FROM pairs
),
reach AS (
  SELECT u AS vertex, u AS label FROM edges
  UNION
  SELECT e2.u AS vertex, r.label
  FROM reach r JOIN edges e2 ON e2.v = r.vertex
),
cc AS (SELECT vertex, min(label) AS component FROM reach GROUP BY vertex)
SELECT vec_id,
  COALESCE(component, vec_id) AS component,
  COALESCE(component, vec_id) = vec_id AS keep
FROM embeddings LEFT JOIN cc ON vec_id = vertex
"""


def q_semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving-vector set of the semantic dedup under the
    smaller-id-wins rule: keep a vector iff no smaller-id vector is an
    IVF-candidate near-duplicate at the null-calibrated operating
    point (see q_semdedup — max(0.45, expected null maximum), derived
    identically by both engines). This is the exact semantics the
    persisted-cell-index incremental path
    (streaming/semdedup_index.py) reproduces micro-batch by
    micro-batch — the closure is pinned in tests/test_semdedup_index.py
    on margin-bearing data. Candidate recall vs the exact pair set is
    1.0 on THIS corpus (the llm_semdedup configuration), so the DuckDB
    oracle can state the rule over the exact all-pairs set."""
    from ..streaming.semdedup_index import batch_semdedup_survivors

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()  # one scan feeds calibration AND centroid sizing
    thr = S.calibrate_null_threshold(emb, floor=0.45, n_rows=n)
    return batch_semdedup_survivors(emb, threshold=thr, n_rows=n).select("vec_id")


def _semdedup_survivors_sql(sf_dir: str) -> str:
    """Twin generator — same inlined-threshold-literal discipline as
    _semdedup_sql."""
    thr = S.calibrate_null_threshold_py(sf_dir, floor=0.45)
    return _SEMDEDUP_SURVIVORS_SQL_TPL.replace("__THR__", repr(thr))


_SEMDEDUP_SURVIVORS_SQL_TPL = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (
  SELECT b.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= __THR__
)
"""


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone: the full training-corpus cleaning pass as ONE
    declarative plan — quality gate, language gate, exact dedup (keep
    min id), deterministic train/val/test assignment, per-split stats.
    At 100 TB this is a scan + one dedup shuffle + one agg shuffle."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    # Dedup FIRST, score SECOND: every score below is a pure function
    # of text, so scoring commutes with the text-grouping — the exact
    # dedup's own shuffle both spreads an under-parallel single-file
    # scan to full parallelism (sf10: 13 skewed splits behind a
    # straggler) and shrinks the scoring input to DISTINCT texts. Same
    # output as score-then-dedup (min over identical per-text values
    # is the value), one shuffle of the text payload instead of two.
    deduped_raw = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    scored = deduped_raw.select(
        "doc_id",
        "text",
        T.quality_score(t).alias("quality"),
        T.predicted_lang(t).alias("pred_lang"),
        T.n_tokens(t).alias("n_tokens"),
    )
    deduped = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("pred_lang") == "en")
    )
    # split via the shared split_bucket family (r10: the inline
    # multiplicative constant was the same degenerate family the
    # estimator sweep retired from split_bucket — see its docstring)
    from .relational import split_bucket

    bucket = split_bucket(F.col("doc_id"), 100)
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    # Last-mile output discipline: no raw float division crosses the
    # verification boundary (CORRECTNESS_r02 hash-FAIL). avg quality is
    # emitted at exact integer 1e-6 scale: all-BIGINT arithmetic, so
    # the value is engine-independent by construction.
    return (
        deduped.select(F.col("doc_id"), split.alias("split"), "quality", "n_tokens")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long")).alias("_qsum"),
        )
        .select(
            "split",
            "n_docs",
            "total_tokens",
            F.expr("(_qsum * 100) div n_docs").alias("avg_quality_e6"),
        )
    )


_CORPUS_PIPELINE_SQL = """
WITH scored AS (
  SELECT doc_id, text,
    0.4 * least(len(string_split(text,' '))::DOUBLE / 64.0, 1.0)
      + 0.4 * (len(list_distinct(string_split(text,' ')))::DOUBLE / len(string_split(text,' ')))
      + 0.2 * least((len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and')))::DOUBLE
                     / len(string_split(text,' '))) * 4.0, 1.0) AS quality,
    len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das'))) AS c_de,
    len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and'))) AS c_en,
    len(list_filter(string_split(text,' '), t -> t IN ('el','la','y','los'))) AS c_es,
    len(list_filter(string_split(text,' '), t -> t IN ('le','la','et','les'))) AS c_fr,
    len(string_split(text,' ')) AS n_tokens
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE quality >= 0.5
    AND greatest(c_de,c_en,c_es,c_fr) > 0
    AND c_en = greatest(c_de,c_en,c_es,c_fr)
    AND NOT (c_de = greatest(c_de,c_en,c_es,c_fr))
),
deduped AS (
  SELECT min(doc_id) AS doc_id, min(quality) AS quality, min(n_tokens) AS n_tokens
  FROM kept GROUP BY text
)
SELECT
  CASE WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 80 THEN 'train'
       WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 90 THEN 'val'
       ELSE 'test' END AS split,
  count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST((sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT)) * 100) // count(*) AS BIGINT)
    AS avg_quality_e6
FROM deduped
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retired from the registry in r8 (capacity consolidation,
    VERDICT r7 #2): the same doc-level metadata columns ride on every
    llm_multimodal_frames row (shared attach_binary decode lineage);
    this face stays verified against _MULTIMODAL_META_SQL and pinned
    as the distinct projection of the merged frames face in
    tests/test_retired_faces.py."""
    return M.binary_meta(load(spark, sf_dir, "documents"))


_MULTIMODAL_META_SQL = """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  'text/plain' AS mime,
  source AS origin,
  md5(text) AS content_md5
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode path with the deterministic
    fake decoder (real decode is stubbed per brief). Bitwise
    oracle-checked since r6: the fake's features (byte length, mean
    byte value, content md5 of the utf-8 payload) are closed-form, so
    the SQL twin recomputes them from hex pairs of the encoded text —
    a green row proves the mapInPandas seam (schema, batching, Arrow
    round-trip) delivers exactly the decoder's output."""
    return M.extract_features(load(spark, sf_dir, "documents"), fake=True)


_MULTIMODAL_FEATURES_SQL = """
WITH b AS (SELECT doc_id, encode(text) AS payload, text FROM documents)
SELECT doc_id,
  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
  CAST(COALESCE(list_sum(list_transform(generate_series(1, octet_length(payload)),
      i -> CAST(('0x' || substr(hex(payload), 2*i-1, 2)) AS BIGINT))), 0) AS DOUBLE)
    / greatest(octet_length(payload), 1) AS mean_byte,
  md5(text) AS content_md5
FROM b
"""


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, oracle-verified end-to-end: per document a
    16x16 greyscale gradient (pixel[i] = (doc_id*7 + i) % 256) is
    encoded to genuine PNG bytes through the pure-stdlib codec
    (operators/png.py) with the scanline filter cycling over all five
    types by doc_id, then DECODED back and reduced to integer metrics
    — dimensions, top-left pixel, position-weighted pixel checksum.
    DuckDB cannot parse PNG, but it can compute the closed-form pixel
    content directly, so a green driver row proves the deflate +
    unfilter + reshape pipeline reconstructed every pixel exactly.
    Scale shape: one mapInPandas over doc ids — embarrassingly
    parallel, no shuffle; real corpora swap the synthesizer for a
    parquet binary column at the same seam."""
    return M.png_decode_metrics(load(spark, sf_dir, "documents"))


_MULTIMODAL_PNG_SQL = """
SELECT doc_id,
  CAST(16 AS BIGINT) AS width,
  CAST(16 AS BIGINT) AS height,
  CAST(1 AS BIGINT) AS channels,
  CAST((doc_id * 7) % 256 AS BIGINT) AS top_left,
  CAST(list_sum([(i + 1) * ((doc_id * 7 + i) % 256) for i in generate_series(0, 255)])
       AS BIGINT) AS weighted_sum
FROM documents
"""


def q_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, oracle-verified end-to-end — the WAV sibling
    of q_multimodal_png: per document a 512-sample int16 waveform
    (sample[i] = ((doc_id*13 + i*257) % 65536) - 32768) is encoded to
    genuine RIFF/PCM bytes (operators/wav.py), decoded back, and
    reduced to integer metrics DuckDB recomputes from the formula.
    Same embarrassingly-parallel mapInPandas shape as the PNG path."""
    return M.wav_decode_metrics(load(spark, sf_dir, "documents"))


_MULTIMODAL_WAV_SQL = """
SELECT doc_id,
  CAST(512 AS BIGINT) AS n_samples,
  CAST(16000 AS BIGINT) AS sample_rate,
  CAST((doc_id * 13) % 65536 - 32768 AS BIGINT) AS first_sample,
  CAST(list_sum([abs((doc_id * 13 + i * 257) % 65536 - 32768)
                 for i in generate_series(0, 511)]) AS BIGINT) AS abs_sum
FROM documents
"""


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode, oracle-verified end-to-end — the
    lossy-codec sibling of q_multimodal_png, closing the r5 verdict's
    highest-value remaining stub: per document a 16×16 greyscale image
    of constant 8×8 blocks (block (bx,by) = (doc_id*11 + by*2 + bx) %
    256) is encoded to genuine baseline JFIF bytes through the
    pure-stdlib codec (operators/jpeg.py: FDCT → quantize → zigzag →
    differential-DC Huffman with the T.81 Annex K standard tables →
    byte-stuffed entropy segment), then DECODED back and reduced to
    integer metrics. At IJG quality=100 the quantization table is all
    ones and a constant block's DCT is exactly its integer DC
    coefficient, so the normally-lossy pipeline is bit-exact on this
    fixture — DuckDB cannot parse JPEG, but it can state the
    closed-form pixels, so a green row proves marker framing, Huffman
    coding, dequantize, IDCT, and level shift all composed exactly.
    The AC / lossy / corruption surfaces are pytest-pinned with
    spec-derived error bounds (tests/test_jpeg_codec.py). Scale
    shape: one mapInPandas over doc ids — embarrassingly parallel,
    no shuffle."""
    return M.jpeg_decode_metrics(load(spark, sf_dir, "documents"))


_MULTIMODAL_JPEG_SQL = """
SELECT doc_id,
  CAST(16 AS BIGINT) AS width,
  CAST(16 AS BIGINT) AS height,
  CAST((doc_id * 11) % 256 AS BIGINT) AS top_left,
  CAST(list_sum([(i + 1) * ((doc_id * 11 + ((i // 16) // 8) * 2 + ((i % 16) // 8)) % 256)
                 for i in generate_series(0, 255)]) AS BIGINT) AS weighted_sum
FROM documents
"""


def q_multimodal_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode, oracle-verified end-to-end — the
    lossless-compression audio sibling of q_multimodal_wav and the
    audio counterpart of the GIF/LZW path: per document a 512-sample
    ramp waveform (sample[i] = (doc_id*29 + i*7) % 4000 - 2000) is
    encoded to genuine FLAC (operators/flac.py: fixed-order linear
    predictors chosen per subframe, Rice/Golomb residual coding,
    CRC-8/CRC-16 framing) in 200-sample frames — multi-frame,
    predictor and Rice paths all live — then DECODED back and reduced
    to integer metrics. FLAC is lossless, so DuckDB states the
    closed-form samples and a green row proves predictor
    reconstruction, zigzag/unary decoding, partitioning, and both
    CRCs composed exactly. MP3 stays a sanctioned stub (spec tables
    not reproducible from memory); FLAC is the honestly-buildable
    compressed-audio format. Scale shape: embarrassingly parallel
    mapInPandas over doc ids, no shuffle."""
    return M.flac_decode_metrics(load(spark, sf_dir, "documents"))


_MULTIMODAL_FLAC_SQL = """
SELECT doc_id,
  CAST(512 AS BIGINT) AS n_samples,
  CAST(16000 AS BIGINT) AS sample_rate,
  CAST(16 AS BIGINT) AS bits_per_sample,
  CAST((doc_id * 29) % 4000 - 2000 AS BIGINT) AS first_sample,
  CAST(list_sum([abs((doc_id * 29 + i * 7) % 4000 - 2000)
                 for i in generate_series(0, 511)]) AS BIGINT) AS abs_sum
FROM documents
"""


def q_multimodal_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + frame sampling, oracle-verified end-to-end
    — the video sibling of q_multimodal_png/_wav: per document a
    12-frame 6x5 RGB clip (pixel i of frame f = (doc_id*11 + f*31 + i)
    % 256) is encoded to a genuine AVI container (operators/avi.py:
    RIFF/hdrl/movi/idx1, bottom-up BGR DIBs with live row padding),
    decoded back, and every 3rd frame reduced to integer metrics
    DuckDB recomputes from the formula. One doc fans out to 4 frame
    rows — the video-pipeline shape, embarrassingly parallel, no
    shuffle."""
    return M.avi_frame_metrics(load(spark, sf_dir, "documents"))


_MULTIMODAL_AVI_SQL = """
SELECT doc_id,
  f.f AS frame_idx,
  CAST(6 AS BIGINT) AS width,
  CAST(5 AS BIGINT) AS height,
  CAST(12 AS BIGINT) AS n_frames,
  CAST(10 AS BIGINT) AS fps,
  CAST((doc_id * 11 + f.f * 31) % 256 AS BIGINT) AS first_px,
  CAST(list_sum([(i + 1) * ((doc_id * 11 + f.f * 31 + i) % 256)
                 for i in generate_series(0, 89)]) AS BIGINT) AS weighted_sum
FROM documents, (SELECT unnest(range(0, 12, 3)) AS f) f
"""


def q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL LZW-compressed animated-image decode + frame sampling,
    oracle-verified end-to-end — the palette-codec sibling of
    q_multimodal_png/_jpeg and the second multi-frame container after
    AVI: per document a 6-frame 8×8 animated GIF (pixel i of frame f =
    (doc_id*9 + f*17 + i*5) % 256) is encoded through the pure-stdlib
    codec (operators/gif.py: variable-width LZW with the full 9→12-bit
    dictionary growth cycle, data sub-block framing, GIF89a graphic
    control + NETSCAPE loop extensions, 4-pass interlace live on odd
    doc ids), then DECODED back and every 2nd frame reduced to integer
    metrics. LZW is lossless, so unlike JPEG no special operating
    point is needed: DuckDB states the closed-form pixels and a green
    row proves header/extension walking, LZW (incl. the KwKwK case and
    width growth), sub-block reassembly, and de-interlacing all
    composed exactly. Scale shape: embarrassingly parallel mapInPandas
    over doc ids, no shuffle."""
    return M.gif_frame_metrics(load(spark, sf_dir, "documents"))


_MULTIMODAL_GIF_SQL = """
SELECT doc_id,
  f.f AS frame_idx,
  CAST(8 AS BIGINT) AS width,
  CAST(8 AS BIGINT) AS height,
  CAST(6 AS BIGINT) AS n_frames,
  CAST(4 AS BIGINT) AS delay_cs,
  CAST((doc_id * 9 + f.f * 17) % 256 AS BIGINT) AS first_px,
  CAST(list_sum([(i + 1) * ((doc_id * 9 + f.f * 17 + i * 5) % 256)
                 for i in generate_series(0, 63)]) AS BIGINT) AS weighted_sum
FROM documents, (SELECT unnest(range(0, 6, 2)) AS f) f
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-pipeline shape): one doc fans out to many
    frame rows via mapInPandas. The deterministic fake decoder chunks
    the payload bytes, so the oracle can reproduce frames as blob
    substrings — the hash column proves payload CONTENT round-tripped
    through Arrow, not just row counts.

    r8 capacity consolidation (VERDICT r7 #2): absorbs the retired
    llm_multimodal_meta row — both faces read the same attach_binary
    decode lineage, so the doc-level metadata (container byte size,
    mime, origin, content md5) rides along as per-doc columns on the
    frame rows: the shape a real video pipeline lands anyway (frame
    table enriched with container metadata). The enrich is a
    co-partitioned equi-join of the frame fan-out against the 1-row-
    per-doc meta projection — both sides hash-partition on doc_id, no
    broadcast needed at 100 TB. The retired face is the distinct
    doc-level projection, pinned in tests/test_retired_faces.py."""
    docs = load(spark, sf_dir, "documents")
    frames = M.sample_frames(docs, frame_bytes=64, every_n=4, fake=True)
    meta = M.binary_meta(docs).select(
        "doc_id",
        F.col("n_bytes").alias("doc_bytes"),
        "mime",
        "origin",
        "content_md5",
    )
    return frames.join(meta, "doc_id").select(
        "doc_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        "n_bytes",
        "doc_bytes",
        "mime",
        "origin",
        "content_md5",
    )


# The engine chunks PAYLOAD BYTES; this oracle chunks characters —
# equivalent here because the corpus is pure ASCII (verified: no doc
# has octet_length(encode(text)) <> length(text) at any SF). DuckDB
# has no BLOB substring, so a byte-true oracle isn't expressible.
_MULTIMODAL_FRAMES_SQL = """
SELECT doc_id,
       i AS frame_idx,
       md5(substring(text, CAST(i AS INT) * 64 + 1, 64)) AS frame_md5,
       octet_length(encode(substring(text, CAST(i AS INT) * 64 + 1, 64))) AS n_bytes,
       octet_length(encode(text)) AS doc_bytes,
       'text/plain' AS mime,
       source AS origin,
       md5(text) AS content_md5
FROM (
  SELECT doc_id, text, source,
         unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 4)) AS i
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# End-to-end corpus build (VERDICT r4 #7)
# ---------------------------------------------------------------------------

_BUILD_PACK_TARGET = 256
_BUILD_PACK_SHARDS = 16


# Corpus size above which image-dedup candidate generation switches
# from 10×6-bit banding to the 3×20-bit multi-probe scheme (see
# _ahash_candidates). 6-bit keys give only 64 buckets per band, so the
# banded self-join carries an n²/64 random-collision floor — measured
# at the sf10 soak as 399 s / exponent 2.2 on 500k md5-random hashes.
_AHASH_PROBE_SWITCH = 100_000

def _hamming_masks(w: int, r: int) -> list[int]:
    """All xor masks of weight ≤ r over a w-bit key — the multi-probe
    enumeration table, C(w,0)+…+C(w,r) entries."""
    from itertools import combinations

    return [
        sum(1 << i for i in bits)
        for k in range(r + 1)
        for bits in combinations(range(w), k)
    ]


# The NEXT probe dial, pre-staged before it's needed (r8 verdict #6):
# 2 blocks × 30 bits with ASYMMETRIC multi-probe — the probe side
# enumerates hamming-≤3 variants of each block key (C(30,≤3) = 4,526
# masks), the index side hamming-≤1 (31 masks); two keys match iff
# their block-hamming ≤ 3+1 = 4, and ≤8 errors over 2 blocks leave
# some block with ≤4 (pigeonhole) — so probe3 is COMPLETE at
# hamming ≤ 8, like the other two schemes. Random-collision floor:
# 2·4526·31/2^30 ≈ 2.6e-4·n², 2.3× below probe2's 3·211/2^20 ≈
# 6.0e-4·n². The crossover arithmetic that sets the switch: probe2's
# total row volume is (633 + 3)·n probes PLUS 6.0e-4·n² floor
# candidates; probe3 trades a 14× larger linear term (9,052·n + 62·n)
# for the 2.3× smaller quadratic one, and the totals cross near
# n ≈ 3.0e7 — BELOW that, probe2 moves fewer rows and stays the
# right scheme (measured sf10/500k: 67.7 s), ABOVE it the floor
# dominates everything linear and probe3 wins. Scheme equivalence at
# the switchover is pinned in tests/test_gif_codec.py (all three
# schemes, identical filtered pair set); the ≥1M-doc one-point
# measurement lives in SOAK_sf1.json["ahash_probe3_1m"].
_AHASH_PROBE3_SWITCH = 30_000_000


# Broadcast cap for the multi-probe index side (r14, r13 verdict #1):
# the probe join is ASYMMETRIC — probe rows are 211·n_blocks per doc,
# index rows only n_blocks (probe2) — yet a shuffle join moves BOTH
# sides. Broadcasting the index side removes the probe-side exchange
# entirely (at sf30 that is ~950M exploded probe rows, the measured
# wall after the r13 codec fusion) AND serializes the lazy-checkpoint
# materialization: the broadcast job computes the (doc_id, ahash)
# table once before the probe stage starts, where the old plan's two
# concurrent exchange-map stages raced to compute the checkpointed
# decode twice. Cap chosen as rows, the unit the 512M-row broadcast
# limit and the hash-relation build are linear in: 16M index rows ≈
# 0.4-0.5 GB built (within the guide's "few hundred MB is fine"),
# reached at n_docs ≈ 5.3M under probe2's 3 rows/doc. Above the cap
# (and on probe3's 62 rows/doc index side, which blows past it by
# construction at its ≥30M-doc switch) the shuffle join stays.
_AHASH_BCAST_MAX_INDEX_ROWS = 16_000_000


def _ahash_candidates(
    hashes: DataFrame, scheme: str, n_docs: int | None = None
) -> DataFrame:
    """Candidate (a_id, b_id, hamming) pairs from a (doc_id, ahash)
    table, deduped, NOT yet threshold-filtered. Both schemes are
    pigeonhole-COMPLETE at hamming ≤ 8 over the 60-bit hash, so the
    final filtered output is identical — only the candidate volume
    differs:

    - "banded": 10 bands × 6 bits, equi-join on (band, key). ≤8
      differing bits occupy ≤8 bands → ≥2 clean bands shared. Key
      space 2^6 per band → random-collision floor n²·10/64; right for
      small corpora where the decode dominates anyway.
    - "probe": 3 blocks × 20 bits, multi-probe radius 2. ≤8 errors
      over 3 blocks → some block differs in ≤2 bits (else ≥3·3=9),
      so probing every hamming-≤2 variant (211 masks) of each block
      key meets the other doc's EXACT block key. Probe rows are
      633·n (linear); the random floor drops to n²·633/2^20 — 258×
      fewer candidates than banding, the dial a bigger corpus turns
      further by widening blocks/raising radius together."""
    if scheme == "banded":
        bands = hashes.select(
            "doc_id",
            "ahash",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.shiftright("ahash", 6 * j).bitwiseAND(F.lit(63)).alias("key"),
                    )
                    for j in range(10)
                ])
            ).alias("b"),
        ).select("doc_id", "ahash", "b.band", "b.key")
        a, b = bands.alias("a"), bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"),
                F.bit_count(
                    F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
                ).cast("long").alias("hamming"),
            )
            .distinct()
        )
    if scheme == "probe3":
        # 2 blocks × 30 bits, asymmetric (radius-3 probes vs radius-1
        # index keys) — see _AHASH_PROBE3_SWITCH for the completeness
        # proof and crossover arithmetic
        n_blocks, width, r_probe, r_index = 2, 30, 3, 1
    else:
        assert scheme == "probe", scheme
        n_blocks, width, r_probe, r_index = 3, 20, 2, 0

    def block_key(j: int) -> F.Column:
        return F.shiftright("ahash", width * j).bitwiseAND(F.lit((1 << width) - 1))

    blocks = hashes.select(
        "doc_id",
        "ahash",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("blk"), block_key(j).alias("key"))
                for j in range(n_blocks)
            ])
        ).alias("b"),
    ).select("doc_id", "ahash", "b.blk", "b.key")

    def expand(side: DataFrame, radius: int) -> DataFrame:
        if radius == 0:
            return side
        masks = F.lit(_hamming_masks(width, radius))
        return side.select(
            "doc_id",
            "ahash",
            "blk",
            F.explode(
                F.transform(masks, lambda m: F.col("key").bitwiseXOR(m))
            ).alias("key"),
        )

    # Fuse (blk, key) into ONE long join key (r14, guide §3.1): key <
    # 2^width, so bk = blk·2^width + key is a bijection and the join
    # predicate is unchanged. A single long equi-key lets the join
    # build/probe Spark's specialized long-keyed hash relation instead
    # of hashing and comparing a generic two-column row per probe —
    # measured 5× on the probe lookup at sf3 (95M probe rows: 10.2 s
    # two-col vs 1.8 s fused, same 15.17M-row join output).
    def fused(side: DataFrame) -> DataFrame:
        return side.select(
            "doc_id",
            "ahash",
            (F.col("blk").cast("long") * (1 << width) + F.col("key")).alias("bk"),
        )

    p = fused(expand(blocks, r_probe)).alias("p")
    i = fused(expand(blocks, r_index)).alias("i")
    # index-side rows per doc: n_blocks keys, each expanded to the
    # radius-r_index mask count (1 for r_index=0)
    idx_rows_per_doc = n_blocks * len(_hamming_masks(width, r_index))
    if n_docs is not None and n_docs * idx_rows_per_doc <= _AHASH_BCAST_MAX_INDEX_ROWS:
        i = F.broadcast(i)
    return (
        p.join(
            i,
            (F.col("p.bk") == F.col("i.bk"))
            & (F.col("p.doc_id") != F.col("i.doc_id")),
        )
        .select(
            F.least("p.doc_id", "i.doc_id").alias("a_id"),
            F.greatest("p.doc_id", "i.doc_id").alias("b_id"),
            F.bit_count(
                F.col("p.ahash").bitwiseXOR(F.col("i.ahash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )


def q_image_dedup_pairs(
    spark: SparkSession, sf_dir: str, scheme: str | None = None
) -> DataFrame:
    """Perceptual-hash image near-dup pairs — the multimodal and
    dedup families composed: every document's REAL PNG (planted
    60-bit patterns, 5 docs per group at hamming <= 8, cross-group
    ~30) is DECODED and average-hashed from pixels
    (operators/multimodal.image_ahash), then candidates come from a
    pigeonhole-complete equi-join (_ahash_candidates: 10×6-bit
    banding below _AHASH_PROBE_SWITCH docs, 3×20-bit multi-probe
    above — r8: the first sf10 soak exposed banding's 64-bucket
    random-collision floor at 399 s/exp 2.2; both schemes emit the
    IDENTICAL filtered pair set, pinned in tests/test_llmdata.py),
    exact bit_count(xor) <= 8 verdict. The SQL twin derives the
    hashes from the md5 closed form instead of pixels, so a green row
    proves PNG decode + cell pooling + thresholding reproduced every
    planted bit. Scale shape: decode is embarrassingly parallel;
    candidate generation is an equi-join — never all-pairs. r7
    (VERDICT #5): the hash table is localCheckpoint'ed before the
    self-join — both join sides otherwise re-run the whole
    encode+decode mapInPandas lineage, doubling the dominant
    pure-Python PNG cost; with the diamond materialized every image
    decodes exactly once."""
    docs = load(spark, sf_dir, "documents")
    # corpus size from parquet footers, not an eager docs.count()
    # Spark job at plan-construction time (r8 ADVICE): a query
    # builder must stay side-effect-free, and the scheme pick only
    # needs metadata. Soak callers can pass scheme explicitly; the
    # footer count still feeds the broadcast gate (r14).
    n_docs = table_rows_metadata(sf_dir, "documents")
    if scheme is None:
        if n_docs >= _AHASH_PROBE3_SWITCH:
            scheme = "probe3"
        elif n_docs >= _AHASH_PROBE_SWITCH:
            scheme = "probe"
        else:
            scheme = "banded"
    hashes = M.image_ahash(docs).localCheckpoint(eager=False)
    return _ahash_candidates(hashes, scheme, n_docs=n_docs).filter(
        F.col("hamming") <= 8
    )


_IMAGE_DEDUP_PAIRS_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id - doc_id % 5 AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
         doc_id % 5 AS f
  FROM documents
),
hashes AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(h, list_transform(
             generate_series(0, f - 1),
             j -> (CAST(1 AS BIGINT) << CAST(
                    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 60
                  AS INTEGER))
           )),
           (acc, m) -> xor(acc, m)
         ) AS ahash
  FROM base
),
bands AS (
  SELECT doc_id, ahash, t.j AS band, (ahash >> CAST(6 * t.j AS INTEGER)) & 63 AS key
  FROM hashes, range(0, 10) t(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         bit_count(xor(a.ahash, b.ahash)) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
FROM cand WHERE hamming <= 8
"""


def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star composition as ONE registered query: quality
    gate → exact dedup → near-dup survivors → semantic survivors →
    sequence packing. Each stage filters the previous stage's
    survivor set (pair generation runs ON the survivors, exactly as a
    production corpus build would), and the output is the final
    packing layout — doc_id, shard, token count, start offset,
    (pack_id, pack_offset).

    Stages reuse the per-stage operators verbatim: gopher_rules_df
    (filters.py), min-id exact dedup, ngram_jaccard_pairs with the
    smaller-id-wins drop rule (the SQL-verifiable batch twin of the
    MinHash incremental path — llm_dedup_minhash_survivors carries the
    signature variant, rows-only), SemDeDup smaller-id-wins over
    IVF-candidate cosine pairs (recall 1.0 at this operating point —
    see q_semdedup; documents without an embedding pass through), and
    the q_seq_packing shard/cumsum layout.

    Scale shape: a scan + one gate agg + one exact-dedup shuffle + the
    one-shuffle pair pipeline + a cell equi-join + one windowed cumsum
    per shard — every stage is the same plan the standalone query
    runs, so the 100x posture is inherited stage by stage."""
    from .filters import gopher_rules_df
    from .relational import split_bucket

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    # 1 — quality gate
    passing = gopher_rules_df(docs).filter("passes").select("doc_id")
    gated = docs.join(passing, "doc_id", "left_semi")

    # 2 — exact dedup: keep the min doc_id per text
    keep_exact = gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    exact_docs = gated.join(keep_exact.select("doc_id"), "doc_id", "left_semi")

    # 3 — near-dup survivors: drop the b_id side (a_id < b_id ⇔ a
    # smaller-id match exists) of the exact n-gram Jaccard pair set
    nd_dropped = (
        D.ngram_jaccard_pairs(exact_docs, k=3, threshold=0.5, max_doc_freq=100)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    # nd_docs feeds BOTH the semantic-pair source and the final
    # anti-join: without a checkpoint the gate→exact-dedup→ngram-pair
    # subtree sits twice in the DAG (exchange reuse does not reliably
    # catch it across the join boundary). localCheckpoint materializes
    # it once on the executors and truncates the lineage — the same
    # discipline connected_components applies to its edge set.
    # r14 (r13 verdict #6, job-count audit): the checkpoint is LAZY
    # and the IVF stage's cell-count sizing scan (sem_src.count()
    # inside neardup_pairs_ivf_candidates, which runs at plan-build
    # time and references nd_docs exactly ONCE) is the materializing
    # action — one query runs the gate→dedup→pair pipeline AND counts
    # the semantic source, where the eager checkpoint previously spent
    # a dedicated materialization pass first. Counted with the
    # job-group profiler at sf0.1: plan-build jobs 19 → 18 (the one
    # removed is the eager checkpoint's own job; the rest are the
    # count query's AQE per-stage jobs and the centroid sampler),
    # wall flat at sf0.1 within the box's noise band. The r8
    # single-reference invariant holds by ordering: the count (below,
    # inside the candidates call) runs before any plan references
    # nd_docs twice.
    nd_docs = exact_docs.join(nd_dropped, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )

    # 4 — semantic survivors over the remaining docs' embeddings
    sem_src = emb.join(
        nd_docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    sem_pairs = S.neardup_pairs_ivf_candidates(sem_src, threshold=0.45)
    sem_dropped = sem_pairs.select(F.col("b_id").alias("doc_id")).distinct()
    final_docs = nd_docs.join(sem_dropped, "doc_id", "left_anti")

    # 5 — concat-and-chunk packing layout (q_seq_packing semantics)
    n_tok = F.size(F.split("text", " ")).cast("long")
    shard = split_bucket(F.col("doc_id"), _BUILD_PACK_SHARDS)
    sized = final_docs.select("doc_id", shard.alias("shard"), n_tok.alias("n_tokens"))
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    return (
        sized.withColumn("start_offset", cum - F.col("n_tokens"))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            "start_offset",
            F.expr(f"start_offset div {_BUILD_PACK_TARGET}").alias("pack_id"),
            (F.col("start_offset") % F.lit(_BUILD_PACK_TARGET)).alias("pack_offset"),
        )
    )


def _corpus_build_sql() -> str:
    from .relational import split_bucket_sql
    from .filters import _GOPHER_RULES_SQL

    return f"""
WITH passing AS (SELECT doc_id FROM ({_GOPHER_RULES_SQL}) WHERE passes),
gated AS (SELECT d.doc_id, d.text FROM documents d JOIN passing USING (doc_id)),
exact_keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
exact_docs AS (SELECT g.doc_id, g.text FROM gated g JOIN exact_keep USING (doc_id)),
nd_drop AS (
  SELECT DISTINCT b_id AS doc_id FROM ({_ngram_jaccard_sql('exact_docs')})
),
nd_docs AS (
  SELECT * FROM exact_docs WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop)
),
sem_src AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM nd_docs)
),
sem_drop AS (
  SELECT DISTINCT b.vec_id AS doc_id
  FROM sem_src a JOIN sem_src b ON a.vec_id < b.vec_id
  WHERE round({_cos_sql('a.embedding', 'b.embedding')}, 6) >= 0.45
),
final AS (
  SELECT doc_id, text FROM nd_docs
  WHERE doc_id NOT IN (SELECT doc_id FROM sem_drop)
),
sized AS (
  SELECT doc_id,
    {split_bucket_sql('doc_id', _BUILD_PACK_SHARDS)} AS shard,
    len(str_split(text, ' ')) AS n_tokens
  FROM final
),
cumd AS (
  SELECT doc_id, shard, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
      AS start_offset
  FROM sized
)
SELECT doc_id, shard, n_tokens, start_offset,
  CAST(start_offset // {_BUILD_PACK_TARGET} AS BIGINT) AS pack_id,
  CAST(start_offset % {_BUILD_PACK_TARGET} AS BIGINT) AS pack_offset
FROM cumd
"""


QUERIES = {
    "llm_text_stats": q_text_stats,
    "llm_lang_id": q_lang_id,
    "llm_fingerprint": q_fingerprint,
    "llm_quality": q_quality,
    "llm_dedup_exact": q_dedup_exact,
    "llm_dedup_ngram_jaccard": q_ngram_jaccard,
    "llm_dedup_minhash_lsh": q_minhash_lsh,
    "llm_dedup_simhash_pairs": q_simhash_pairs,
    "llm_emb_cosine_topk": q_cosine_topk,
    "llm_emb_neardup": q_emb_neardup,
    "llm_emb_ann_lsh": q_emb_ann_lsh,
    "llm_emb_ann_ivf": q_emb_ann_ivf,
    "llm_emb_ann_pq": q_emb_ann_pq,
    "llm_emb_quantize": q_emb_quantize,
    "llm_knn_classify": q_knn_classify,
    "llm_dedup_clusters": q_dedup_clusters,
    "llm_image_dedup_pairs": q_image_dedup_pairs,
    "llm_semdedup": q_semdedup,
    "llm_semdedup_survivors": q_semdedup_survivors,
    "llm_corpus_pipeline": q_corpus_pipeline,
    "llm_corpus_build": q_corpus_build,
    "llm_multimodal_features": q_multimodal_features,
    "llm_multimodal_frames": q_multimodal_frames,
    "llm_multimodal_png": q_multimodal_png,
    "llm_multimodal_jpeg": q_multimodal_jpeg,
    "llm_multimodal_gif": q_multimodal_gif,
    "llm_multimodal_wav": q_multimodal_wav,
    "llm_multimodal_flac": q_multimodal_flac,
    "llm_multimodal_avi": q_multimodal_avi,
}

ORACLE = {
    "llm_text_stats": _TEXT_STATS_SQL,
    "llm_lang_id": _LANG_ID_SQL,
    "llm_fingerprint": _FINGERPRINT_SQL,
    "llm_quality": _QUALITY_SQL,
    "llm_dedup_exact": _DEDUP_EXACT_SQL,
    "llm_dedup_ngram_jaccard": _ngram_jaccard_oracle_sql,
    "llm_dedup_minhash_lsh": _minhash_lsh_sql(),
    "llm_dedup_simhash_pairs": _simhash_pairs_sql(),
    "llm_emb_cosine_topk": _COSINE_TOPK_SQL,
    "llm_emb_neardup": _EMB_NEARDUP_SQL,
    "llm_emb_ann_lsh": _emb_ann_lsh_sql,
    # callables: resolved by plans.all_oracles with the verify sf_dir —
    # these twins inline data-derived trained literals (see generators)
    "llm_emb_ann_ivf": _emb_ann_ivf_sql,
    "llm_emb_ann_pq": _emb_ann_pq_sql,
    "llm_emb_quantize": _EMB_QUANTIZE_SQL,
    "llm_knn_classify": _KNN_CLASSIFY_SQL,
    "llm_dedup_clusters": _dedup_clusters_sql,
    "llm_image_dedup_pairs": _IMAGE_DEDUP_PAIRS_SQL,
    "llm_semdedup": _semdedup_sql,
    "llm_semdedup_survivors": _semdedup_survivors_sql,
    "llm_corpus_pipeline": _CORPUS_PIPELINE_SQL,
    "llm_corpus_build": _corpus_build_sql(),
    "llm_multimodal_features": _MULTIMODAL_FEATURES_SQL,
    "llm_multimodal_frames": _MULTIMODAL_FRAMES_SQL,
    "llm_multimodal_png": _MULTIMODAL_PNG_SQL,
    "llm_multimodal_jpeg": _MULTIMODAL_JPEG_SQL,
    "llm_multimodal_gif": _MULTIMODAL_GIF_SQL,
    "llm_multimodal_wav": _MULTIMODAL_WAV_SQL,
    "llm_multimodal_flac": _MULTIMODAL_FLAC_SQL,
    "llm_multimodal_avi": _MULTIMODAL_AVI_SQL,
}
