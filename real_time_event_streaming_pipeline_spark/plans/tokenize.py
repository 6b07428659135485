"""BPE tokenizer queries: merge-table training and corpus encoding,
with fully bitwise DuckDB twins that REPLAY the training — each merge
round is a staged CTE (pair counts -> 1-row argmax -> fold-applied
merge), so the oracle derives the identical merge table from the same
parquet rather than trusting Spark's.

Both engines run the exact same algorithm (operators/bpe.py module
docstring): greedy left-to-right merge passes as a left fold over the
symbol stream — `F.aggregate` in Spark, `list_reduce` in DuckDB —
with binary-UTF8 (cnt DESC, lhs, rhs) argmax tie-breaking, so every
value (symbol text and exact integer pair counts) compares bitwise.

The CTEs are AS MATERIALIZED: round N references round N-1 once in
its pair scan and its 1-row argmax three more times in the fold
lambda; without materialization DuckDB inlines the chain and the plan
grows 4^k copies of the corpus scan (observed as an fd blow-up at
k=8 before the first row moved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import load
from ..operators import bpe as B

# Merge-table depth for the registered queries: deep enough that the
# learned table contains multi-level merges (merged symbols merging
# again — ranks 6/8 at sf0.001 are ('er','\x1e') and ('ow','\x1e')),
# shallow enough that the unrolled 8-round SQL twin stays readable.
NUM_MERGES = 8

_MERGES_SCHEMA = T.StructType(
    [
        T.StructField("merge_rank", T.IntegerType()),
        T.StructField("lhs", T.StringType()),
        T.StructField("rhs", T.StringType()),
        T.StructField("merged", T.StringType()),
        T.StructField("pair_count", T.LongType()),
    ]
)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned merge table over the documents corpus: one row per
    merge (rank, pair, merged symbol, freq-weighted pair count). The
    heavy lifting is distributed (operators/bpe.train); the result is
    inherently driver-sized (k rows)."""
    docs = load(spark, sf_dir, "documents")
    merges = B.train(docs, NUM_MERGES)
    disp = lambda s: s.replace(B.EOW, B.EOW_DISPLAY)  # noqa: E731
    rows = [(rank, disp(l), disp(r), disp(l + r), cnt) for rank, l, r, cnt in merges]
    return spark.createDataFrame(rows, _MERGES_SCHEMA)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting for every document under the merge table
    trained on the SAME corpus (the self-trained-tokenizer pass a
    data pipeline runs to size a training mix): doc_id, n_words,
    n_bpe_tokens, first tokens in display form."""
    docs = load(spark, sf_dir, "documents")
    merges = B.train(docs, NUM_MERGES)
    return B.encode(docs, merges)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

# Clean symbol list from a representation string (tolerates leading
# and trailing separators, mirroring operators/bpe._symbols).
_SYMS = "list_filter(string_split({repr}, chr(31)), x -> x <> '')"

# One fold-based merge pass of the 1-row argmax relation `b` over
# representation column `repr` (mirrors operators/bpe.merge_pass).
_FOLD = """list_reduce(
      list_prepend(chr(31), {syms}),
      (acc, s) -> CASE
        WHEN s = b.rhs AND ends_with(acc, chr(31) || b.lhs || chr(31))
        THEN substr(acc, 1, length(acc) - length(b.lhs) - 1) || b.lhs || b.rhs || chr(31)
        ELSE acc || s || chr(31) END
    )"""


def _training_ctes(num_merges: int) -> list[str]:
    """The shared training replay: words -> r0, then per round i the
    pair counts p_i, the argmax b_i, and (until the last round) the
    merged representations r_i."""
    ctes = [
        """words AS MATERIALIZED (
  SELECT count(*)::BIGINT AS freq,
         regexp_replace(word || chr(30), '(.)', '\\1' || chr(31), 'g') AS repr
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND NOT contains(word, chr(31)) AND NOT contains(word, chr(30))
  GROUP BY word
)""",
        "r0 AS MATERIALIZED (SELECT freq, repr FROM words)",
    ]
    syms = _SYMS.format(repr="repr")
    for i in range(1, num_merges + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT p[1] AS lhs, p[2] AS rhs, sum(freq)::BIGINT AS cnt
  FROM (
    SELECT freq, unnest(list_zip(s[1:len(s)-1], s[2:len(s)])) AS p
    FROM (SELECT freq, {syms} AS s FROM r{i - 1})
  )
  GROUP BY p[1], p[2]
)"""
        )
        ctes.append(
            f"b{i} AS MATERIALIZED "
            f"(SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
        )
        if i < num_merges:
            fold = _FOLD.format(syms=syms)
            ctes.append(
                f"""r{i} AS MATERIALIZED (
  SELECT freq, {fold} AS repr
  FROM r{i - 1}, b{i} AS b
)"""
            )
    return ctes


def _bpe_train_sql(num_merges: int = NUM_MERGES) -> str:
    ctes = ",\n".join(_training_ctes(num_merges))
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, lhs, rhs, cnt FROM b{i}" for i in range(1, num_merges + 1)
    )
    return f"""WITH {ctes}
SELECT merge_rank,
       replace(lhs, chr(30), '</w>') AS lhs,
       replace(rhs, chr(30), '</w>') AS rhs,
       replace(lhs || rhs, chr(30), '</w>') AS merged,
       cnt AS pair_count
FROM ({unions})
"""


def _bpe_encode_sql(num_merges: int = NUM_MERGES, head: int = 12) -> str:
    ctes = _training_ctes(num_merges)
    ctes.append(
        """e0 AS MATERIALIZED (
  SELECT doc_id, text,
         regexp_replace(replace(text, ' ', chr(30)) || chr(30), '(.)', '\\1' || chr(31), 'g') AS repr
  FROM documents
)"""
    )
    syms = _SYMS.format(repr="repr")
    for i in range(1, num_merges + 1):
        fold = _FOLD.format(syms=syms)
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT doc_id, text, {fold} AS repr
  FROM e{i - 1}, b{i} AS b
)"""
        )
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT doc_id,
       len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_words,
       len(s)::BIGINT AS n_bpe_tokens,
       replace(array_to_string(s[1:{head}], ' '), chr(30), '</w>') AS head_tokens
FROM (SELECT doc_id, text, {syms} AS s FROM e{num_merges})
"""


QUERIES = {
    "llm_bpe_train": q_bpe_train,
    "llm_bpe_encode": q_bpe_encode,
}

ORACLE = {
    "llm_bpe_train": _bpe_train_sql(),
    "llm_bpe_encode": _bpe_encode_sql(),
}
