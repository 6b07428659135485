"""Byte-pair-encoding tokenizer: distributed merge-table training and
merge-driven encoding (north-star extension, BASELINE.json: "token
counting" grown into a real trainable tokenizer — the step every
LLM-data pipeline runs between curation and packing).

Algorithm is the public BPE of Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units"): start from characters
(+ an end-of-word marker), repeatedly merge the most frequent adjacent
symbol pair, record the merge table; encoding replays the merges in
rank order.

Scale shape (the part that matters at 100 TB):

- Training never iterates over documents. One scan + one shuffle
  builds the WORD-TYPE table (word, freq) — Heaps-law sized
  (vocabulary grows ~ corpus^0.5), orders of magnitude smaller than
  the corpus — and every merge round is one `groupBy(pair).sum(freq)`
  shuffle over word types plus a 1-ROW `TakeOrderedAndProject` to the
  driver (the argmax pair). k merges = k small shuffles; the corpus
  is read exactly once. Per-round `localCheckpoint` truncates the
  fold lineage exactly like operators/clustering.py does for label
  propagation.
- Merge application is a pure Catalyst expression (no Python in the
  hot path): symbols live as a \\x1f-separated string; one merge pass
  is `F.aggregate` (a left fold) over the symbol array with a string
  accumulator. Encoding a document = chain of k such folds — a single
  whole-stage-codegen projection over the corpus scan.

Correctness of the fold (= one greedy left-to-right non-overlapping
merge pass, exactly Sennrich's `merge_vocab`):

- the accumulator keeps a leading separator, so "last emitted symbol
  == lhs" is exactly `ends_with(acc, SEP+lhs+SEP)` — symbols never
  contain SEP, so no mid-symbol suffix can false-match (a plain
  string replace() WOULD false-match when a symbol's suffix equals
  lhs; that bug is pinned in tests/test_bpe.py);
- a symbol merged this pass can never immediately re-merge as lhs,
  because merged = lhs||rhs and rhs is non-empty, so merged != lhs —
  giving the non-overlapping guarantee on runs like [a,a,a,a].

Cross-word safety of DOC-level encoding: a trained pair's lhs never
contains the end-of-word marker (a marker-bearing symbol is word-final
in every word representation, hence never has a successor during
training), so folding a whole document's symbol stream — words
separated by their end-of-word markers — can never merge across a
word boundary. Encoding therefore runs one fold chain per document
instead of exploding to words and reassembling.

Reference parity note: the reference has no tokenizer; this extends
its text surface (consumer word-level processing,
consumer/src/.../SparkDynamoDBConsumer.java) the way BASELINE.json's
"text analysis" extension mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Symbol separator and end-of-word marker. Control characters outside
# any text corpus alphabet; the word-type builder drops the (never
# observed) words containing them rather than corrupting the symbol
# stream, and the DuckDB twins (plans/tokenize.py) apply the same
# guard with chr(31)/chr(30).
SEP = "\x1f"
EOW = "\x1e"
# Display form of the end-of-word marker in emitted merge tables /
# token heads (the Sennrich convention).
EOW_DISPLAY = "</w>"


def _symbols(repr_col: Column) -> Column:
    """Symbol array from a SEP-delimited representation string.
    Filtering empties (instead of position slicing) tolerates both
    leading and trailing separators, and no real symbol is empty."""
    return F.filter(F.split(repr_col, SEP), lambda x: x != F.lit(""))


def word_repr(word: Column) -> Column:
    """Initial representation of a word: its characters + EOW, each
    followed by SEP ("ab" -> "a␟b␟␞␟")."""
    chars = F.concat(F.split(word, ""), F.array(F.lit(EOW)))
    return F.concat(F.array_join(chars, SEP), F.lit(SEP))


def doc_repr(text: Column) -> Column:
    """Whole-document symbol stream: words separated by EOW markers
    ("ab cd" -> "a␟b␟␞␟c␟d␟␞␟") — concatenation of the per-word
    representations, so the k-fold encode chain below reproduces
    per-word encoding exactly (see cross-word safety note above)."""
    chars = F.split(F.concat(F.replace(text, F.lit(" "), F.lit(EOW)), F.lit(EOW)), "")
    return F.concat(F.array_join(chars, SEP), F.lit(SEP))


def merge_pass(repr_col: Column, lhs: Column, rhs: Column) -> Column:
    """One greedy merge pass of (lhs, rhs) over a representation
    string; returns the new representation string (leading SEP
    stripped is NOT needed — _symbols tolerates it)."""
    pat = F.concat(F.lit(SEP), lhs, F.lit(SEP))
    folded = F.aggregate(
        _symbols(repr_col),
        F.lit(SEP),
        lambda acc, s: F.when(
            (s == rhs) & F.endswith(acc, pat),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.length(lhs) - 1),
                lhs,
                rhs,
                F.lit(SEP),
            ),
        ).otherwise(F.concat(acc, s, F.lit(SEP))),
    )
    return folded


def adjacent_pairs(repr_col: Column) -> Column:
    """Array of (lhs, rhs) structs for every adjacent symbol position
    (overlapping positions counted, as in Sennrich's get_stats)."""
    syms = _symbols(repr_col)
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, F.lit(1), n - 1),
        F.slice(syms, F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(freq, repr) per distinct word — the Heaps-law-sized training
    table. One explode + one shuffle over the corpus; everything after
    runs on word types only."""
    from .dedup import _spread

    word = F.explode(F.split(F.col(text_col), " ")).alias("word")
    return (
        _spread(docs).select(word)
        .where((F.col("word") != "") & ~F.col("word").contains(SEP) & ~F.col("word").contains(EOW))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select("freq", word_repr(F.col("word")).alias("repr"))
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt) over the word-type table, freq-weighted."""
    return (
        words.select("freq", F.explode(adjacent_pairs(F.col("repr"))).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("cnt"))
    )


def train(docs: DataFrame, num_merges: int, text_col: str = "text") -> list[tuple]:
    """Learn `num_merges` merges; returns [(merge_rank, lhs, rhs, cnt)]
    with raw (undisplayed) symbol text. Driver traffic is one 1-row
    argmax per round; the word table stays distributed and is
    localCheckpoint-ed per round so the fold lineage never deepens."""
    # r13 opt: checkpoints are LAZY — each round's 1-row argmax job is
    # what materializes the (tiny, Heaps-law-sized) word table, so a
    # round runs ONE job instead of an eager-checkpoint job plus the
    # argmax job. Round latency, not data volume, dominates this loop
    # (the r13 bench: the word table is a few thousand rows at any
    # tested sf while each extra job costs ~0.1 s of scheduling).
    # Lineage still truncates at every round: the checkpoint persists
    # during the argmax job and the next round's projection reads the
    # persisted partitions.
    words = word_types(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple] = []
    for rank in range(1, num_merges + 1):
        best = (
            pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .first()
        )
        if best is None:  # corpus exhausted (every word a single symbol)
            break
        merges.append((rank, best["lhs"], best["rhs"], int(best["cnt"])))
        words = words.select(
            "freq",
            merge_pass(F.col("repr"), F.lit(best["lhs"]), F.lit(best["rhs"])).alias("repr"),
        ).localCheckpoint(eager=False)
    return merges


def encode_expr(text: Column, merges: list[tuple]) -> Column:
    """Representation string of `text` after replaying all merges in
    rank order — one chained-fold Catalyst expression. The reference
    semantics (and the DuckDB twin's statement of them); the string
    accumulator makes each pass O(stream²) in characters, so `encode`
    below only points this at BOUNDED strings (single words, 12-word
    heads), never whole documents."""
    rep = doc_repr(text)
    for _rank, lhs, rhs, _cnt in merges:
        rep = merge_pass(rep, F.lit(lhs), F.lit(rhs))
    return rep


def display(sym: Column) -> Column:
    """EOW marker rendered as the conventional '</w>'."""
    return F.replace(sym, F.lit(EOW), F.lit(EOW_DISPLAY))


def encode(docs: DataFrame, merges: list[tuple], text_col: str = "text",
           head: int = 12) -> DataFrame:
    """Per-document token accounting under a trained merge table:
    doc_id, n_words, n_bpe_tokens, head_tokens (first `head` tokens,
    display form, space-joined).

    Scale shape — the same Heaps-law trick training uses, applied to
    EVERYTHING (r7 verdict #4): the fold chain runs once per DISTINCT
    word (bounded-length strings, so the fold's quadratic constant is
    capped at word length), emitting each word's token ARRAY; per-doc
    token counts AND the head tokens come back through one equi-join +
    re-aggregation. head_tokens is the first `head` tokens of the
    in-order concatenation of the doc's first `head` words' token
    arrays — exactly the document fold's prefix, because cross-word
    merges are impossible (see module docstring) and every word
    contributes ≥1 token. Folding whole documents instead measures
    ~25× slower at sf1 (the string accumulator is O(doc²) per pass)
    while computing the same thing — pinned equal in tests/test_bpe.py;
    the r7 soak showed the remaining per-doc head fold WAS the 90 s
    sf10 tail (500k docs × k chained folds vs a closed vocabulary's
    ~31 distinct words)."""
    from .dedup import _spread

    # spread the scan before the ~100×-fanout posexplode: sf10's
    # single-file table reads as 13 skewed splits, and BOTH consumers
    # of `exploded` (the distinct-word side and the per-doc join) were
    # re-running the explode at 13-way parallelism behind one
    # straggler task — measured as the dominant wall of the sf10
    # encode (the two (12+1)/13 stages). At cluster scale the scan
    # arrives in thousands of splits and _spread skips the shuffle.
    words = F.split(F.col(text_col), " ")
    exploded = _spread(docs).select("doc_id", F.posexplode(words).alias("pos", "word"))
    word_toks = (
        exploded.select("word")
        .distinct()
        .select("word", _symbols(encode_expr(F.col("word"), merges)).alias("toks"))
    )
    per_doc = (
        exploded.join(word_toks, "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("word") != "", 1).otherwise(0)).cast("long").alias("n_words"),
            F.sum(F.size("toks")).cast("long").alias("n_bpe_tokens"),
            F.slice(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("pos") < head,
                                    F.struct(F.col("pos"), F.col("toks")),
                                )
                            )
                        ),
                        lambda s: s["toks"],
                    )
                ),
                1,
                head,
            ).alias("head_toks"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        "n_bpe_tokens",
        display(F.array_join("head_toks", " ")).alias("head_tokens"),
    )
