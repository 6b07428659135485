"""Text-analysis operators over a document corpus (north-star
extension, BASELINE.json: "text analysis" for LLM data pipelines).

Everything here is built-in Column expressions (whole-stage codegen,
no Python in the hot path): at 100 TB these run as a single scan +
projection with no shuffle at all. Tokenization is a plain
single-space split so the DuckDB oracle can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword sets for the n-gram language-ID heuristic. The corpus
# vocabulary is synthetic, so the heuristic is judged on determinism
# (oracle-matched), not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "y", "los"),
}

# BPE-ish token regex: letter runs, digit runs, single punctuation.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def n_distinct_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")


def avg_token_len(text: Column) -> Column:
    """Mean token length. Deliberately NOT rounded: the value is one
    integer/integer division, bitwise identical in any IEEE engine,
    whereas round() on an exact .5 boundary differs between Spark
    (decimal-string HALF_UP) and DuckDB (binary round)."""
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def stopword_count(text: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words))).cast("long")


def predicted_lang(text: Column) -> Column:
    """Argmax of stopword hit counts; 'und' (undetermined) when no
    stopwords hit. Ties broken by language-code order for determinism."""
    counts = [(lang, stopword_count(text, lang)) for lang in sorted(LANG_STOPWORDS)]
    best = None
    best_lang = F.lit("und")
    for lang, cnt in counts:
        if best is None:
            best = cnt
            best_lang = F.when(cnt > 0, F.lit(lang)).otherwise(F.lit("und"))
        else:
            best_lang = F.when(cnt > best, F.lit(lang)).otherwise(best_lang)
            best = F.greatest(best, cnt)
    return best_lang


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set — a deterministic, SQL-expressible stand-in for
    a rolling-hash fingerprint; collisions ≡ same bag-of-words."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length saturation + lexical
    diversity + stopword plausibility. Unrounded — the expression tree
    is evaluated in the same order on both engines, so raw doubles
    compare exactly (see avg_token_len note)."""
    toks = tokens(text)
    n = F.size(toks).cast("double")
    length_part = F.least(n / F.lit(64.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    stop = stopword_count(text, "en").cast("double") / n
    stop_part = F.least(stop * F.lit(4.0), F.lit(1.0))
    return F.lit(0.4) * length_part + F.lit(0.4) * diversity + F.lit(0.2) * stop_part


# PII patterns for training-data scrubbing. Kept to the regex subset
# Java (Spark) and RE2 (DuckDB oracle) evaluate identically: character
# classes, bounded repetition, \b word boundaries — no lookaround.
# Insertion order IS the redaction order; applying the replacements in
# a fixed sequence keeps the output deterministic when patterns could
# overlap (ssn before phone: both are digit-dash shapes).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class, measured on the ORIGINAL text
    (before any redaction) so the counts are independent of redaction
    order."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder token. A chain
    of regexp_replace — scan-side projection, whole-stage codegen, no
    shuffle; at 100 TB this is a free rider on any pass that already
    reads the text column."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<pii:{name}>")
    return out


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis feature set in one projection."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", n_tokens(t))
        .withColumn("n_distinct_tokens", n_distinct_tokens(t))
        .withColumn("avg_token_len", avg_token_len(t))
        .withColumn("bpe_tokens", bpe_ish_token_count(t))
        .withColumn("pred_lang", predicted_lang(t))
        .withColumn("fingerprint", fingerprint(t))
        .withColumn("quality", quality_score(t))
    )
