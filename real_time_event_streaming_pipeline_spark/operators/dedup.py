"""Deduplication operators (north-star extension): exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale design:
- Exact dedup is a hash groupBy on the content hash — one shuffle of
  (hash, id), never the payload.
- N-gram Jaccard prunes with a document-frequency cap on shingles
  before the candidate self-join (the classic "stop-shingle" guard):
  without it one common shingle in every doc makes the join quadratic.
- MinHash/LSH: signatures via xxhash64 (JVM-side, deterministic) with
  (a·h+b mod p) permutations; banding turns near-dup search into an
  equi-join on (band, band_hash) — linear shuffle, no pairwise scan.
- SimHash: explode tokens → per-bit ±1 sums → reassemble a 32-bit
  signature; hamming-adjacent buckets give candidates.

MinHash/SimHash signatures depend on Spark's xxhash64, which DuckDB
cannot reproduce — those queries are rows-only for the driver and are
instead validated in tests/ against exact-Jaccard ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hashing modulus kept at 31 bits so
# a·h never exceeds 2^62 (Spark 4 runs ANSI mode — long overflow throws).
_MERSENNE = (1 << 31) - 1
# Deterministic permutation parameters (golden-ratio LCG constants).
_PERM_A = 0x9E3779B97F4A7C15
_PERM_B = 0xC2B2AE3D27D4EB4F


def _perm(i: int) -> tuple[int, int]:
    a = (_PERM_A * (i + 1)) % _MERSENNE or 1
    b = (_PERM_B * (i + 1)) % _MERSENNE
    return a, b


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical content; keep the minimum id as representative."""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias(id_col),
        F.count("*").alias("n_copies"),
    )


def exact_dedup_by_hash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Same, but shuffle only (md5, id) — at 100 TB the payload never
    moves; winners join back to content if needed."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def _shingle_expr(toks, k: int):
    """k-word shingles from a token-array column. Explicit < k guard:
    sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty — it
    would fabricate shingles for short docs."""
    return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )


def shingles(text, k: int = 3):
    """k-word shingles as an array column (higher-order functions —
    stays in codegen)."""
    return _shingle_expr(F.split(text, " "), k)


def doc_shingles(df: DataFrame, k: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) distinct pairs.

    The input table often arrives in a handful of file-partitions; the
    shingle expression is CPU-heavy per row, so repartition first to
    spread the explode across all cores (at cluster scale: across
    executors). Text is split once, not once per sub-expression."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        df.select(F.col(id_col), F.split("text", " ").alias("_toks"))
        .repartition(n_part)
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(_shingle_expr(F.col("_toks"), k))).alias("shingle"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    candidate generation = self-equi-join on shingle (after dropping
    shingles with document frequency > max_doc_freq); verification =
    |∩| / (|A|+|B|-|∩|) ≥ threshold. Both stages are shuffles on keys,
    no cartesian anywhere.

    Physical shape (matters at 100 TB): the exploded shingle set is
    shuffled ONCE (window count over shingle = the df-cap filter) and
    self-joined on that partitioning; the per-doc size join uses plain
    equi-joins so Catalyst/AQE picks broadcast only when the corpus is
    actually small (a forced broadcast of a per-document table would
    OOM the driver at scale).
    """
    w = Window.partitionBy("shingle")
    sh = (
        doc_shingles(df, k, id_col)
        .withColumn("_df", F.count("*").over(w))
        .filter(F.col("_df") <= max_doc_freq)
        .drop("_df")
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("a_id"), F.col("n_sh").alias("a_n")),
            "a_id",
        )
        .join(
            sizes.select(F.col(id_col).alias("b_id"), F.col("n_sh").alias("b_n")),
            "b_id",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("a_n") + F.col("b_n") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_common", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, k: int = 3, num_hashes: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sig array<long>): sig[i] = min over shingles of
    (a_i * xxhash64(shingle) + b_i) mod 2^61-1."""
    sh = doc_shingles(df, k, id_col).withColumn(
        "h", F.abs(F.xxhash64("shingle")) % _MERSENNE
    )
    mins = sh.groupBy(id_col).agg(
        *[
            F.min((F.col("h") * F.lit(_perm(i)[0]) + F.lit(_perm(i)[1])) % _MERSENNE).alias(
                f"m{i}"
            )
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col), F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: docs agreeing on any full band of the signature
    become candidates; estimated Jaccard = fraction of matching hashes.

    rows/bands = 4 → catches pairs with true Jaccard ≳ 0.5 w.h.p.
    The join key is (band_index, hash-of-band) — pure equi-join.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, k, num_hashes, id_col)
    banded = sig.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "sig", "bk.band", "bk.bhash")
    a = banded.select(
        F.col(id_col).alias("a_id"), F.col("sig").alias("a_sig"), "band", "bhash"
    )
    b = banded.select(
        F.col(id_col).alias("b_id"), F.col("sig").alias("b_sig"), "band", "bhash"
    )
    cand = (
        a.join(b, ["band", "bhash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .dropDuplicates(["a_id", "b_id"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("a_sig", "b_sig", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return cand.select(
        "a_id",
        "b_id",
        F.round(matches.cast("double") / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
    )


def simhash(df: DataFrame, bits: int = 32, id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over word tokens: per-bit ±1 vote sums from
    xxhash64(token), reassembled into one long. One explode + one
    groupBy; all expression-level."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    tok = (
        df.select(F.col(id_col), F.array_distinct(F.split("text", " ")).alias("_toks"))
        .repartition(n_part)
        .select(F.col(id_col), F.explode("_toks").alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << i).cast("long")
        sig = term if sig is None else sig + term
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame, bits: int = 32, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pairs with hamming(simhash) ≤ max_hamming, blocked on
    max_hamming+1 disjoint bit-blocks: by pigeonhole, ≤ max_hamming
    differing bits cannot touch every block, so some block matches
    exactly and the blocked equi-join has NO false negatives."""
    n_blocks = max_hamming + 1
    block_bits = bits // n_blocks
    sig = simhash(df, bits, id_col)
    mask = (1 << block_bits) - 1
    blocked = sig.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright(F.col("simhash"), b * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .cast("long")
                        .alias("key"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.blk", "bk.key")
    a = blocked.select(F.col(id_col).alias("a_id"), F.col("simhash").alias("a_sig"), "blk", "key")
    b = blocked.select(F.col(id_col).alias("b_id"), F.col("simhash").alias("b_sig"), "blk", "key")
    ham = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
    return (
        a.join(b, ["blk", "key"])
        .filter(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
