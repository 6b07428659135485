"""CorpusEngine — the user-facing API for the LLM-data pipeline
(the north-star extension surface, BASELINE.json), parallel to
engine.CityStreamEngine for the reference's REST surface: every
curation operation as a parameterized method returning a DataFrame.
The oracle-checked plans in plans/llmdata.py and plans/curation.py
pin these same shapes with fixed parameters.

    corp = CorpusEngine(spark, "/root/testdata/sf0.01")
    corp.quality()                       # per-doc quality features
    corp.near_duplicates(threshold=0.8)  # exact n-gram Jaccard pairs
    corp.dedup()                         # one representative per cluster
    corp.contamination()                 # test docs sharing 5-grams with train
    corp.sample(rate_per_mille=50)       # deterministic Bernoulli sample
    corp.neighbors(k=10)                 # embedding ANN top-k
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load
from .operators import dedup as D
from .operators import similarity as S
from .operators import text as T
from .operators.clustering import connected_components
from .plans.relational import split_bucket


class CorpusEngine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def _docs(self) -> DataFrame:
        return load(self.spark, self.sf_dir, "documents")

    def _emb(self) -> DataFrame:
        return load(self.spark, self.sf_dir, "embeddings")

    # -- text features ---------------------------------------------------

    def quality(self) -> DataFrame:
        """Per-document text features (token stats, language guess,
        quality score, fingerprint) — one scan, no shuffle."""
        return T.with_text_features(self._docs())

    def train_tokenizer(self, num_merges: int = 8) -> list[tuple]:
        """Learn a BPE merge table on this corpus (operators/bpe.py:
        word-type-table training, 1-row argmax per round). Returns
        [(rank, lhs, rhs, pair_count)] — small enough to hold, pass
        to tokenize()."""
        from .operators import bpe as B

        return B.train(self._docs(), num_merges)

    def tokenize(self, merges: list[tuple] | None = None,
                 num_merges: int = 8) -> DataFrame:
        """Per-document BPE token accounting (doc_id, n_words,
        n_bpe_tokens, head_tokens) under `merges` — or a table
        trained on this corpus when omitted. Fold-per-distinct-word
        + count join; linear in documents."""
        from .operators import bpe as B

        if merges is None:
            merges = B.train(self._docs(), num_merges)
        return B.encode(self._docs(), merges)

    def scrub_pii(self) -> DataFrame:
        """The corpus with PII redacted in place (typed placeholder
        tokens) + per-class match counts — scan-side projection, no
        shuffle. Patterns: operators.text.PII_PATTERNS."""
        docs = self._docs()
        t = F.col("text")
        return docs.select(
            "doc_id",
            T.redact_pii(t).alias("text"),
            "lang",
            "source",
            "n_chars",
            *T.pii_counts(t),
        )

    def keywords(self, top_k: int = 3) -> DataFrame:
        """Top-k TF-IDF terms per document."""
        from .plans.curation import q_tfidf

        return q_tfidf(self.spark, self.sf_dir, top_k=top_k)

    def token_rarity(self) -> DataFrame:
        """Per-doc corpus-frequency profile (exact-integer sums/min +
        one final division) — the rare-token outlier signal."""
        from .plans.curation import q_token_rarity

        return q_token_rarity(self.spark, self.sf_dir)

    # -- dedup -----------------------------------------------------------

    def near_duplicates(
        self, threshold: float = 0.5, k: int = 3, max_doc_freq: int = 100
    ) -> DataFrame:
        """Exact n-gram Jaccard near-dup pairs above `threshold`."""
        return D.ngram_jaccard_pairs(
            self._docs(), k=k, threshold=threshold, max_doc_freq=max_doc_freq
        )

    def near_duplicates_lsh(self, k: int = 3) -> DataFrame:
        """MinHash-LSH candidates — the sub-quadratic scale path."""
        return D.minhash_lsh_pairs(self._docs(), k=k)

    def dedup(self, threshold: float = 0.5) -> DataFrame:
        """The corpus with one representative document per near-dup
        cluster (min doc_id) — pairs → connected components →
        anti-join of the non-representatives."""
        docs = self._docs()
        pairs = D.ngram_jaccard_pairs(self._docs(), threshold=threshold)
        cc = connected_components(pairs)
        losers = cc.filter(F.col("vertex") != F.col("component")).select(
            F.col("vertex").alias("doc_id")
        )
        return docs.join(losers, "doc_id", "left_anti")

    def dedup_semantic(self, threshold: float = 0.45, pair_method: str = "ivf") -> DataFrame:
        """SemDeDup-style keep/drop per vector: embedding-cosine
        near-dup pairs (IVF candidates by default; exact blocked GEMM
        via pair_method='exact') → connected components → keep the
        min-id representative per cluster."""
        from .plans.llmdata import q_semdedup

        assert threshold == 0.45, "plan pins the registered threshold; use operators.similarity directly for other values"
        return q_semdedup(self.spark, self.sf_dir, pair_method=pair_method)

    def remove_duplicate_spans(self) -> DataFrame:
        """Cross-document duplicated-span removal: 8-token chunks
        appearing in ≥2 docs are dropped from every doc; returns
        per-doc chunk counts + cleaned-text md5/length."""
        from .plans.curation import q_dup_span_removal

        return q_dup_span_removal(self.spark, self.sf_dir)

    def length_outliers(self) -> DataFrame:
        """Robust length gate: docs beyond 3·1.4826·MAD from the
        corpus median token count, via the histogram exact median."""
        from .plans.curation import q_length_outliers

        return q_length_outliers(self.spark, self.sf_dir)

    def pack_sequences(self, materialize: bool = False) -> DataFrame:
        """Concat-and-chunk training layout: per-doc (shard, pack,
        offset) assignment, or with materialize=True the per-pack
        payload digest (ordered member concat)."""
        from .plans.curation import q_pack_materialize, q_seq_packing

        fn = q_pack_materialize if materialize else q_seq_packing
        return fn(self.spark, self.sf_dir)

    def fuzzy_links(self) -> DataFrame:
        """Edit-distance-≤1 entity links over customer names via
        SymSpell deletion-neighborhood blocking (never all-pairs)."""
        from .plans.filters import q_fuzzy_linkage

        return q_fuzzy_linkage(self.spark, self.sf_dir)

    # -- filtering / scoring ---------------------------------------------

    def gate(self) -> DataFrame:
        """Gopher-style rule gate per document (integer-scaled rule
        inputs + composite `passes` flag)."""
        from .plans.filters import gopher_rules_df

        return gopher_rules_df(self._docs())

    def char_entropy(self) -> DataFrame:
        """Per-doc character-distribution entropy in micro-nats — the
        garbled/random-text detector."""
        from .plans.filters import q_char_entropy

        return q_char_entropy(self.spark, self.sf_dir)

    def lm_score(self, order: int = 1) -> DataFrame:
        """Corpus-LM fluency score per document in integer micro-nats
        (order=1 unigram, order=2 add-one-smoothed bigram)."""
        from .plans.curation import q_unigram_logprob
        from .plans.filters import q_bigram_logprob

        if order == 1:
            return q_unigram_logprob(self.spark, self.sf_dir)
        if order == 2:
            return q_bigram_logprob(self.spark, self.sf_dir)
        raise ValueError(f"order must be 1 or 2, got {order}")

    def importance_weights(self) -> DataFrame:
        """DSIR-style target-vs-raw importance weight per document
        (micro-nat integer log-ratio dot product)."""
        from .plans.filters import q_dsir_weights

        return q_dsir_weights(self.spark, self.sf_dir)

    def chunks(self) -> DataFrame:
        """Overlapping word-window chunks (W=32, stride=24) with spans
        and chunk md5 — the RAG/embedding chunker; zero-shuffle."""
        from .plans.filters import doc_chunks_df

        return doc_chunks_df(self._docs())

    def stats_cube(self) -> DataFrame:
        """lang × source corpus composition CUBE with GROUPING
        flags — the dataset-card roll-up."""
        from .plans.filters import q_corpus_stats_cube

        return q_corpus_stats_cube(self.spark, self.sf_dir)

    def classify_knn(self) -> DataFrame:
        """k-NN majority-vote label propagation over held-out
        embeddings (label-QA pass)."""
        from .plans.llmdata import q_knn_classify

        return q_knn_classify(self.spark, self.sf_dir)

    # -- splits / sampling / contamination -------------------------------

    @staticmethod
    def _bucket(col, mod: int):
        return split_bucket(col, mod)

    def split(self) -> DataFrame:
        """documents + a deterministic 80/10/10 split column."""
        b = self._bucket(F.col("doc_id"), 100)
        return self._docs().withColumn(
            "split",
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test"),
        )

    def sample(self, rate_per_mille: int = 100) -> DataFrame:
        """Deterministic Bernoulli sample (same rows on every run/
        partitioning/engine)."""
        return self._docs().filter(
            self._bucket(F.col("doc_id"), 1000) < rate_per_mille
        )

    def contamination(self, k: int = 5) -> DataFrame:
        """Test-split docs sharing any k-gram with the train split."""
        from .plans.curation import q_contamination

        assert k == 5, "plan pins k=5; parameterize via doc_shingles for other k"
        return q_contamination(self.spark, self.sf_dir)

    # -- similarity ------------------------------------------------------

    def neighbors(self, k: int = 5, n_queries: int = 5) -> DataFrame:
        """Exact cosine top-k neighbors for the first n_queries ids."""
        emb = self._emb()
        return S.brute_force_topk(
            emb, emb.filter(F.col("vec_id") < n_queries), k=k
        )

    def neighbors_ivf(self, k: int = 5, n_queries: int = 5) -> DataFrame:
        """IVF ANN top-k — the partition-pruned scale path."""
        emb = self._emb()
        return S.ivf_ann_topk(
            emb, emb.filter(F.col("vec_id") < n_queries), k=k
        )

    def quantized_embeddings(self) -> DataFrame:
        """int8-quantized embeddings (symmetric per-vector scale) with
        reconstruction error — the 4×-smaller storage/scan layout for
        downstream ANN passes."""
        from .plans.llmdata import q_emb_quantize

        return q_emb_quantize(self.spark, self.sf_dir)
