"""Fluent ``Corpus`` accessor over the LLM training-data stack — the
text-side sibling of the mobility accessors (model/accessors.py): the
functional core stays plain ``DataFrame -> DataFrame``; this veneer
lets curation pipelines read as one chain:

    corpus = Corpus(read_documents_jsonl(spark, path))
    clean = (
        corpus.quality()
        .language()
        .line_dedup(min_count=3)
        .dedup_exact()
        .decontaminate(bench_shingles)
        .select_dsir(target_logprobs, k=1_000_000)
    )

Every method returns a new ``Corpus`` wrapping the transformed frame
(still lazy); ``.df`` unwraps. Unknown attributes proxy to the wrapped
DataFrame, with DataFrame-returning calls coming back as plain
DataFrames.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class Corpus:
    """Document-corpus accessor; expects ``doc_id`` and ``text``
    columns (names configurable)."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        for c in (id_col, text_col):
            if c not in df.columns:
                raise ValueError(f"corpus frame is missing column {c!r}")
        self.df = df
        self.id_col = id_col
        self.text_col = text_col

    def _wrap(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.id_col, self.text_col)

    def __getattr__(self, name: str) -> Any:
        return getattr(self.df, name)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"Corpus({self.df})"

    # -- scoring ------------------------------------------------------------

    def quality(self) -> "Corpus":
        from trackintel_spark.scale.text import quality_score

        return self._wrap(quality_score(self.df, text_col=self.text_col))

    def language(self) -> "Corpus":
        from trackintel_spark.scale.text import detect_language

        return self._wrap(detect_language(self.df, text_col=self.text_col))

    def token_counts(self, method: str = "whitespace", out_col: str = "n_tokens") -> "Corpus":
        from pyspark.sql import functions as F

        from trackintel_spark.scale.text import token_count

        return self._wrap(
            self.df.withColumn(out_col, token_count(F.col(self.text_col), method))
        )

    def repetition(self) -> "Corpus":
        from trackintel_spark.scale.text import repetition_signals

        return self._wrap(repetition_signals(self.df, text_col=self.text_col))

    def compression(self) -> "Corpus":
        from trackintel_spark.scale.text import compression_ratio

        return self._wrap(compression_ratio(self.df, text_col=self.text_col))

    def lm_score(self, logprobs, max_n: int = 2) -> "Corpus":
        from trackintel_spark.scale.mixing import lm_cross_entropy

        return self._wrap(
            lm_cross_entropy(self.df, logprobs, text_col=self.text_col, max_n=max_n)
        )

    # -- dedup --------------------------------------------------------------

    def dedup_exact(self) -> "Corpus":
        from trackintel_spark.scale.dedup import dedup_exact

        return self._wrap(dedup_exact(self.df, text_col=self.text_col, id_col=self.id_col))

    def line_dedup(self, **kw) -> "Corpus":
        from trackintel_spark.scale.dedup import line_dedup

        return self._wrap(
            line_dedup(self.df, text_col=self.text_col, id_col=self.id_col, **kw)
        )

    def substring_dedup(self, **kw) -> "Corpus":
        """Remove duplicated token spans (Lee-et-al-style strided
        approximation — see :func:`trackintel_spark.scale.dedup.dedup_substrings`)."""
        from trackintel_spark.scale.dedup import dedup_substrings

        return self._wrap(
            dedup_substrings(self.df, text_col=self.text_col, id_col=self.id_col, **kw)
        )

    def near_dedup(self, threshold: float = 0.7, num_perm: int = 64, bands: int = 16, keep: str = "min_id") -> "Corpus":
        """MinHash LSH candidates -> exact Jaccard verify -> connected
        components -> canonical survivors only."""
        from pyspark.sql import functions as F

        from trackintel_spark.scale.dedup import (
            dedup_clusters,
            minhash_lsh_candidates,
            ngram_jaccard_pairs,
        )

        cands = minhash_lsh_candidates(
            self.df, text_col=self.text_col, id_col=self.id_col,
            num_perm=num_perm, bands=bands,
        )
        pairs = ngram_jaccard_pairs(
            self.df, threshold=threshold, candidates=cands,
            text_col=self.text_col, id_col=self.id_col,
        )
        flagged = dedup_clusters(self.df, pairs, id_col=self.id_col, keep=keep)
        return self._wrap(
            flagged.filter(F.col("is_canonical")).drop("cluster_id", "is_canonical")
        )

    def chunk_fraction(self, **kw) -> "Corpus":
        from trackintel_spark.scale.dedup import chunk_dedup_fraction

        return self._wrap(
            chunk_dedup_fraction(self.df, text_col=self.text_col, id_col=self.id_col, **kw)
        )

    # -- hygiene / selection -------------------------------------------------

    def decontaminate(self, bench_shingles: list[str], n: int = 13, **kw) -> "Corpus":
        from trackintel_spark.scale.decontaminate import decontaminate_map_side

        return self._wrap(
            decontaminate_map_side(self.df, bench_shingles, n=n, text_col=self.text_col, **kw)
        )

    def dedup_against(self, index, near_index=None, threshold: float = 0.9, **kw) -> "Corpus":
        """Incremental gate vs a persisted accepted-corpus index (see
        :mod:`trackintel_spark.scale.incremental`): exact digest check
        (plus within-corpus min-id dedup), then — when ``near_index``
        is given — the MinHash near-dup check on the exact survivors.
        Keeps only the accepted documents."""
        from trackintel_spark.scale.incremental import (
            dedup_against_index,
            neardup_against_index,
        )

        out = (
            dedup_against_index(self.df, index, text_col=self.text_col, id_col=self.id_col)
            .filter("is_new")
            .drop("dup_of", "is_new")
        )
        if near_index is not None:
            out = (
                neardup_against_index(
                    out, near_index, threshold, text_col=self.text_col,
                    id_col=self.id_col, **kw,
                )
                .filter("is_new")
                .drop("dup_of", "jaccard_est", "is_new")
            )
        return self._wrap(out)

    def exact_index(self):
        """The corpus's compact digest index — persist it (bucketed on
        ``digest``) and gate tomorrow's shard with :meth:`dedup_against`."""
        from trackintel_spark.scale.incremental import build_exact_index

        return build_exact_index(self.df, text_col=self.text_col, id_col=self.id_col)

    def classify_quality(self, model=None, out_col: str = "quality_prob", **train_kw) -> "Corpus":
        """Score with a trained fastText-style filter (see
        :mod:`trackintel_spark.scale.classifier`); with ``model=None``
        one is trained on this corpus vs its shuffled negatives first
        (demo convenience — production trains once on a trusted
        reference sample and reuses the saved model)."""
        from trackintel_spark.scale.classifier import (
            classifier_score,
            train_quality_classifier,
        )

        if model is None:
            model = train_quality_classifier(
                self.df.select(self.id_col, self.text_col),
                text_col=self.text_col, **train_kw,
            )
        return self._wrap(
            classifier_score(self.df, model, text_col=self.text_col, out_col=out_col)
        )

    def redact_pii(self, **kw) -> "Corpus":
        from trackintel_spark.scale.text import redact_pii

        return self._wrap(redact_pii(self.df, text_col=self.text_col, **kw))

    def select_dsir(self, target_logprobs, k: int, raw_logprobs=None, salt: str = "", max_n: int = 2) -> "Corpus":
        from trackintel_spark.scale.mixing import dsir_log_weights, dsir_select

        w = dsir_log_weights(
            self.df, target_logprobs, raw_logprobs, text_col=self.text_col, max_n=max_n
        )
        return self._wrap(dsir_select(w, k, id_col=self.id_col, salt=salt))

    def chunk(self, max_tokens: int, overlap: int = 0) -> "Corpus":
        from trackintel_spark.scale.sampling import chunk_documents

        return self._wrap(
            chunk_documents(
                self.df, max_tokens=max_tokens, overlap=overlap,
                text_col=self.text_col, id_col=self.id_col,
            )
        )

    def split(self, fractions: dict[str, float], salt: str = "") -> "Corpus":
        from trackintel_spark.scale.sampling import split_by_hash

        return self._wrap(split_by_hash(self.df, self.id_col, fractions, salt=salt))

    def train_bpe(self, num_merges: int = 1000, **kw) -> list:
        from trackintel_spark.scale.bpe import train_bpe

        return train_bpe(self.df, num_merges=num_merges, text_col=self.text_col, **kw)

    def bpe_token_counts(self, merges: list, out_col: str = "n_bpe_tokens") -> "Corpus":
        from trackintel_spark.scale.bpe import bpe_token_count

        return self._wrap(
            bpe_token_count(self.df, merges, text_col=self.text_col, out_col=out_col)
        )

    # -- search / profile -----------------------------------------------------

    def search(self, query: str, k: int = 10, **kw) -> DataFrame:
        from trackintel_spark.scale.search import bm25_search

        return bm25_search(
            self.df, query, k=k, text_col=self.text_col, id_col=self.id_col, **kw
        )

    def profile(self, group_by=None) -> DataFrame:
        from trackintel_spark.scale.profile import corpus_profile

        return corpus_profile(self.df, text_col=self.text_col, group_by=group_by)
