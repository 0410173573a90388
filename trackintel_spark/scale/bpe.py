"""Byte-pair-encoding tokenizer training and application (Sennrich et
al. 2016, arXiv:1508.07909) — the tokenizer side of a training-data
pipeline: train merges on the corpus you curated, then measure REAL
token budgets with them (``token_count``'s whitespace/bpe_ish columns
are heuristics; this is the genuine article).

Scale shape (the k-means/DSIR pattern — distributed statistics,
bounded driver model):

* the corpus contributes exactly ONE distributed aggregation — the
  word-frequency table (hash agg with map-side combine, vocabulary-
  bounded). ``max_words`` caps what reaches the driver via TakeOrdered
  (per-partition heaps): BPE statistics are dominated by frequent
  words, so a capped table loses almost nothing (the merge loop is
  pure Python — measured 1M docs: 31s at a 20k-word cap, 187s at
  100k for 1000 merges; crank the cap only with a native trainer);
* the merge loop runs driver-side over that bounded table with
  incremental pair-count maintenance (only words containing the merged
  pair are touched per round) — the standard implementation, linear-ish
  in practice;
* application is an Arrow-batched pandas UDF with the usual
  rank-greedy merge apply and a per-executor word cache — the merge
  table (<= vocab_size entries) broadcasts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.text import tokens

_EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the lowercased whitespace vocabulary — one
    explode + hash aggregation."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def train_bpe(
    docs: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns them in
    application order. Deterministic: ties on pair frequency break
    lexicographically."""
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    # word -> (symbol tuple, freq)
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (_EOW,)
        vocab[sym] = vocab.get(sym, 0) + r["count"]

    import heapq
    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set] = defaultdict(set)
    words = list(vocab.items())  # [(symbols, freq)]
    for wi, (sym, freq) in enumerate(words):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += freq
            pair_words[(a, b)].add(wi)

    # best-pair selection via a lazy-invalidation max-heap: every count
    # change pushes a fresh entry; stale entries pop harmlessly because
    # they no longer match pair_counts. Scanning the full pair dict per
    # merge — the naive loop — is O(#pairs * #merges) and dominates at
    # web-corpus vocabularies; the heap makes each merge
    # O(touched-pairs * log #pairs).
    heap: list[tuple[int, tuple[str, str]]] = [
        (-n, p) for p, n in pair_counts.items()
    ]
    heapq.heapify(heap)

    def _push(p):
        n = pair_counts.get(p)
        if n:
            heapq.heappush(heap, (-n, p))

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            neg_n, p = heapq.heappop(heap)
            if pair_counts.get(p) == -neg_n:  # fresh entry
                if -neg_n >= min_pair_count:
                    best = p
                break
        if best is None:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        # rewrite only the words containing the merged pair
        for wi in list(pair_words[best]):
            sym, freq = words[wi]
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            # retire old pair contributions, add the new ones; push the
            # changed counts so the heap sees them
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= freq
                if pair_counts[(a, b)] <= 0:
                    pair_counts.pop((a, b), None)
                    pair_words.pop((a, b), None)
                else:
                    pair_words[(a, b)].discard(wi)
                    _push((a, b))
            words[wi] = (new, freq)
            for a, b in zip(new, new[1:]):
                pair_counts[(a, b)] += freq
                pair_words[(a, b)].add(wi)
                _push((a, b))
    return merges


def bpe_segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge application (reference implementation,
    shared by the UDF and the tests)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col: array<string>`` — the document's BPE token
    sequence (word-internal merges, ``</w>`` marking word ends).
    Map-side: merge ranks broadcast, per-executor word cache."""
    spark = docs.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {tuple(m): i for i, m in enumerate(merges)}
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _tok(texts: pd.Series) -> pd.Series:
        ranks = ranks_bc.value
        cache: dict[str, list[str]] = {}

        def one(t):
            out: list[str] = []
            for w in (t or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = bpe_segment_word(w, ranks)
                    if len(cache) < 2**18:
                        cache[w] = got
                out.extend(got)
            return out

        return texts.map(one)

    return docs.withColumn(out_col, _tok(F.col(text_col)))


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Token-budget counting under a TRAINED tokenizer — the number the
    packing/mixing stages actually need."""
    tmp = "__bpe_seq"
    out = bpe_tokenize(docs, merges, text_col=text_col, out_col=tmp)
    return out.withColumn(out_col, F.size(F.col(tmp))).drop(tmp)
