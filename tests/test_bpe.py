"""BPE tokenizer training/application (scale/bpe.py)."""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import bpe_token_count, bpe_tokenize, train_bpe, word_counts
from trackintel_spark.scale.bpe import _EOW, bpe_segment_word


def test_train_bpe_learns_frequent_pairs(spark):
    """Classic toy corpus: 'low lower lowest' — the first merges glue
    the shared 'lo'/'low' stem."""
    docs = spark.createDataFrame(
        [("low low low low low lower lower lowest",)], "text string"
    )
    merges = train_bpe(docs, num_merges=4)
    assert merges[0] == ("l", "o")  # most frequent pair (8 occurrences)
    assert ("lo", "w") in merges[:2]
    # merges are deterministic across repeated training
    assert merges == train_bpe(docs, num_merges=4)


def test_bpe_tokenize_roundtrip_and_count(spark):
    rng_words = ["alpha", "beta", "alphabet", "better", "bet"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng_words) + f" alpha beta x{i}") for i in range(6)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=30, min_pair_count=2)
    out = bpe_tokenize(docs, merges).collect()
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for r in out:
        toks = r["bpe_tokens"]
        # concatenating tokens and stripping the end-of-word markers
        # reconstructs the lowercased text exactly
        rebuilt = "".join(toks).replace(_EOW, " ").strip()
        assert rebuilt == " ".join(r["text"].lower().split())
        # every token sequence equals the reference segmenter's
        i = 0
        for w in r["text"].lower().split():
            seg = bpe_segment_word(w, ranks)
            assert toks[i : i + len(seg)] == seg, w
            i += len(seg)
    counted = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(docs, merges).collect()}
    got = {r["doc_id"]: len(r["bpe_tokens"]) for r in out}
    assert counted == got
    # a trained tokenizer compresses: fewer tokens than characters
    chars = {r["doc_id"]: len(r["text"].replace(" ", "")) + len(r["text"].split()) for r in out}
    assert all(counted[d] < chars[d] for d in counted)


def test_bpe_min_pair_count_stops_training(spark):
    docs = spark.createDataFrame([("zq xv",)], "text string")  # all pairs unique
    assert train_bpe(docs, num_merges=10, min_pair_count=2) == []
    # with min_pair_count=1 it happily merges singletons
    assert len(train_bpe(docs, num_merges=3, min_pair_count=1)) == 3


def test_word_counts(spark):
    docs = spark.createDataFrame([("a b a",), ("A c",)], "text string")
    got = {r["word"]: r["count"] for r in word_counts(docs).collect()}
    assert got == {"a": 3, "b": 1, "c": 1}
