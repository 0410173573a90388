"""Corpus profiling sketches (scale/profile.py)."""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import (
    corpus_profile,
    top_tokens,
    union_vocab_sketches,
    vocab_sketch,
)


@pytest.fixture()
def corpus(spark):
    rows = []
    for i in range(200):
        words = [f"w{j}" for j in range(i % 17)] + ["the", "common", "tail"]
        rows.append((i, "s%d" % (i % 2), " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_corpus_profile_whole(spark, corpus):
    row = corpus_profile(corpus).collect()[0]
    assert row["n_docs"] == 200
    exact_tokens = corpus.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("s")
    ).collect()[0]["s"]
    assert row["total_tokens"] == exact_tokens
    # vocab = w0..w15 + the/common/tail = 19; HLL is near-exact this small
    assert abs(row["vocab_size_approx"] - 19) <= 1
    assert len(row["tokens_per_doc_q"]) == 4
    assert row["tokens_per_doc_q"][1] <= row["tokens_per_doc_q"][3]  # median <= p99
    assert row["total_chars"] == corpus.select(F.sum(F.length("text"))).collect()[0][0]


def test_corpus_profile_grouped(spark, corpus):
    rows = {r["source"]: r for r in corpus_profile(corpus, group_by="source").collect()}
    assert set(rows) == {"s0", "s1"}
    assert rows["s0"]["n_docs"] == 100 and rows["s1"]["n_docs"] == 100
    total = corpus_profile(corpus).collect()[0]
    assert rows["s0"]["total_tokens"] + rows["s1"]["total_tokens"] == total["total_tokens"]


def test_vocab_sketch_union_matches_whole(spark, corpus):
    """Shard-wise sketches unioned == whole-corpus estimate: the
    profile-once-merge-later contract."""
    whole = corpus_profile(corpus).collect()[0]["vocab_size_approx"]
    shards = vocab_sketch(corpus, group_by="source")
    assert shards.count() == 2
    merged = union_vocab_sketches(shards).collect()[0]["vocab_size_approx"]
    assert merged == whole


def test_top_tokens_exact(spark, corpus):
    top = top_tokens(corpus, k=3).collect()
    assert [r["token"] for r in top] == ["common", "tail", "the"] or [
        r["token"] for r in top
    ] == sorted(["the", "common", "tail"])
    assert all(r["count"] == 200 for r in top)
    # next-most-frequent: w0 appears in docs with (i%17)>=1 -> about 188
    nxt = top_tokens(corpus, k=4).collect()[3]
    assert nxt["token"] == "w0"


def test_host_stats_and_filter(spark):
    from trackintel_spark.scale import filter_hosts, host_stats

    docs = spark.createDataFrame(
        [
            (0, "https://www.good.org/with-www", "x"),
            (1, "https://spam.example.com/page1", "aaaa"),
            (2, "https://spam.example.com/page2", "bb"),
            (3, "http://good.org/article", "ccc"),
            (4, "good.org/plain-schemeless", "dd"),
            (5, None, "ee"),
        ],
        "doc_id long, url string, text string",
    )
    hs = {r["host"]: r for r in host_stats(docs).collect()}
    assert hs["spam.example.com"]["n_docs"] == 2
    assert hs["spam.example.com"]["total_chars"] == 6
    assert hs["good.org"]["n_docs"] == 3  # www. and schemeless forms fold in
    assert None in hs and hs[None]["n_docs"] == 1

    kept = sorted(r["doc_id"] for r in filter_hosts(docs, ["SPAM.example.com"]).collect())
    assert kept == [0, 3, 4, 5]  # blocked host gone; NULL url survives drop-mode
    only = sorted(r["doc_id"] for r in filter_hosts(docs, ["good.org"], keep=True).collect())
    assert only == [0, 3, 4]


def test_mix_corpora_deterministic_weights(spark):
    from trackintel_spark.scale import mix_corpora

    a = spark.createDataFrame([(i, f"a{i}") for i in range(2000)], "doc_id long, text string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(500)], "doc_id long, text string")
    mixed = mix_corpora({"web": (a, 0.25), "books": (b, 2.0)}, salt="s")
    counts = {r["mix_source"]: r["count"] for r in mixed.groupBy("mix_source").count().collect()}
    assert abs(counts["web"] - 500) < 100       # ~0.25 * 2000
    assert abs(counts["books"] - 1000) < 120    # ~2.0 * 500 (upsampled copies)
    # deterministic across partitionings
    again = mix_corpora({"web": (a.repartition(7), 0.25), "books": (b, 2.0)}, salt="s")
    assert again.count() == mixed.count()
    ids1 = sorted((r["mix_source"], r["doc_id"]) for r in mixed.collect())
    ids2 = sorted((r["mix_source"], r["doc_id"]) for r in again.collect())
    assert ids1 == ids2
