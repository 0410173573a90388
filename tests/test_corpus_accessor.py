"""Fluent Corpus accessor (model/corpus.py): thin veneer, results
identical to the functional core."""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.model import Corpus


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (3, "completely different content about database query optimization and joins"),
        (4, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_chain_matches_functional_core(spark, docs):
    from trackintel_spark.scale.dedup import dedup_exact
    from trackintel_spark.scale.text import detect_language, quality_score

    chained = Corpus(docs).quality().language().dedup_exact()
    direct = dedup_exact(quality_score(detect_language(docs)))
    assert sorted(r["doc_id"] for r in chained.collect()) == sorted(
        r["doc_id"] for r in direct.collect()
    )
    assert set(chained.df.columns) == set(direct.columns)


def test_corpus_substring_dedup(spark, docs):
    from trackintel_spark.scale.dedup import dedup_substrings

    chained = Corpus(docs).substring_dedup(window=6, stride=1)
    direct = dedup_substrings(docs, window=6, stride=1)
    assert sorted(map(str, chained.collect())) == sorted(map(str, direct.collect()))


def test_corpus_near_dedup_and_search(spark, docs):
    kept = Corpus(docs).near_dedup(threshold=0.6)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 1 in ids and 2 not in ids  # exact clone collapsed
    assert set(kept.df.columns) == {"doc_id", "text"}

    hits = Corpus(docs).search("query optimization", k=2)
    assert hits.collect()[0]["doc_id"] == 3


def test_corpus_chunk_split_profile(spark, docs):
    c = Corpus(docs).chunk(max_tokens=5).split({"train": 0.5, "val": 0.5})
    out = c.collect()
    assert all(r["split"] in ("train", "val") for r in out)
    assert {r["doc_id"] for r in out} == {1, 2, 3, 4}
    prof = Corpus(docs).profile().collect()[0]
    assert prof["n_docs"] == 4


def test_corpus_validates_columns(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="missing column"):
        Corpus(df)


def test_corpus_bpe_methods(spark, docs):
    c = Corpus(docs)
    merges = c.train_bpe(num_merges=40)
    out = c.bpe_token_counts(merges)
    rows = out.collect()
    assert all(r["n_bpe_tokens"] > 0 for r in rows)
    # duplicate docs 1/2 get identical budgets
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in rows}
    assert got[1] == got[2]


def test_corpus_incremental_gate_and_classifier(spark, docs):
    # history = doc 1's text; gate the corpus against it
    index = Corpus(docs.filter("doc_id = 1")).exact_index()
    kept = Corpus(docs).dedup_against(index)
    # 1 and 2 share a text in history -> both rejected; 3 and 4 survive
    assert {r.doc_id for r in kept.df.collect()} == {3, 4}

    # with the near index too: doc 3 near-dups itself in history
    from trackintel_spark.scale import build_neardup_index

    near = build_neardup_index(docs.filter("doc_id = 3"))
    kept2 = Corpus(docs).dedup_against(index, near_index=near, threshold=0.9)
    assert {r.doc_id for r in kept2.df.collect()} == {4}

    # classifier veneer: self-trained demo path adds the score column
    scored = Corpus(docs).classify_quality(num_features=1 << 12)
    rows = scored.df.collect()
    assert all(0.0 <= r.quality_prob <= 1.0 for r in rows) and len(rows) == 4
