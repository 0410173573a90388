"""DSIR importance-resampling selection (scale/mixing.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import (
    dsir_log_weights,
    dsir_select,
    fit_ngram_model,
    hashed_ngram_buckets,
)


def test_hashed_ngram_buckets_counts(spark):
    """n tokens -> n unigrams + (n-1) bigrams [+ (n-2) trigrams]; empty
    text -> empty bag; every id in [0, buckets)."""
    df = spark.createDataFrame(
        [("a b c d",), ("hello",), ("",), ("  ",)], "text string"
    )
    for max_n, expect in ((1, [4, 1, 0, 0]), (2, [7, 1, 0, 0]), (3, [9, 1, 0, 0])):
        got = df.select(
            F.size(hashed_ngram_buckets(F.col("text"), 97, max_n)).alias("n")
        ).collect()
        assert [r["n"] for r in got] == expect, max_n
    ids = df.select(
        F.explode(hashed_ngram_buckets(F.col("text"), 97, 3)).alias("b")
    ).collect()
    assert all(0 <= r["b"] < 97 for r in ids)


def test_hashed_ngram_bigrams_differ_from_unigrams(spark):
    """'a b' and 'b a' share unigrams but not bigram buckets (w.h.p. at
    a large bucket count)."""
    df = spark.createDataFrame([(1, "east west"), (2, "west east")], "i long, text string")
    rows = df.select(
        "i", hashed_ngram_buckets(F.col("text"), 1_000_003, 2).alias("b")
    ).collect()
    bags = {r["i"]: sorted(r["b"]) for r in rows}
    assert sorted(bags[1][:2] + [bags[1][2]]) != sorted(bags[2][:2] + [bags[2][2]])
    assert sorted(bags[1])[:2] == sorted(bags[2])[:2] or set(bags[1]) & set(bags[2])


def test_fit_ngram_model_is_a_distribution(spark):
    docs = spark.createDataFrame(
        [("spark shuffles data",), ("spark broadcasts data",)], "text string"
    )
    lp = fit_ngram_model(docs, buckets=512, max_n=2, alpha=0.5)
    assert lp.shape == (512,)
    assert abs(np.exp(lp).sum() - 1.0) < 1e-9  # smoothed probs sum to 1
    assert lp.max() < 0.0


def test_dsir_log_weights_exact_vs_numpy(spark):
    """Spark's per-doc score equals a numpy recomputation from the SAME
    hashed bags and fitted models — exact, not statistical."""
    target = spark.createDataFrame(
        [("the query optimizer rewrites plans",), ("the optimizer prunes partitions",)],
        "text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "the query optimizer rewrites plans nightly"),
            (1, "cats chase the red dot"),
            (2, "prunes are dried plums"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    B = 256
    t_lp = fit_ngram_model(target, buckets=B, max_n=2)
    r_lp = fit_ngram_model(raw, buckets=B, max_n=2)
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, t_lp, r_lp, max_n=2).collect()
    }
    bags = {
        r["doc_id"]: list(r["b"])
        for r in raw.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), B, 2).alias("b")
        ).collect()
    }
    ratio = t_lp - r_lp
    for did, bag in bags.items():
        expect = float(ratio[np.asarray(bag, dtype=int)].sum()) if bag else 0.0
        assert got[did] == pytest.approx(expect, abs=1e-12), did
    # target-like doc outranks the off-topic ones
    assert got[0] > got[1] and got[0] > got[2]
    assert got[3] == 0.0


def test_portable_md5_hash_matches_duckdb(spark):
    """hash_fn='md5' buckets equal DuckDB's concat('0x', substr(md5, 1,
    15))::BIGINT % B — the cross-engine contract the dsir_weights
    oracle rides on — and the full DSIR path accepts the option."""
    import duckdb

    rows = [(0, "the Query optimizer"), (1, "cats chase the red dot"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    B = 64
    got = {
        r["doc_id"]: list(r["b"])
        for r in df.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), B, 2, hash_fn="md5").alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for did, text in rows:
        toks = [t for t in text.lower().split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want = [
            con.execute(
                "SELECT CAST(concat('0x', substr(md5(?), 1, 15)) AS BIGINT) % ?", [g, B]
            ).fetchone()[0]
            for g in grams
        ]
        assert got[did] == want
    # the float DSIR path runs unchanged under the portable hash
    t_lp = fit_ngram_model(df.filter("doc_id = 0"), buckets=B, hash_fn="md5")
    w = dsir_log_weights(df, t_lp, hash_fn="md5").collect()
    assert len(w) == 3
    with pytest.raises(ValueError, match="hash_fn"):
        df.select(hashed_ngram_buckets(F.col("text"), B, 2, hash_fn="sha9"))


def test_dsir_select_deterministic_and_biased(spark):
    """Gumbel top-k: reproducible for a salt, different across salts,
    and strongly biased toward high-weight rows."""
    rows = [(i, 10.0 if i < 5 else -10.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, log_weight double")
    a = sorted(r["doc_id"] for r in dsir_select(df, 5, salt="s1").collect())
    b = sorted(r["doc_id"] for r in dsir_select(df.repartition(7), 5, salt="s1").collect())
    assert a == b  # partition-invariant determinism
    # a 20-logit gap makes inclusion of any low-weight row ~e^-20
    assert a == [0, 1, 2, 3, 4]
    c = sorted(r["doc_id"] for r in dsir_select(df, 5, salt="s2").collect())
    assert c == [0, 1, 2, 3, 4]
    # temperature 0 = plain argmax top-k (no noise)
    d = sorted(
        r["doc_id"]
        for r in dsir_select(df, 3, salt="zz", temperature=0.0).collect()
    )
    assert d == [0, 1, 2]


def test_dsir_end_to_end_prefers_target_like_docs(spark):
    """Pipeline smoke: fit on a themed target, select from a mixed raw
    pool; the selection is dominated by on-theme docs."""
    target = spark.createDataFrame(
        [(f"distributed query engine shuffle stage {i}",) for i in range(10)],
        "text string",
    )
    on_theme = [(i, f"query engine shuffle stage number {i}") for i in range(20)]
    off_theme = [(i + 100, f"gardening tips for tomato season week {i}") for i in range(20)]
    raw = spark.createDataFrame(on_theme + off_theme, "doc_id long, text string")
    w = dsir_log_weights(raw, fit_ngram_model(target, buckets=2048), max_n=2)
    picked = dsir_select(w, 10, salt="mix")
    ids = [r["doc_id"] for r in picked.collect()]
    assert len(ids) == 10
    assert sum(1 for i in ids if i < 100) >= 9  # on-theme dominates


def test_lm_cross_entropy_orders_quality(spark):
    """Docs drawn from the target distribution score lower (more
    likely) than off-distribution docs; value matches numpy exactly."""
    from trackintel_spark.scale import fit_ngram_model, lm_cross_entropy
    from trackintel_spark.scale.mixing import hashed_ngram_buckets

    target = spark.createDataFrame(
        [("the cat sat on the mat",), ("the dog sat on the rug",)], "text string"
    )
    B = 512
    lp = fit_ngram_model(target, buckets=B, max_n=2)
    raw = spark.createDataFrame(
        [(0, "the cat sat on the rug"), (1, "zxqv wvut kjih gfed"), (2, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["cross_entropy"] for r in lm_cross_entropy(raw, lp).collect()}
    assert got[0] < got[1]  # target-like -> lower cross-entropy
    assert got[2] is None  # empty doc
    bags = {
        r["doc_id"]: list(r["b"])
        for r in raw.select(
            "doc_id", hashed_ngram_buckets(F.col("text"), B, 2).alias("b")
        ).collect()
    }
    for did in (0, 1):
        expect = -float(np.asarray(lp)[np.asarray(bags[did], dtype=int)].mean())
        assert got[did] == pytest.approx(expect, abs=1e-12)


def test_dsir_and_xent_survive_null_text(spark):
    """NULL text (reachable via JSONL schema with a missing key) must
    score 0 / NULL instead of crashing the Arrow batch with
    len(None)."""
    from trackintel_spark.scale.mixing import dsir_log_weights, fit_ngram_model, lm_cross_entropy

    target = spark.createDataFrame([("the cat sat",)], "text string")
    lp = fit_ngram_model(target, buckets=256, max_n=2)
    raw = spark.createDataFrame(
        [(0, "the cat sat"), (1, None), (2, "")], "doc_id long, text string"
    )
    w = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(raw, lp, raw_logprobs=lp).collect()}
    assert w[1] == 0.0 and w[2] == 0.0
    x = {r["doc_id"]: r["cross_entropy"] for r in lm_cross_entropy(raw, lp).collect()}
    assert x[1] is None and x[2] is None
