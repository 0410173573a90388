"""fastText-style quality classifier: separation, determinism, plan.

The training construction (CCNet shuffled negatives) keeps the unigram
distribution identical across classes, so ANY separation the model
achieves must come from word order (bigram features) — a classifier
that only learned vocabulary would score ~0.5 everywhere. The tests
exploit that: held-out natural sentences must score high, their
shuffles low, and a unigram-only model must fail to separate.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import (
    classifier_score,
    ngram_tokens,
    shuffled_negatives,
    train_quality_classifier,
)

_SUBJ = ["the cat", "a dog", "the tired engineer", "my neighbour", "the old train"]
_VERB = ["sat on", "ran across", "looked at", "waited near", "jumped over"]
_OBJ = ["the mat", "a bridge", "the station", "my garden", "the quiet street"]
_TAIL = [
    "before breakfast",
    "after the long meeting",
    "during the storm",
    "without any warning",
    "in the early morning",
]


def _sentences(n, seed):
    rng = random.Random(seed)
    return [
        " ".join(
            [rng.choice(_SUBJ), rng.choice(_VERB), rng.choice(_OBJ), _TAIL[rng.randrange(5)]]
            + [rng.choice(_SUBJ), rng.choice(_VERB), rng.choice(_OBJ)]
        )
        for _ in range(n)
    ]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def model(spark):
    pos = _docs(spark, _sentences(400, seed=1))
    return train_quality_classifier(pos, num_features=1 << 15, seed=3)


def test_separates_heldout_order_from_shuffle(spark, model):
    held = _docs(spark, _sentences(120, seed=99), start=10_000)
    pos_scores = [r.quality_prob for r in classifier_score(held, model).collect()]
    neg_scores = [
        r.quality_prob
        for r in classifier_score(shuffled_negatives(held, seed=7), model).collect()
    ]
    # strong separation on held-out data, both in mean and at the gate
    assert sum(pos_scores) / len(pos_scores) > 0.8
    assert sum(neg_scores) / len(neg_scores) < 0.2
    assert sum(s > 0.5 for s in pos_scores) / len(pos_scores) > 0.9
    assert sum(s < 0.5 for s in neg_scores) / len(neg_scores) > 0.9


def test_unigrams_alone_cannot_separate_the_construction(spark):
    """Control: with max_n=1 the two classes have IDENTICAL feature
    vectors (a shuffle preserves token counts), so training data is
    contradictory and scores collapse toward 0.5 — proof that the
    separation above is word-order signal, not leakage."""
    pos = _docs(spark, _sentences(200, seed=11))
    m1 = train_quality_classifier(pos, num_features=1 << 15, max_n=1, seed=3)
    held = _docs(spark, _sentences(60, seed=55), start=10_000)
    p = [r.quality_prob for r in classifier_score(held, m1).collect()]
    n = [
        r.quality_prob
        for r in classifier_score(shuffled_negatives(held, seed=7), m1).collect()
    ]
    gap = abs(sum(p) / len(p) - sum(n) / len(n))
    assert gap < 0.05, f"unigram model separated shuffled classes (gap={gap})"


def test_shuffled_negatives_deterministic_and_count_preserving(spark):
    df = _docs(spark, _sentences(50, seed=2))
    a = {(r.doc_id, r.text) for r in shuffled_negatives(df, seed=5).collect()}
    b = {(r.doc_id, r.text) for r in shuffled_negatives(df, seed=5).collect()}
    assert a == b  # deterministic across runs
    c = {(r.doc_id, r.text) for r in shuffled_negatives(df, seed=6).collect()}
    assert a != c  # seed matters
    # multiset of tokens preserved per doc
    orig = {r.doc_id: sorted(r.text.lower().split()) for r in df.collect()}
    for doc_id, text in a:
        assert sorted(text.split()) == orig[doc_id]


def test_scoring_is_map_side_no_shuffle(spark, model):
    df = _docs(spark, _sentences(30, seed=4))
    plan = classifier_score(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ngram_tokens_shape(spark):
    row = spark.range(1).select(
        ngram_tokens(F.lit("a b c d"), max_n=3).alias("t")
    ).collect()[0]
    assert row.t == [
        "a", "b", "c", "d",
        "a b", "b c", "c d",
        "a b c", "b c d",
    ]


def test_pareto_keep_rates_and_determinism(spark):
    from trackintel_spark.scale import pareto_keep

    n = 20_000
    df = spark.range(n).select(F.col("id"), (F.col("id") % 2 == 0).alias("hi"))
    scored = df.withColumn("score", F.when(F.col("hi"), 0.95).otherwise(0.05))
    kept = scored.withColumn("keep", pareto_keep(F.col("score"), F.col("id"), alpha=9.0, seed=1))
    rates = {
        r.hi: r.rate
        for r in kept.groupBy("hi").agg(F.avg(F.col("keep").cast("double")).alias("rate")).collect()
    }
    # P(keep) = min(1, (1 - score)^-... ) analytically: P(pareto > 1-s)
    # = (1/(2-s))^alpha for s<1 → s=0.95: 0.63; s=0.05: 0.0026
    assert abs(rates[True] - (1 / 1.05) ** 9) < 0.02
    assert abs(rates[False] - (1 / 1.95) ** 9) < 0.005
    # deterministic under repartitioning
    a = {r.id for r in kept.filter("keep").collect()}
    b = {r.id for r in scored.repartition(13).withColumn(
        "keep", pareto_keep(F.col("score"), F.col("id"), alpha=9.0, seed=1)
    ).filter("keep").collect()}
    assert a == b
    with pytest.raises(ValueError):
        pareto_keep(F.col("score"), F.col("id"), alpha=0.0)


# ---------------------------------------------------------------------------
# frozen-checkpoint scoring path (linear_quality_score + friends)
# ---------------------------------------------------------------------------


def test_repetition_negatives_shape_and_validation(spark):
    from trackintel_spark.scale import repetition_negatives

    df = _docs(spark, ["a b c", "x"])
    out = {r.doc_id: r.text for r in repetition_negatives(df, k=2).collect()}
    assert out[0] == "a a b b c c"
    assert out[1] == "x x"
    with pytest.raises(ValueError):
        repetition_negatives(df, k=1)


def test_linear_quality_score_matches_manual_math(spark):
    import math

    from trackintel_spark.scale import linear_quality_score

    weights = [("cat", 2.0), ("dog", -1.0), ("the cat", 0.5)]
    icpt = -0.25
    # "the cat sat" -> terms: the, cat, sat, "the cat", "cat sat"
    # matched: cat (2.0) + "the cat" (0.5) = 2.5 over 5 terms
    df = _docs(spark, ["the cat sat", ""])
    got = {
        r.doc_id: r.quality_prob
        for r in linear_quality_score(df, weights, icpt).collect()
    }
    assert got[0] == pytest.approx(1 / (1 + math.exp(-(icpt + 2.5 / 5))), abs=1e-12)
    # empty doc: no terms -> mean contributes 0, score = sigmoid(intercept)
    assert got[1] == pytest.approx(1 / (1 + math.exp(-icpt)), abs=1e-12)
    with pytest.raises(ValueError):
        linear_quality_score(df, [], icpt)


def test_linear_quality_score_is_map_side_no_shuffle(spark):
    from trackintel_spark.scale import linear_quality_score
    from trackintel_spark.scale.frozen_quality_model import (
        FROZEN_QUALITY_INTERCEPT,
        FROZEN_QUALITY_WEIGHTS,
    )

    df = _docs(spark, _sentences(20, seed=9))
    plan = (
        linear_quality_score(df, FROZEN_QUALITY_WEIGHTS, FROZEN_QUALITY_INTERCEPT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_fit_portable_quality_model_separates_repetition(spark):
    from trackintel_spark.scale import (
        fit_portable_quality_model,
        linear_quality_score,
        repetition_negatives,
    )

    pos = _docs(spark, _sentences(150, seed=11))
    weights, icpt = fit_portable_quality_model(
        pos, negatives=repetition_negatives(pos), vocab_size=128, iters=15
    )
    assert len(weights) == 128 and all(isinstance(t, str) for t, _ in weights)
    heldout = _docs(spark, _sentences(60, seed=12))
    p_pos = (
        linear_quality_score(heldout, weights, icpt).agg(F.avg("quality_prob")).first()[0]
    )
    p_neg = (
        linear_quality_score(repetition_negatives(heldout), weights, icpt)
        .agg(F.avg("quality_prob"))
        .first()[0]
    )
    assert p_pos > 0.8 and p_neg < 0.2, (p_pos, p_neg)


def test_frozen_checkpoint_scores_real_above_repetition(spark):
    """The checked-in frozen model is a repetition-junk detector on the
    driver corpus vocabulary; it must order any real-ish text above its
    repeated copy."""
    from trackintel_spark.scale import linear_quality_score, repetition_negatives
    from trackintel_spark.scale.frozen_quality_model import (
        FROZEN_QUALITY_INTERCEPT,
        FROZEN_QUALITY_WEIGHTS,
    )

    texts = [
        "key agg row scan slow fast table value part hash merge batch line sort window",
        "batch window spark order data column agg join small line customer query value",
    ]
    real = _docs(spark, texts)
    junk = repetition_negatives(real)
    p_real = (
        linear_quality_score(real, FROZEN_QUALITY_WEIGHTS, FROZEN_QUALITY_INTERCEPT)
        .agg(F.avg("quality_prob"))
        .first()[0]
    )
    p_junk = (
        linear_quality_score(junk, FROZEN_QUALITY_WEIGHTS, FROZEN_QUALITY_INTERCEPT)
        .agg(F.avg("quality_prob"))
        .first()[0]
    )
    assert p_real > 0.9 and p_junk < 0.1, (p_real, p_junk)


def test_portable_uniform_range_and_determinism(spark):
    from trackintel_spark.scale import pareto_keep, portable_uniform

    df = spark.range(5000)
    stats = df.select(portable_uniform(F.col("id"), seed=3).alias("u")).agg(
        F.min("u"), F.max("u"), F.avg("u"), F.count_distinct("u")
    ).first()
    assert 0.0 < stats[0] and stats[1] <= 1.0
    assert abs(stats[2] - 0.5) < 0.02
    assert stats[3] > 4990  # essentially all distinct
    # injected-u lottery is reproducible and matches the analytic rate
    kept = df.select(
        pareto_keep(F.lit(0.95), F.col("id"), alpha=9.0, u=portable_uniform(F.col("id"), seed=3)).alias("k")
    )
    rate = kept.agg(F.avg(F.col("k").cast("double"))).first()[0]
    assert abs(rate - (1 / 1.05) ** 9) < 0.02


def test_fit_counts_duplicate_documents_individually(spark):
    """Round-9 regression (ADVICE r8): rid was a content hash, so
    duplicate (text, label) documents collapsed into ONE training row —
    a term carried by a 30×-duplicated doc got document frequency 1 and
    never made the df-ordered vocabulary. With per-duplicate ids it has
    df=30 and must dominate a df-desc vocab over 40 singleton terms."""
    from trackintel_spark.scale import fit_portable_quality_model

    pos = spark.createDataFrame(
        [(f"a{i}x a{i}y",) for i in range(40)], "text string"
    )
    neg = spark.createDataFrame([("dupx dupy",)] * 30, "text string")
    weights, _ = fit_portable_quality_model(pos, negatives=neg, vocab_size=4, iters=5)
    terms = {t for t, _ in weights}
    # under the collapse every term had df<=2 and the tie-break is
    # term-asc, so the a*-terms would fill all 4 slots
    assert "dupx" in terms and "dupy" in terms, terms
