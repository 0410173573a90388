"""Discriminative quality classification — the fastText-style filter.

The GPT-3 / LLaMA / CCNet pipelines gate web text with a linear
classifier trained to separate a trusted reference corpus (Wikipedia,
books) from raw crawl: hashed bag-of-n-gram features, logistic loss
(Brown et al. 2020 appendix A; Touvron et al. 2023 §2; Wenzek et al.
2020 §4.3). This module is that stage on Spark:

* features: hashed unigram+bigram counts (``HashingTF`` over a pure-
  expression token array — murmur3, deterministic, JVM-side);
* training: ``pyspark.ml`` ``LogisticRegression`` (distributed L-BFGS).
  Train on a bounded SAMPLE — a few 10⁵ docs per class saturates a
  linear model; nobody fits 100 TB, they fit a sample and SCORE 100 TB;
* scoring: ``model.transform`` — a map-side stage (coefficients ride
  the closure), no shuffle, whole-stage codegen around it;
* negatives: when no raw-crawl sample is at hand, the CCNet trick —
  token-shuffled copies of the positives. Shuffling preserves the
  unigram distribution exactly, so the classifier is forced onto word
  ORDER (bigrams); here the shuffle is a deterministic hash-sort so
  tests and reruns reproduce bit-for-bit.

Training is iterative (no closed-form SQL oracle); correctness is
pinned by separation tests on held-out data and a no-shuffle plan
assertion for the scoring stage (tests/test_classifier.py).

The reference engine has no classifier stage — LLM-pipeline extension
surface, like :mod:`trackintel_spark.scale.mixing` (DSIR is the
generative counterpart of this discriminative filter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.text import tokens

__all__ = [
    "ngram_tokens",
    "shuffled_negatives",
    "train_quality_classifier",
    "classifier_score",
    "pareto_keep",
]

_FEAT = "__features"
_TOKS = "__cls_toks"


def ngram_tokens(text: Column, max_n: int = 2) -> Column:
    """Unigram..``max_n``-gram terms as one ``array<string>`` — the
    classifier's vocabulary unit. Shifted-slice ``zip_with`` builds the
    n-grams in O(tokens) with no explode (same idiom as
    ``mixing.hashed_ngram_buckets``, kept separate because HashingTF
    wants the raw terms, not bucket ids)."""
    if not 1 <= max_n <= 3:
        raise ValueError(f"max_n must be 1..3, got {max_n}")
    toks = tokens(text)
    parts = [toks]
    n_ = F.size(toks)
    if max_n >= 2:
        parts.append(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n_ - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n_ - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        )
    if max_n >= 3:
        parts.append(
            F.zip_with(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(n_ - 2, F.lit(0))),
                    F.slice(toks, 2, F.greatest(n_ - 2, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
                F.slice(toks, 3, F.greatest(n_ - 2, F.lit(0))),
                lambda ab, c: F.concat_ws(" ", ab, c),
            )
        )
    return F.concat(*parts)


def shuffled_negatives(
    df: DataFrame, text_col: str = "text", seed: int = 0
) -> DataFrame:
    """Synthetic negative class: each document's tokens re-ordered by a
    deterministic per-(document, position, token) hash — unigram
    distribution identical to the positives, word order destroyed.
    Same columns out, ``text_col`` replaced."""
    toks = tokens(F.col(text_col))
    keyed = F.transform(
        toks, lambda t, i: F.struct(F.xxhash64(t, i, F.lit(seed)).alias("k"), t.alias("t"))
    )
    shuffled = F.array_join(F.transform(F.array_sort(keyed), lambda s: s["t"]), " ")
    return df.withColumn(text_col, shuffled)


def _featurize(df: DataFrame, text_col: str, num_features: int, max_n: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    with_terms = df.withColumn(_TOKS, ngram_tokens(F.col(text_col), max_n))
    tf = HashingTF(inputCol=_TOKS, outputCol=_FEAT, numFeatures=num_features)
    return tf.transform(with_terms).drop(_TOKS)


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame | None = None,
    text_col: str = "text",
    num_features: int = 1 << 18,
    max_n: int = 2,
    max_iter: int = 60,
    reg_param: float = 1e-4,
    seed: int = 0,
):
    """Fit the linear filter. ``positives`` is the trusted reference
    sample; ``negatives`` defaults to :func:`shuffled_negatives` of the
    positives (CCNet's labels-for-free construction). Returns the
    fitted ``LogisticRegressionModel`` — pass it to
    :func:`classifier_score`, or ``model.save(path)`` for reuse across
    daily scoring jobs (train once, score many shards).
    """
    from pyspark.ml.classification import LogisticRegression

    if negatives is None:
        negatives = shuffled_negatives(positives, text_col, seed=seed)
    train = positives.select(F.col(text_col), F.lit(1.0).alias("label")).unionByName(
        negatives.select(F.col(text_col), F.lit(0.0).alias("label"))
    )
    feats = _featurize(train, text_col, num_features, max_n)
    lr = LogisticRegression(
        featuresCol=_FEAT,
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    model = lr.fit(feats)
    # scoring must featurize identically — remember the knobs on the model
    model._ti_featurize = (text_col, num_features, max_n)
    return model


def classifier_score(
    df: DataFrame,
    model,
    text_col: str | None = None,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a trained filter: ``out_col`` is
    P(reference-like) in [0, 1]. Map-side only — the coefficient vector
    rides the task closure; the plan has no exchange (pinned in
    tests/test_classifier.py). Filter with a hard gate
    (``.filter("quality_prob > 0.5")``) or GPT-3's stochastic lottery
    (:func:`pareto_keep`) downstream.
    """
    from pyspark.ml.functions import vector_to_array

    t_col, num_features, max_n = getattr(
        model, "_ti_featurize", (text_col or "text", 1 << 18, 2)
    )
    feats = _featurize(df, text_col or t_col, num_features, max_n)
    scored = model.transform(feats)
    return scored.withColumn(
        out_col, vector_to_array(F.col(model.getProbabilityCol()))[1]
    ).drop(_FEAT, model.getRawPredictionCol(), model.getProbabilityCol(), model.getPredictionCol())


def pareto_keep(
    score: Column, id_col: Column, alpha: float = 9.0, seed: int = 0
) -> Column:
    """GPT-3's stochastic document lottery as a boolean Column: keep a
    document when ``pareto(alpha) > 1 - score`` (Brown et al. 2020
    appendix A). A hard ``score > t`` gate deletes the tail of the
    distribution outright; the lottery keeps high scorers almost
    always and low scorers occasionally, preserving diversity.

    Deterministic and partition-invariant: the Pareto draw is the
    inverse-CDF transform of a per-document hash uniform (never
    ``rand()``, which reshuffles with the partitioning) — the same
    document always wins or loses the same lottery for a given seed.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    # xxhash64 → uniform in (0, 1]: shift into [0, 2^63) then scale,
    # guarding the 0 endpoint so the Pareto transform stays finite
    u = (F.shiftrightunsigned(F.xxhash64(id_col, F.lit(seed)), 1).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 63)
    )
    pareto = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return pareto > (F.lit(1.0) - score)
