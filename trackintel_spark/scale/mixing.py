"""Data selection for LM training via importance resampling — the DSIR
recipe (Xie et al. 2023, arXiv:2302.03169): featurize documents as bags
of hashed n-grams, fit bucket unigram models on a TARGET corpus (the
distribution you want more of) and on the RAW corpus, weight every raw
document by the log-likelihood ratio of its features, and resample with
Gumbel top-k.

Scale shape
-----------
* featurization (:func:`hashed_ngram_buckets`) is a pure Column
  expression — tokens, shifted-zip bigrams, ``xxhash64 % B`` — fully
  inside whole-stage codegen, no shuffle;
* model fitting (:func:`fit_ngram_model`) is ONE explode + hash
  aggregation per corpus; the result is B smoothed log-probs (B
  defaults to 10k → ~80 KB), bounded driver state exactly like
  :func:`trackintel_spark.scale.similarity.kmeans_centers` returns its
  centers. Fit on a corpus SAMPLE at 100 TB — the model only needs
  enough counts, not the full pass;
* weighting (:func:`dsir_log_weights`) is map-side: the B-sized
  log-ratio vector rides an executor broadcast and an Arrow-batched
  pandas UDF does ``ratio.take(buckets).sum()`` per document — zero
  shuffle, no per-row Python;
* selection (:func:`dsir_select`) perturbs the weight with
  deterministic Gumbel noise keyed on ``xxhash64(id, salt)`` and takes
  the global top-k — Gumbel top-k sampling IS sampling without
  replacement proportional to ``exp(log_weight)`` (Vieira 2014), and
  Spark's ``orderBy().limit()`` executes it as per-partition heaps
  (TakeOrdered), never a full sort.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trackintel_spark.scale.text import tokens

DEFAULT_BUCKETS = 10_000


def hashed_ngram_buckets(
    text: Column, buckets: int = DEFAULT_BUCKETS, max_n: int = 2, hash_fn: str = "xxhash64"
) -> Column:
    """Bag of hashed word n-grams as ``array<bigint>`` bucket ids
    (repeats kept — bag, not set, semantics; DSIR counts occurrences).

    Unigrams through ``max_n``-grams (n-grams joined with a single
    space) hash with ``xxhash64 % buckets`` (default) or, with
    ``hash_fn='md5'``, the engine-portable 60-bit md5-prefix hash
    (``conv(substr(md5(x),1,15),16,10) % buckets``) that ANSI-SQL
    oracles can replay bit-for-bit — same trick the minhash oracle
    uses. Pure expressions either way; the shifted-slice ``zip_with``
    builds n-grams in O(tokens) without an explode.
    """
    if not 1 <= max_n <= 3:
        raise ValueError(f"max_n must be 1..3, got {max_n}")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"hash_fn must be xxhash64/md5, got {hash_fn!r}")
    toks = tokens(text)

    if hash_fn == "md5":
        def _hash(c: Column) -> Column:
            h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
            return F.pmod(h, F.lit(buckets))
    else:
        def _hash(c: Column) -> Column:
            return F.pmod(F.xxhash64(c), F.lit(buckets))

    parts = [F.transform(toks, _hash)]
    if max_n >= 2:
        n_ = F.size(toks)
        shift1 = F.slice(toks, 2, F.greatest(n_ - 1, F.lit(0)))
        bi = F.zip_with(
            F.slice(toks, 1, F.greatest(n_ - 1, F.lit(0))),
            shift1,
            lambda a, b: _hash(F.concat_ws(" ", a, b)),
        )
        parts.append(bi)
    if max_n >= 3:
        n_ = F.size(toks)
        tri = F.zip_with(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n_ - 2, F.lit(0))),
                F.slice(toks, 2, F.greatest(n_ - 2, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice(toks, 3, F.greatest(n_ - 2, F.lit(0))),
            lambda ab, c: _hash(F.concat_ws(" ", ab, c)),
        )
        parts.append(tri)
    return F.concat(*parts)


def fit_ngram_model(
    df: DataFrame,
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    max_n: int = 2,
    alpha: float = 1.0,
    hash_fn: str = "xxhash64",
) -> np.ndarray:
    """Laplace-smoothed bucket log-probabilities, length ``buckets``.

    One explode + hash aggregation (map-side combine) over the corpus;
    collects exactly the <= B occupied-bucket counts. ``alpha`` is the
    add-alpha smoothing mass, so unseen buckets get
    ``log(alpha / (total + alpha·B))`` instead of ``-inf`` — the raw
    model must dominate the target everywhere for the importance ratio
    to exist.
    """
    rows = (
        df.select(
            F.explode(
                hashed_ngram_buckets(F.col(text_col), buckets, max_n, hash_fn=hash_fn)
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = np.zeros(buckets, dtype=np.float64)
    for r in rows:
        counts[r["b"]] = r["c"]
    total = counts.sum()
    return np.log(counts + alpha) - math.log(total + alpha * buckets)


def dsir_log_weights(
    raw: DataFrame,
    target_logprobs: np.ndarray,
    raw_logprobs: np.ndarray | None = None,
    text_col: str = "text",
    max_n: int = 2,
    out_col: str = "log_weight",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Add ``out_col`` = Σ_features (log p_target[b] − log p_raw[b]).

    ``raw_logprobs`` defaults to a fit over ``raw`` itself (one extra
    aggregation pass); pass a model fitted on a sample at scale. The
    scoring pass is map-side only: the B-sized ratio vector is an
    executor broadcast and each Arrow batch scores with one
    ``take``+``add.reduceat``-style numpy pass.
    """
    buckets = len(target_logprobs)
    if raw_logprobs is None:
        raw_logprobs = fit_ngram_model(
            raw, text_col=text_col, buckets=buckets, max_n=max_n, hash_fn=hash_fn
        )
    if len(raw_logprobs) != buckets:
        raise ValueError(
            f"model sizes differ: target {buckets} vs raw {len(raw_logprobs)}"
        )
    ratio = np.asarray(target_logprobs, dtype=np.float64) - np.asarray(
        raw_logprobs, dtype=np.float64
    )
    spark = raw.sparkSession
    ratio_bc = spark.sparkContext.broadcast(ratio)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _score(bucket_arrays: pd.Series) -> pd.Series:
        r = ratio_bc.value
        # NULL text (e.g. a missing JSONL key) arrives as a None array
        return bucket_arrays.map(
            lambda bs: float(r[np.asarray(bs, dtype=np.int64)].sum())
            if bs is not None and len(bs)
            else 0.0
        )

    return raw.withColumn(
        out_col, _score(hashed_ngram_buckets(F.col(text_col), buckets, max_n, hash_fn=hash_fn))
    )


def dsir_select(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    salt: str = "",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k over ``weight_col``: a deterministic sample of ``k``
    rows WITHOUT replacement, each row's inclusion proportional to
    ``exp(weight / temperature)`` — the DSIR resampling step.

    The Gumbel noise comes from ``xxhash64(id, salt)``, so the draw is
    reproducible across runs and partitionings; re-deal with a new
    ``salt``. ``temperature → 0`` degenerates to plain top-k by weight;
    large temperatures approach uniform sampling. Executes as
    per-partition top-k heaps (TakeOrdered) — no global sort shuffle.
    """
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    m = 2**31
    u = (
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)), F.lit(m)).cast("double")
        + 0.5
    ) / m
    gumbel = -F.log(-F.log(u))
    key = (
        F.col(weight_col) / temperature + gumbel
        if temperature > 0
        else F.col(weight_col) + F.lit(0.0)
    )
    return (
        weighted.withColumn("__gk", key)
        .orderBy(F.col("__gk").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__gk")
    )


def lm_cross_entropy(
    docs: DataFrame,
    logprobs: np.ndarray,
    text_col: str = "text",
    max_n: int = 2,
    out_col: str = "cross_entropy",
) -> DataFrame:
    """Per-document cross-entropy (nats/feature) under a hashed-ngram
    bucket model from :func:`fit_ngram_model` — the CCNet-style
    "perplexity against a quality corpus" filter (Wenzek et al. 2020
    use a 5-gram KenLM; a hashed bucket model is the engine-native
    stand-in): fit on a high-quality target, score the crawl, keep the
    low-perplexity head/middle.

    ``out_col`` = −(Σ log p[b]) / n_features; empty docs get NULL.
    Map-side only (broadcast log-prob vector + Arrow batches), like
    :func:`dsir_log_weights`. Lower = more target-like.
    """
    buckets = len(logprobs)
    lp = np.asarray(logprobs, dtype=np.float64)
    spark = docs.sparkSession
    lp_bc = spark.sparkContext.broadcast(lp)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _xent(bucket_arrays: pd.Series) -> pd.Series:
        v = lp_bc.value
        # NULL text (e.g. a missing JSONL key) arrives as a None array
        return bucket_arrays.map(
            lambda bs: -float(v[np.asarray(bs, dtype=np.int64)].mean())
            if bs is not None and len(bs)
            else None
        )

    return docs.withColumn(
        out_col, _xent(hashed_ngram_buckets(F.col(text_col), buckets, max_n))
    )
