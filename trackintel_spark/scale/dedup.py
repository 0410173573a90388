"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-duplicates.

Scale notes
-----------
* exact dedup: one hash aggregation — the cheapest possible plan;
* MinHash signatures use the *lexicographic minimum of
  md5(seed || shingle)* per permutation. This is engine-portable (any
  SQL engine with md5 computes the identical signature) and avoids a
  Python UDF; banding turns near-dup search into an equi-join on
  (band_id, band_hash) — the classic shuffle-friendly LSH plan;
* n-gram Jaccard is exact pairwise verification — use it AFTER LSH
  candidate generation, never as a full cross join at scale;
* SimHash packs 32 md5-digit dimensions into a bit string via one
  explode + groupBy;
* embedding near-dup: lossless direction-projection banding prunes the
  self-join (exact output; unit-norm friendly).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trackintel_spark.scale.text import tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (smallest id) per exact text; adds ``dup_count``.

    The exchange key is ``md5(text)``, not the text itself — multi-KB
    documents would otherwise become the shuffle hash/sort key. The
    explicit repartition on the digest satisfies the windows' clustered
    distribution on (digest, text) (hashing a key subset co-locates
    every group), so the full text only participates in the LOCAL sort
    as the tie-break against md5 collisions — results are exact.
    """
    d = df.withColumn("__k", F.md5(F.col(text_col).cast("string"))).repartition(F.col("__k"))
    w = Window.partitionBy("__k", text_col).orderBy(id_col)
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("__k", text_col)))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__k")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), lowercased.

    Built from n-1 shifted copies zipped with concat — O(tokens) per
    document. (The naive per-index ``slice`` construction is
    O(tokens^2): one array copy per shingle.) ``concat`` yields NULL
    past the end (zip_with pads the shorter side), so trailing partial
    shingles drop out in the filter.
    """
    toks = tokens(text)
    out = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(out, lambda x: x.isNotNull()))


# minhash permutation parameters: h_i(x) = (A(i) * x + B(i)) mod P with
# x = the first 7 md5 hex digits of the shingle as an integer. All
# engine-portable integer arithmetic; the deterministic A/B formulas are
# mirrored verbatim in SQL oracles.
MINHASH_P = 2147483647


def minhash_a(i: int) -> int:
    return 1000003 + 2 * i


def minhash_b(i: int) -> int:
    return 12345 + 7 * i


def minhash_hashes_expr(text: Column, shingle_n: int = 3) -> Column:
    """The shingle base-hash array (md5-prefix per shingle) as a Column
    expression — stage this as a REAL column in its own projection, then
    apply :func:`minhash_signature_from_hashes` in the next one. Spark's
    subexpression elimination skips lambda-bearing subtrees, so folding
    this into the same projection as the per-permutation mins would
    re-tokenize and re-digest the document once per permutation;
    Catalyst's CollapseProject keeps the two projections apart (the
    alias is non-cheap and multiply referenced), restoring 1x cost."""
    return F.transform(
        shingles(text, shingle_n),
        lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long"),
    )


def minhash_signature_from_hashes(hashes: Column, num_perm: int = 32) -> Column:
    """Per-permutation minima over a pre-staged base-hash column (see
    :func:`minhash_hashes_expr`). NULL for shingle-less documents."""

    def _perm_min(i: int) -> Column:
        # NOTE: the permutation index must be closed over, NOT passed as
        # a defaulted lambda arg — a two-argument transform lambda makes
        # Spark bind the second parameter to the ARRAY INDEX
        return F.array_min(
            F.transform(
                hashes,
                lambda h: (F.lit(minhash_a(i)) * h + F.lit(minhash_b(i))) % F.lit(MINHASH_P),
            )
        )

    sig = F.array(*[_perm_min(i) for i in range(num_perm)])
    return F.when(F.size(hashes) > 0, sig)


def minhash_signature_expr(
    text: Column, num_perm: int = 32, shingle_n: int = 3
) -> Column:
    """The MinHash signature as ONE per-row Column expression —
    identical values to :func:`minhash_signature` (same shingles, same
    md5-prefix base hash, same affine permutations), but with no
    explode/groupBy so it runs inside STREAMING projections (the batch
    layout's shuffle+combine is better for batch; an aggregation
    mid-stream would demand watermark state). NULL for shingle-less
    documents.

    Evaluating this in ONE projection digests the text once per
    permutation; hot paths should stage :func:`minhash_hashes_expr` as
    its own column first and apply
    :func:`minhash_signature_from_hashes` in the next projection (the
    streaming near-dup operator does)."""
    return minhash_signature_from_hashes(
        minhash_hashes_expr(text, shingle_n), num_perm
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_perm: int = 32,
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``minhash: array<long>`` — per-permutation minimum of an
    affine permutation of the shingle hash. Engine-portable, UDF-free.

    Plan shape: explode shingles ONCE, md5 ONCE per shingle (the 28-bit
    integer prefix), then num_perm cheap affine permutations + one hash
    aggregation with map-side partial mins. Hashing per (permutation x
    shingle) — the naive layout — costs num_perm x more digest work.
    Documents with no shingles get a NULL signature.
    """
    # spread documents across cores BEFORE the explode: small-document
    # tables often arrive as a single parquet split, serializing the
    # whole shingle+hash pipeline onto one task
    par = df.sparkSession.sparkContext.defaultParallelism
    ex = (
        df.select(F.col(id_col).alias("__mid"), F.col(text_col))
        .repartition(par)
        .select("__mid", F.explode(shingles(F.col(text_col), shingle_n)).alias("__s"))
    )
    # materialize the base hash first: referencing the md5 expression in
    # all num_perm projections would recompute it per permutation
    based = ex.selectExpr("__mid", "CAST(conv(substring(md5(__s), 1, 7), 16, 10) AS long) AS __h")
    hashed = based.selectExpr(
        "__mid",
        *[
            f"({minhash_a(i)} * __h + {minhash_b(i)}) % {MINHASH_P} AS __h{i}"
            for i in range(num_perm)
        ],
    )
    mins = ", ".join(f"min(__h{i})" for i in range(num_perm))
    sig = hashed.groupBy("__mid").agg(F.expr(f"array({mins}) AS minhash"))
    return df.join(sig, on=df[id_col] == sig["__mid"], how="left").drop("__mid")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Signature is split into ``bands`` bands of num_perm/bands rows; docs
    sharing any band hash become a candidate pair. Returns (id_a, id_b,
    jaccard_est) with id_a < id_b; jaccard_est = fraction of matching
    signature positions.
    """
    if not 0 < bands <= num_perm:
        raise ValueError(f"bands must be in (0, num_perm={num_perm}], got {bands}")
    if num_perm % bands != 0:
        # rows-per-band would silently drop trailing signature positions
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows = num_perm // bands
    sig_df = minhash_signature(df, text_col, num_perm, shingle_n, id_col=id_col).select(
        F.col(id_col).alias("__id"), "minhash"
    ).filter(F.col("minhash").isNotNull())
    band_structs = ", ".join(
        f"struct({b} AS band, md5(concat_ws('|', "
        + ", ".join(f"element_at(minhash, {b * rows + r + 1})" for r in range(rows))
        + ")) AS bhash)"
        for b in range(bands)
    )
    banded = sig_df.selectExpr(
        "__id", "minhash", f"explode(array({band_structs})) AS __band"
    ).selectExpr("__id", "minhash", "__band.band AS band", "__band.bhash AS bhash")
    a = banded.select(F.col("__id").alias("id_a"), F.col("minhash").alias("__ma"), "band", "bhash")
    b = banded.select(F.col("__id").alias("id_b"), F.col("minhash").alias("__mb"), "band", "bhash")
    pairs = (
        a.join(b, on=["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    eq = F.aggregate(
        F.zip_with("__ma", "__mb", lambda x, y: (x == y).cast("int")), F.lit(0), lambda acc, v: acc + v
    )
    return pairs.withColumn("jaccard_est", eq.cast("double") / F.size("__ma")).select(
        "id_a", "id_b", "jaccard_est"
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over md5 hex digits of tokens.

    Dimension d (1..32) contributes +1 when digit d of md5(token) is in
    [8..f], else -1; fingerprint bit d = (sum >= 0). One explode + one
    groupBy — engine-portable and UDF-free.
    """
    ex = df.select(F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("__tok"))
    # SQL-string column generators: the Column-object form cost ~300
    # py4j round trips for the 32 digit sums (r12 driver-cost note)
    digits = "('" + "', '".join("89abcdef") + "')"
    sums = [
        F.expr(
            f"sum(CASE WHEN substring(md5(__tok), {d + 1}, 1) IN {digits}"
            f" THEN 1 ELSE -1 END) AS __s{d}"
        )
        for d in range(32)
    ]
    agg = ex.groupBy("__id").agg(*sums)
    bits = ", ".join(f"CASE WHEN __s{d} >= 0 THEN '1' ELSE '0' END" for d in range(32))
    fp = agg.selectExpr(f"__id AS `{id_col}`", f"concat({bits}) AS simhash")
    return df.join(fp, on=id_col, how="left")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard similarity for document pairs.

    With ``candidates`` (e.g. LSH output) only those pairs are scored.
    Without, it runs the exact set-similarity join with PREFIX
    FILTERING (the PPJoin family, Xiao et al. WWW'08): shingles get a
    canonical global order by ascending document frequency, and a pair
    with J >= t must share a token within the first
    |S| - ceil(t*|S|) + 1 tokens of BOTH ordered sets — so only those
    prefix tokens (the rarest in each doc) are exploded into the
    equi-join. A boilerplate n-gram appearing in every document sorts
    to the END of the order and never enters the join, which bounds
    the hot-shingle fan-out that a plain shingle equi-join suffers on
    adversarial corpora. A |A|/|B| length-ratio prune (J >= t forces
    min/max >= t) runs inside the join, and exact Jaccard over the
    full shingle sets verifies every candidate — the filter is
    lossless, so the output matches the unfiltered join exactly.

    ``threshold <= 0`` would require emitting disjoint pairs too and
    falls back to the quadratic join — meaningless at scale on purpose.
    """
    sh = df.select(F.col(id_col).alias("__id"), shingles(F.col(text_col), n).alias("__sh"))
    if candidates is not None:
        a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"))
        b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"))
        pairs = candidates.select("id_a", "id_b").join(a, on="id_a").join(b, on="id_b")
        inter = F.size(F.array_intersect("__sa", "__sb"))
        union = F.size(F.array_union("__sa", "__sb"))
        jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
        return pairs.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
            "id_a", "id_b", "jaccard"
        )
    if threshold <= 0:
        a = sh.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"))
        b = sh.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        inter = F.size(F.array_intersect("__sa", "__sb"))
        union = F.size(F.array_union("__sa", "__sb"))
        jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
        return pairs.withColumn("jaccard", jac).select("id_a", "id_b", "jaccard")

    sized = sh.withColumn("__n", F.size("__sh")).filter(F.col("__n") > 0)
    ex = sized.select("__id", "__n", F.explode("__sh").alias("__s"))

    # canonical order = (document frequency asc, shingle): one agg over
    # the exploded shingles, joined back so each occurrence knows its
    # rarity; no rank assignment needed — the (df, s) struct IS the key
    tok_df = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    ordered = (
        ex.join(tok_df, on="__s")
        .groupBy("__id", "__n")
        .agg(F.array_sort(F.collect_list(F.struct("__df", "__s"))).alias("__sorted"))
    )
    # prefix length |S| - ceil(t*|S|) + 1; only these rarest tokens join
    pref = ordered.withColumn(
        "__p", (F.col("__n") - F.ceil(F.lit(float(threshold)) * F.col("__n")) + 1).cast("int")
    ).select("__id", "__n", F.explode(F.expr("slice(__sorted, 1, __p)")).alias("__t"))
    pa = pref.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__t")
    pb = pref.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__t")
    cand = (
        pa.join(pb, on="__t")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("__na").cast("double") >= threshold * F.col("__nb"))
            & (F.col("__nb").cast("double") >= threshold * F.col("__na"))
        )
        .select("id_a", "id_b", "__na", "__nb")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification over the full ordered shingle sets
    fa = ordered.select(F.col("__id").alias("id_a"), F.col("__sorted").alias("__sa"))
    fb = ordered.select(F.col("__id").alias("id_b"), F.col("__sorted").alias("__sb"))
    verified = cand.join(fa, on="id_a").join(fb, on="id_b")
    inter = F.size(F.array_intersect("__sa", "__sb"))
    jac = inter.cast("double") / (F.col("__na") + F.col("__nb") - inter)
    return verified.withColumn("jaccard", jac).filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def dedup_embedding_cosine(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_axes: int = 2,
    seed: int = 42,
    pca_sample: int = 2048,
    method: str = "exact",
    n_planes: int = 12,
    n_filter_axes: int = 6,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity — EXACT
    output (every pair with cos >= ``threshold``), with a LOSSLESS
    projection-banded candidate join.

    Cosine depends only on direction, so on the unit sphere
    ``cos(a,b) >= t  <=>  ||a_hat - b_hat|| <= w := sqrt(2 - 2t)``.
    Projection onto any unit axis is 1-Lipschitz, so a qualifying
    pair's normalized projections differ by <= ``w`` on EVERY axis —
    band ``n_axes`` unit axes with width ``w`` and probe the 3^n_axes
    neighbor cells: no qualifying pair can escape, and the exact-cosine
    filter verifies every candidate. (The earlier L2-norm banding
    pruned NOTHING on unit-norm embeddings — the common case for
    sentence/CLIP vectors — degenerating to an all-pairs join;
    direction banding prunes hardest exactly there.)

    Axis choice governs PRUNING only, never correctness, so the axes
    are the top principal directions of a bounded deterministic sample
    (``pca_sample`` rows by smallest ``xxhash64(id, seed)``; one
    dim x dim driver eigendecomposition): real embedding corpora are
    strongly anisotropic, and the top-variance directions spread the
    projections far wider than seeded random axes (onto which isotropic
    high-dim mass concentrates within ~1/sqrt(dim)). Beyond the banded
    join key, ``n_filter_axes`` further PCA projections ride along as a
    SCALAR prefilter — |Δprojection| <= w per axis is necessary, and r
    scalar compares reject most surviving candidates for ~1% of the
    full dim-length dot each would otherwise cost. Pruning also scales
    with the threshold: t = 0.95 gives w ~ 0.32; low thresholds widen
    bands and degrade gracefully toward all-pairs while staying exact.
    Zero-norm vectors have no direction and emit no pairs, matching the
    previous NULL-cosine behavior.

    Honest scaling guidance: a LOSSLESS candidate set over directions
    that are not strongly clustered is inherently near-quadratic — no
    axis choice changes that. method='exact' is the right tool for the
    tight near-dup regime (t >= ~0.98), strongly clustered corpora, or
    as the verifier behind another candidate generator
    (:func:`semantic_dedup` clusters, MinHash, ...). At millions of
    weakly-clustered vectors use ``method='lsh'``: sign-LSH buckets
    over ``n_planes`` random hyperplanes with single-bit-flip
    multiprobe — APPROXIMATE (recall < 1 by design) but candidate
    volume is ~N * (n_planes+1) * bucket-occupancy, controlled by
    ``n_planes`` (~log2(N) keeps buckets near-singleton) independent of
    data anisotropy. Exact cosine still verifies every emitted pair, so
    precision stays 1 in both modes.
    """
    if n_axes < 1:
        raise ValueError(f"n_axes must be >= 1, got {n_axes}")
    if method not in ("exact", "lsh"):
        raise ValueError(f"method must be 'exact' or 'lsh', got {method!r}")
    import numpy as np

    w = float(np.sqrt(max(2.0 - 2.0 * threshold, 0.0))) or 1e-9
    # probe the embedding dimension AFTER dropping NULL vectors — a NULL
    # first row would make F.size() return NULL and dim None (the row
    # itself is later dropped by the __norm > 0 filter anyway)
    first = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    dim = 1 if first is None or first["d"] is None else first["d"]

    v = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__norm", F.sqrt(F.aggregate("__v", F.lit(0.0), lambda a, x: a + x * x)))
    v = v.filter(F.col("__norm") > 0)
    rng = np.random.RandomState(seed)

    if method == "lsh":
        planes = rng.standard_normal((n_planes, dim))
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with("__v", F.array(*[F.lit(float(x)) for x in p]), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in planes
        ]
        v = v.withColumn("__b0", F.concat(*bits))
        a = v.select(
            F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
            F.col("__norm").alias("__na"), F.col("__b0").alias("__cell"),
        )
        flips = F.array(
            F.col("__b0"),
            *[
                F.concat(
                    F.substring("__b0", 1, i),
                    F.when(F.substring("__b0", i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
                    F.substring("__b0", i + 2, n_planes - i - 1),
                )
                for i in range(n_planes)
            ],
        )
        b = v.select(
            F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
            F.col("__norm").alias("__nb"), F.explode(flips).alias("__cell"),
        )
    else:
        # principal axes of a bounded sample of normalized vectors; fall
        # back to seeded random axes when the sample is degenerate
        samp = (
            emb.filter(F.col(vec_col).isNotNull())
            .select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v"))
            .orderBy(F.xxhash64(F.col("__id"), F.lit(seed)), F.col("__id"))
            .limit(max(pca_sample, n_axes))
            .collect()
        )
        n_want = min(n_axes + max(n_filter_axes, 0), dim)
        axes = rng.standard_normal((max(n_want, n_axes), dim))
        if samp:
            m = np.asarray([r["__v"] for r in samp], dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            mask = nrm[:, 0] > 0
            m = m[mask] / nrm[mask]
            if len(m) >= 2:
                cov = np.cov(m, rowvar=False)
                eigval, eigvec = np.linalg.eigh(np.atleast_2d(cov))
                top = eigvec[:, np.argsort(eigval)[::-1][:n_want]].T  # (n_want, dim)
                if top.shape[1] == dim and len(top) >= n_axes and np.all(np.isfinite(top)):
                    axes = top
        axes = axes / np.linalg.norm(axes, axis=1, keepdims=True)

        # band on the first n_axes projections; carry n_filter extra
        # PCA projections as a SCALAR prefilter — a qualifying pair
        # differs by <= w on every unit-axis projection (1-Lipschitz),
        # and r scalar compares reject most candidates for ~1% of the
        # cost of the full dim-length dot they would otherwise pay
        n_proj = min(len(axes), n_axes + n_filter_axes)
        proj = [
            F.aggregate(
                F.zip_with("__v", F.array(*[F.lit(float(x)) for x in axes[i]]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.col("__norm")
            for i in range(n_proj)
        ]
        cells = [F.floor(proj[i] / F.lit(w)).alias(f"__c{i}") for i in range(n_axes)]
        extras = [proj[i].alias(f"__p{i}") for i in range(n_axes, n_proj)]
        v = v.select("__id", "__v", "__norm", *cells, *extras)

        a = v.select(
            F.col("__id").alias("id_a"), F.col("__v").alias("__va"), F.col("__norm").alias("__na"),
            F.concat_ws(",", *[F.col(f"__c{i}") for i in range(n_axes)]).alias("__cell"),
            *[F.col(f"__p{i}").alias(f"__pa{i}") for i in range(n_axes, n_proj)],
        )
        # b probes its own cell plus every neighbor cell (3^n_axes keys)
        offsets = [[]]
        for _ in range(n_axes):
            offsets = [o + [d] for o in offsets for d in (-1, 0, 1)]
        probe_keys = F.array(
            *[
                F.concat_ws(",", *[F.col(f"__c{i}") + F.lit(o[i]) for i in range(n_axes)])
                for o in offsets
            ]
        )
        b = v.select(
            F.col("__id").alias("id_b"), F.col("__v").alias("__vb"), F.col("__norm").alias("__nb"),
            F.explode(probe_keys).alias("__cell"),
            *[F.col(f"__p{i}").alias(f"__pb{i}") for i in range(n_axes, n_proj)],
        )
        prefilter = [
            F.abs(F.col(f"__pa{i}") - F.col(f"__pb{i}")) <= F.lit(w)
            for i in range(n_axes, n_proj)
        ]
    pairs = a.join(b, on="__cell").filter(F.col("id_a") < F.col("id_b"))
    if method == "exact":
        for cond in prefilter:
            pairs = pairs.filter(cond)
    dot = F.aggregate(F.zip_with("__va", "__vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (F.col("__na") * F.col("__nb"))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Resolve candidate duplicate PAIRS into duplicate GROUPS and pick
    one canonical document per group — the step that turns
    ``minhash_lsh_candidates`` / ``ngram_jaccard_pairs`` /
    ``dedup_embedding_cosine`` output into an actual keep-list.

    Connected components over the pair graph (min-label propagation,
    plans/graph.py) give each document a ``cluster_id`` = the smallest
    member id; singletons are their own cluster. ``keep`` picks the
    canonical member: ``'min_id'`` (deterministic, cheap) or
    ``'longest'`` (max ``length_col``, ties to the smaller id — the
    usual "keep the longest variant" dedup policy).

    Returns docs columns + (cluster_id, is_canonical); the keep-list is
    ``filter("is_canonical")``.
    """
    if keep not in ("min_id", "longest"):
        raise ValueError(f"keep must be 'min_id' or 'longest', got {keep!r}")
    from trackintel_spark.plans.graph import connected_components

    cc = connected_components(pairs, "id_a", "id_b")
    out = (
        docs.join(cc, docs[id_col] == cc["vertex"], how="left")
        .drop("vertex")
        .withColumn("cluster_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
    if keep == "min_id":
        canon = F.col(id_col) == F.col("cluster_id")
        return out.withColumn("is_canonical", canon)
    pick = out.groupBy("cluster_id").agg(
        F.max_by(id_col, F.struct(F.col(length_col), -F.col(id_col))).alias("__keep")
    )
    return (
        out.join(pick, on="cluster_id", how="left")
        .withColumn("is_canonical", F.col(id_col) == F.col("__keep"))
        .drop("__keep")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_centers: int | None = None,
    centers: list[list[float]] | None = None,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codegen_max_terms: int = 20_000,
    max_compare: int | None = 1024,
    materialize_ranked: bool = False,
    pair_mode: str = "auto",
    auto_group_max_bytes: int = 64 << 20,
) -> DataFrame:
    """Semantic deduplication over an embedding column — the SemDeDup
    recipe (Abbas et al. 2023, arXiv:2303.09540): cluster the embedding
    space with spherical k-means, then prune within-cluster semantic
    duplicates, keeping per duplicate set the member FARTHEST from its
    cluster centroid (low centroid-cosine examples are the less
    prototypical, more informative ones — the paper's keep rule).

    The drop rule is the paper's triangular-matrix semantics: rank each
    cluster's members by (centroid_cosine asc, id asc); a member is
    dropped iff some EARLIER-ranked member of the same cluster has
    cosine >= ``threshold`` with it (whether or not that member was
    itself dropped). No transitive closure / connected components —
    one ranked self-join decides everything.

    Scale shape: assignment is map-side (codegen literal argmax, or one
    BLAS matmul per Arrow batch past ``codegen_max_terms`` — see
    :func:`trackintel_spark.scale.similarity.nearest_center_expr`); the
    only shuffles are the per-cluster rank window and the within-cluster
    equi-join on ``cluster_id``. The quadratic term is bounded by the
    largest cluster, so the cluster count must grow with the corpus
    (the paper runs ~11k clusters on 440M examples). The DEFAULT
    (``n_centers=None``, no ``centers``) auto-derives the cluster count
    from one cheap ``count()`` — ceil(N / 500), clamped to [16, 4096] —
    so the no-parameter call stays near-linear at any corpus size. Pass
    an explicit ``n_centers``, or precomputed ``centers`` (e.g. from
    :func:`kmeans_centers` on a sample, skipping the in-line Lloyd
    iterations), to override.

    ``max_compare`` is the per-cluster safety valve (the paper's own
    lever — SemDeDup subsamples oversized clusters): each member is
    verified against at most the ``max_compare`` EARLIEST-ranked
    earlier members of its cluster, so a ballooned cluster costs
    O(max_compare * size) comparisons instead of O(size^2). Clusters
    with <= ``max_compare`` + 1 members are judged EXACTLY (every
    earlier member ranks within the cap), so the cap only relaxes the
    drop rule on oversized clusters — capped ``is_kept`` is always a
    superset of the exact keep-set. Rank order (centroid_cosine asc)
    means the deduplicators are exactly the members the keep rule
    favors. The default (1024) makes the default path scale-proof even
    when clustering balloons; ``max_compare=None`` restores the exact
    unbounded drop rule.

    ``pair_mode`` picks the within-cluster verification strategy:

    * ``'auto'`` (default): ONE cluster-size histogram aggregate
      (bounded at the cluster count, <= 4096 rows pre-collect) routes
      each cluster by the single-task cost of its grouped BLAS block —
      clusters whose vectors fit ``auto_group_max_bytes`` in one task
      (members <= bytes / (8 * dim), never below ``max_compare + 1``)
      take the ``'grouped'`` path, genuinely corpus-sized clusters
      take the AQE-splittable ``'join'`` path. The cut is a TASK
      bound, not the cap: a capped mid-size cluster (say 2k members)
      is ~20x cheaper as one chunked matmul than as a pair join
      (the join evaluates a zip_with/aggregate fold per pair,
      allocating per-pair arrays — measured 29.5 s vs 1.6 s over
      32 x ~1.5k-member clusters on the 400k probe), so only clusters
      that would blow a task's memory ever pay the join. auto mode
      eagerly localCheckpoints the assigned+ranked frame (the
      histogram plus both routed branches then read storage instead of
      re-running the assignment scan per branch).
    * ``'join'``: the ranked self-join above — every pair's
      dot is a codegen fold, the shuffle is AQE-splittable, and a
      BALLOONED cluster's pair partition gets split across tasks.
      The skew-safe choice at any cluster-size distribution.
    * ``'grouped'``: one Arrow batch per cluster through
      ``applyInPandas``; each cluster's pair block is ONE chunked BLAS
      matmul (rows x min(size, cap) columns), so the per-pair
      expression overhead disappears — measured 5-8x faster on the
      contract-shaped workload (~500-member clusters; 400k x 32-dim
      probe: 34s -> 5s for the full dedup stage). The trade: a group
      cannot be split, so one corpus-sized cluster serializes into a
      single task (its matmul is still chunked, memory stays bounded).
      Decisions can differ from 'join' only for pairs whose cosine
      sits within float-rounding (~1e-15) of ``threshold`` (BLAS sums
      in a different order than the codegen fold).

    ``materialize_ranked=True`` localCheckpoints the assigned+ranked
    frame: the drop rule consumes it through THREE branches whose
    divergent column pruning defeats Catalyst's exchange reuse, so by
    default the assignment scan re-executes per branch (cheap relative
    to the pair join here, but a multiplier on the corpus scan when the
    input is itself expensive to recompute). The checkpoint costs
    executor storage of N x (dim + 4) doubles — opt in when the input
    lineage is heavy, leave off when storage is the scarcer resource.

    Returns one row per input row: (id_col, cluster_id,
    centroid_cosine, is_kept). Zero-norm vectors can't be placed on the
    sphere: they come back with NULL cluster_id/centroid_cosine and
    ``is_kept=True``. The keep-list is ``filter("is_kept")``.
    """
    from trackintel_spark.scale.similarity import kmeans_centers, nearest_center_expr

    v = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__n", F.sqrt(F.aggregate("__v", F.lit(0.0), lambda a, x: a + x * x)))
    placeable = v.filter(F.col("__n") > 0)

    if centers is None:
        if n_centers is None:
            # target ~500 members/cluster (SemDeDup's n_clusters ∝ corpus):
            # one cheap count keeps the per-cluster quadratic term bounded
            # with zero caller-side parameters
            n_centers = int(min(4096, max(16, -(-placeable.count() // 500))))
        centers = kmeans_centers(
            placeable,
            n_centers=n_centers,
            iters=iters,
            seed=seed,
            id_col="__id",
            vec_col="__v",
            codegen_max_terms=codegen_max_terms,
        )

    assigned = placeable.withColumn(
        "__a",
        nearest_center_expr(F.col("__v"), F.col("__n"), centers, codegen_max_terms),
    ).select(
        "__id", "__v", "__n",
        F.col("__a.cid").alias("cluster_id"),
        F.col("__a.ccos").alias("centroid_cosine"),
    )
    if pair_mode not in ("auto", "join", "grouped"):
        raise ValueError(
            f"pair_mode must be 'auto', 'join' or 'grouped', got {pair_mode!r}"
        )
    if max_compare is not None and max_compare < 1:
        raise ValueError(f"max_compare must be >= 1, got {max_compare}")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("centroid_cosine").asc(), F.col("__id").asc()
    )
    ranked = assigned.withColumn("__r", F.row_number().over(w))
    if materialize_ranked:
        ranked = ranked.localCheckpoint()

    zero_out = v.filter(~(F.col("__n") > 0)).select(
        F.col("__id").alias(id_col),
        F.lit(None).cast("long").alias("cluster_id"),
        F.lit(None).cast("double").alias("centroid_cosine"),
        F.lit(True).alias("is_kept"),
    )

    if pair_mode == "grouped":
        return _semantic_grouped_pairs(
            ranked, id_col, threshold, max_compare
        ).unionByName(zero_out)
    if pair_mode == "auto":
        # auto mode ALWAYS materializes the ranked frame first: the
        # histogram action would otherwise execute the center
        # assignment (a BLAS pandas UDF past codegen_max_terms — the
        # expensive stage) once for the routing decision and AGAIN per
        # routed branch. One eager localCheckpoint computes
        # assignment+rank exactly once and the histogram plus both
        # branches read the stored blocks. Storage cost is the frame
        # itself — the same bytes either branch's shuffle would carry.
        if not materialize_ranked:
            ranked = ranked.localCheckpoint()
        # the balloon cut is a single-TASK bound, not the cap: the
        # grouped kernel loads one cluster (members * dim * 8 bytes)
        # into one task and runs a chunked matmul — far cheaper per
        # pair than the join's zip_with fold — so only clusters whose
        # block would blow auto_group_max_bytes go to the splittable
        # join. Never cut below max_compare+1 (those are judged
        # EXACTLY by both paths, so BLAS changes nothing but wall).
        first = ranked.select(F.size("__v").alias("d")).first()  # cheap: storage-backed
        dim = int(first["d"]) if first is not None else 1
        exact_bound = (max_compare + 1) if max_compare is not None else 4096
        balloon = max(exact_bound, auto_group_max_bytes // (8 * max(dim, 1)))
        sizes = ranked.groupBy("cluster_id").count()
        big_ids = [
            r["cluster_id"]
            for r in sizes.filter(F.col("count") > balloon).collect()
        ]  # bounded: <= cluster count (<= 4096) rows aggregated, few survive
        if not big_ids:
            return _semantic_grouped_pairs(
                ranked, id_col, threshold, max_compare
            ).unionByName(zero_out)
        small = ranked.filter(~F.col("cluster_id").isin(big_ids))
        big = ranked.filter(F.col("cluster_id").isin(big_ids))
        return (
            _semantic_grouped_pairs(small, id_col, threshold, max_compare)
            .unionByName(_semantic_join_pairs(big, id_col, threshold, max_compare))
            .unionByName(zero_out)
        )
    return _semantic_join_pairs(ranked, id_col, threshold, max_compare).unionByName(
        zero_out
    )


def _semantic_join_pairs(
    ranked: DataFrame, id_col: str, threshold: float, max_compare: int | None
) -> DataFrame:
    """pair_mode='join': the within-cluster drop rule as a ranked
    equi-join on cluster_id (see :func:`semantic_dedup`). Every pair's
    dot is a codegen fold and the shuffle is AQE-splittable, so a
    ballooned cluster's pair partition gets split across tasks."""
    # NOTE (measured, r4): a centroid-angle triangle-inequality
    # prefilter (|acos(ccos_a) - acos(ccos_b)| <= acos(t)) before the
    # dot was tried and REVERTED — it doubled the drop-join wall at
    # 1.6M x 500-member clusters (interleaved A/B: 64 s -> 120 s) while
    # pruning nothing where clusters are tight; the per-pair predicate
    # cost exceeds the dot it would skip.
    later = ranked.select(
        "cluster_id", F.col("__id").alias("__li"), F.col("__v").alias("__lv"),
        F.col("__n").alias("__ln"), F.col("__r").alias("__lr"),
    )
    earlier = ranked.select(
        "cluster_id", F.col("__v").alias("__ev"), F.col("__n").alias("__en"),
        F.col("__r").alias("__er"),
    )
    if max_compare is not None:
        if max_compare < 1:
            raise ValueError(f"max_compare must be >= 1, got {max_compare}")
        earlier = earlier.filter(F.col("__er") <= max_compare)
    dot = F.aggregate(F.zip_with("__lv", "__ev", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    dropped = (
        later.join(earlier, on="cluster_id")
        .filter(F.col("__er") < F.col("__lr"))
        .filter(dot / (F.col("__ln") * F.col("__en")) >= threshold)
        .select(F.col("__li").alias("__id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return ranked.join(dropped, on="__id", how="left").select(
        F.col("__id").alias(id_col), "cluster_id", "centroid_cosine",
        F.coalesce(~F.col("__dup"), F.lit(True)).alias("is_kept"),
    )


def _semantic_grouped_pairs(
    ranked: DataFrame, id_col: str, threshold: float, max_compare: int | None
) -> DataFrame:
    """pair_mode='grouped': the within-cluster drop rule as one chunked
    BLAS matmul per cluster (see :func:`semantic_dedup`). One Arrow
    batch per cluster through ``applyInPandas``; memory per task is
    bounded by chunk x min(size, cap) doubles regardless of cluster
    size (the matmul is blocked), wall time of a ballooned cluster is
    the single-task trade documented on the ``pair_mode`` knob."""
    import numpy as np
    import pandas as pd

    from trackintel_spark.plans.partitioning import kernel_partitions

    id_type = ranked.schema["__id"].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("cluster_id", T.LongType()),
            T.StructField("centroid_cosine", T.DoubleType()),
            T.StructField("is_kept", T.BooleanType()),
        ]
    )
    thr = float(threshold)
    cap = max_compare

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__r", kind="stable").reset_index(drop=True)
        m = len(pdf)
        V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["__v"]])
        n = pdf["__n"].to_numpy(dtype=np.float64)
        Vn = V / n[:, None]
        ncap = m if cap is None else min(cap, m)
        E = Vn[:ncap].T  # (dim, ncap)
        dropped = np.zeros(m, dtype=bool)
        col = np.arange(ncap)
        chunk = 4096
        for s0 in range(0, m, chunk):
            s1 = min(s0 + chunk, m)
            S = Vn[s0:s1] @ E  # (rows, ncap)
            lim = np.minimum(np.arange(s0, s1), ncap)[:, None]
            dropped[s0:s1] = ((S >= thr) & (col[None, :] < lim)).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf["__id"],
                "cluster_id": pdf["cluster_id"].astype("int64"),
                "centroid_cosine": pdf["centroid_cosine"],
                "is_kept": ~dropped,
            }
        )

    ranked = ranked.repartition(kernel_partitions(ranked), F.col("cluster_id"))
    return ranked.groupBy("cluster_id").applyInPandas(kernel, schema=out_schema)


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    min_chars: int = 10,
    keep: str = "first",
    delimiter: str = "\n",
) -> DataFrame:
    """Cross-corpus exact LINE deduplication — the boilerplate-removal
    step of C4 / RefinedWeb-style web pipelines (intra-document
    repetition is :func:`trackintel_spark.scale.text.repetition_signals`;
    this removes lines that recur ACROSS documents: nav bars, cookie
    banners, footers).

    A line is *duplicated* when its exact trimmed text occurs in >=
    ``min_count`` distinct documents. ``keep='first'`` retains the
    occurrence in the smallest ``id_col`` document and strips the rest
    (the C4 convention); ``keep='none'`` strips every occurrence
    (RefinedWeb). Lines shorter than ``min_chars`` characters after
    trimming are exempt — short lines ("", "Introduction", "1.")
    collide by accident, not by provenance.

    Scale shape — skew-proof by construction. The killer case is a
    line present in EVERY document (a newsletter banner in 10⁹ docs):
    any window partitioned by the line would funnel those rows through
    one task, and AQE cannot split window skew. So no windows touch
    line groups; everything is aggregation + join, both AQE-splittable:

    1. ``posexplode`` lines, identity = ``md5(trimmed line)`` (128-bit;
       the shuffle never carries multi-KB raw lines — see collision
       note below);
    2. two-LEVEL distinct-doc count: ``groupBy(line, doc)`` first — the
       hot line's rows spread over the full cluster because the doc id
       is in the key — then ``groupBy(line)`` with map-side combine, so
       the hot reducer sees one row per upstream partition, not one per
       document. The same pass yields the first occurrence as
       ``min(struct(doc, pos))``;
    3. join the per-line verdict back (AQE skew-join splits the hot
       line's partition; the verdict side is one row per line), then
       one ``groupBy(doc)`` rebuilds ``text_col`` with ``sort_array``
       on the original line index — document order preserved exactly.

    Line identity is the md5 digest alone (unlike :func:`dedup_exact`,
    which tie-breaks on the full text): a 128-bit collision is ~10⁻²⁰
    even at 10¹⁵ distinct lines, and this operator is a heuristic
    cleaner — carrying full line text through two extra shuffles to
    chase that is the wrong trade.

    Returns one row per input document: all original columns with
    ``text_col`` rewritten, plus ``n_lines`` (original) and
    ``n_lines_removed``. Documents whose every line is stripped come
    back with an empty string.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    # F.split takes a Java regex; \Q...\E quotes the delimiter so '.'
    # or '|' split literally (array_join on the rebuild side is literal)
    # the raw line text never enters a shuffle (guide §8: decide with
    # small rows, move big rows once — r12): the census and the drop
    # decisions flow as (doc, pos, md5) rows only, and the surviving
    # text is re-sliced MAP-SIDE from the original document using the
    # dropped-position list. The previous shape carried every raw line
    # through the verdict join's __k exchange and again through the
    # per-doc rebuild exchange — 2x the corpus bytes shuffled for
    # information that 16-byte digests and integer positions encode.
    split_col = F.split(F.col(text_col), "\\Q" + delimiter + "\\E")
    # identity is unhex(md5) — 16 raw bytes, half the shuffle width of
    # the hex string and cheaper equality in every agg/join below
    lines = (
        docs.select(
            F.col(id_col).alias("__did"),
            F.posexplode(split_col).alias("__pos", "__line"),
        )
        .withColumn("__t", F.trim(F.col("__line")))
        .filter(F.length("__t") >= min_chars)
        .select(
            "__did",
            "__pos",
            F.unhex(F.md5(F.col("__t"))).alias("__k"),
        )
    )
    per_doc = lines.groupBy("__k", "__did").agg(F.min("__pos").alias("__mp"))
    verdict = per_doc.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__docs"),
        F.min(F.struct(F.col("__did"), F.col("__mp"))).alias("__first"),
    )
    # only lines duplicated across >= min_count docs can ever be
    # dropped, so probe with an INNER join against that (selective)
    # verdict subset instead of left-joining every occurrence against
    # every distinct line: AQE broadcasts the dup side when small and
    # the short/unique majority of the corpus never enters the join
    dup = verdict.filter(F.col("__docs") >= min_count)
    flagged = lines.join(dup, on="__k", how="inner")
    if keep == "first":
        flagged = flagged.filter(
            ~(
                (F.col("__did") == F.col("__first.__did"))
                & (F.col("__pos") == F.col("__first.__mp"))
            )
        )
    # per doc: just the sorted dropped positions — a few ints, never
    # text. The removed COUNT is a separate declarative column so a
    # consumer that only reads the stats (the bench probe, any QC
    # rollup) lets Spark prune the collect_list/sort_array entirely and
    # run this as a codegen hash agg
    drops = flagged.groupBy("__did").agg(
        F.sort_array(F.collect_list("__pos")).alias("__dropped"),
        F.count(F.lit(1)).alias("__nd"),
    )
    # a prior run's stat columns are superseded, not duplicated — keeps
    # the operator idempotently chainable
    base_docs = docs.drop("n_lines", "n_lines_removed")
    out = (
        base_docs.join(drops, base_docs[id_col] == drops["__did"], how="left")
        .withColumn("__dropped", F.coalesce("__dropped", F.array().cast("array<int>")))
        # NULL guard on BOTH stat columns (r13, ADVICE r12): size(NULL)
        # returns -1 instead of NULL on sessions running with
        # spark.sql.ansi.enabled=false / legacy sizeOfNull semantics, so
        # an unguarded n_lines would silently diverge from the old
        # left-join shape there
        .withColumn(
            "n_lines",
            F.when(split_col.isNotNull(), F.size(split_col)).cast("long"),
        )
        # NULL-text docs produced no line rows before — keep their stat
        # columns NULL like the old left-join shape did
        .withColumn(
            "n_lines_removed",
            F.when(split_col.isNotNull(), F.coalesce("__nd", F.lit(0))).cast("long"),
        )
        .withColumn(
            text_col,
            F.array_join(
                F.filter(split_col, lambda l, i: ~F.array_contains(F.col("__dropped"), i)),
                delimiter,
            ),
        )
    )
    return out.drop("__did", "__dropped", "__nd")


def chunk_dedup_fraction(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
    stride: int = 10,
    min_count: int = 2,
    out_col: str = "dup_chunk_fraction",
) -> DataFrame:
    """Fraction of each document's token windows that recur in other
    documents — the scalable stand-in for exact-substring dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499, build suffix arrays; a hashed
    sliding-window census finds the same long verbatim overlaps at a
    vocabulary-bounded cost and Spark-native shapes).

    A *chunk* is ``window`` consecutive tokens sampled every ``stride``
    tokens; a chunk is *duplicated* when its exact token sequence
    occurs in >= ``min_count`` distinct documents. Returns all input
    columns + ``n_chunks`` + ``out_col`` (NULL for docs shorter than
    ``window`` tokens — no chunk to judge). Filter policy is the
    caller's (e.g. drop ``dup_chunk_fraction > 0.5``, the usual
    "mostly-boilerplate" cut).

    Scale shape mirrors :func:`line_dedup` (skew-proof, no windows over
    chunk groups): chunk ids are ``xxhash64`` of the joined window —
    O(tokens/stride) per doc, built with one ``transform`` over a
    ``sequence`` (no per-window explode until the census) — then a
    two-level distinct-doc count (groupBy(chunk, doc) spreads
    corpus-wide chunks, map-side-combined groupBy(chunk)) and an
    AQE-skew-splittable join back.
    """
    toks = tokens(F.col(text_col))
    n_ = F.size(toks)
    starts = F.when(
        n_ >= window, F.sequence(F.lit(0), n_ - window, F.lit(max(stride, 1)))
    ).otherwise(F.array())
    chunk_ids = F.transform(
        starts,
        lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice(toks, i + 1, window))),
    )
    base = docs.select(F.col(id_col).alias("__did"), chunk_ids.alias("__chunks"))
    ex = base.select("__did", F.explode("__chunks").alias("__c"))
    per_doc = ex.groupBy("__c", "__did").agg(F.count(F.lit(1)).alias("__occ"))
    census = per_doc.groupBy("__c").agg(F.count(F.lit(1)).alias("__docs"))
    dup_per_doc = (
        per_doc.join(census, on="__c")
        .filter(F.col("__docs") >= min_count)
        .groupBy("__did")
        .agg(F.sum("__occ").alias("__dup"))
    )
    counts = base.select("__did", F.size("__chunks").alias("n_chunks")).join(
        dup_per_doc, on="__did", how="left"
    )
    frac = F.when(
        F.col("n_chunks") > 0,
        F.coalesce(F.col("__dup"), F.lit(0)).cast("double") / F.col("n_chunks"),
    )
    out = counts.withColumn(out_col, frac).drop("__dup")
    return docs.join(
        out.select(F.col("__did").alias(id_col), "n_chunks", out_col), on=id_col, how="left"
    )


def dedup_substrings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
    stride: int = 8,
    min_count: int = 2,
    keep: str = "first",
) -> DataFrame:
    """Remove duplicated token SPANS from documents — the strided,
    census-based approximation of exact-substring deduplication (Lee et
    al. 2022, arXiv:2107.06499, build suffix arrays over the corpus;
    this finds the same long verbatim overlaps at O(tokens/stride) rows
    per document and Spark-native shapes).

    A *chunk* is ``window`` consecutive tokens sampled every ``stride``
    tokens (case-SENSITIVE, original text — removal must preserve what
    it keeps). A chunk occurrence is *duplicated* when its exact token
    sequence occurs in >= ``min_count`` distinct documents;
    ``keep='first'`` exempts the single occurrence at the smallest
    (doc, position) (Lee et al. keep one copy), ``keep='none'`` strips
    every occurrence. Flagged occurrences merge into token spans
    [start, start+window); the returned ``text`` is rebuilt from the
    complement intervals, whitespace-normalized (single spaces — the
    tokenizer's inverse, same convention as :func:`line_dedup`'s
    trimmed lines).

    Returns the input columns with ``text_col`` replaced by the rebuilt
    text, plus ``n_tokens``, ``n_tokens_removed``, ``n_spans_removed``;
    docs shorter than ``window`` tokens lose no tokens (no chunk to
    judge — n_spans_removed = 0; their text is still
    whitespace-normalized by the rebuild, like every output row).

    Scale shape — skew-proof, mirrors :func:`line_dedup` /
    :func:`chunk_dedup_fraction`:

    - chunk hashes are ``xxhash64`` of the joined window (collision
      probability ~n²/2⁶⁴ — negligible; no raw chunk strings shuffle);
    - the census is a two-level aggregation: groupBy(chunk, doc)
      spreads corpus-wide boilerplate chunks across tasks before the
      per-chunk distinct-doc count — a banner chunk present in every
      document never funnels one task;
    - NO windows over chunk groups and no per-doc kernels: span
      merging and the complement rebuild are O(tokens) ``aggregate`` /
      ``transform`` expressions over the per-doc sorted start arrays
      (bounded by tokens/stride), fully codegen'd;
    - the plan reads the input several times (census branch, rebuild
      branch, column-preserve join) — persist ``docs`` upstream when
      it is itself an expensive lineage rather than a table scan.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")

    # case-sensitive tokens: rebuild must preserve original casing
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(
        F.col(id_col).alias("__did"), toks.alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    base = base.withColumn(
        "__starts",
        F.when(
            F.col("__n") >= window,
            F.sequence(F.lit(0), F.col("__n") - window, F.lit(max(stride, 1))),
        ).otherwise(F.array().cast("array<int>")),
    )

    occ = base.select(
        "__did",
        F.explode(
            F.transform(
                "__starts",
                lambda s: F.struct(
                    s.alias("s"),
                    F.xxhash64(F.concat_ws("\x1f", F.slice("__toks", s + 1, window))).alias("c"),
                ),
            )
        ).alias("__o"),
    ).select("__did", F.col("__o.s").alias("__s"), F.col("__o.c").alias("__c"))

    # census: distinct docs per chunk + the keeper occurrence (lexico
    # min (doc, start)); two-level so hot chunks spread first
    per_doc = occ.groupBy("__c", "__did").agg(F.min("__s").alias("__minpos"))
    census = per_doc.groupBy("__c").agg(
        F.count(F.lit(1)).alias("__docs"),
        F.min(F.struct("__did", "__minpos")).alias("__keeper"),
    )
    flagged = occ.join(
        census.filter(F.col("__docs") >= min_count).select("__c", "__keeper"), on="__c"
    )
    if keep == "first":
        flagged = flagged.filter(
            ~((F.col("__did") == F.col("__keeper.__did")) & (F.col("__s") == F.col("__keeper.__minpos")))
        )
    spans_per_doc = flagged.groupBy("__did").agg(
        F.sort_array(F.collect_set("__s")).alias("__fs")
    )

    with_spans = base.join(spans_per_doc, on="__did", how="left").withColumn(
        "__fs", F.coalesce(F.col("__fs"), F.array().cast("array<int>"))
    )

    # merge flagged starts into disjoint [s, e) spans: fold over the
    # sorted starts, extending the last span when the next start lands
    # inside it (starts are sorted, so only the tail can merge)
    empty_spans = F.array().cast("array<struct<s:int,e:int>>")
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    merged = F.aggregate(
        "__fs",
        empty_spans,
        lambda acc, s: F.when(
            (F.size(acc) == 0) | (s > last(acc)["e"]),
            F.concat(acc, F.array(F.struct(s.alias("s"), (s + window).alias("e")))),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], s + window).alias("e"),
                    )
                ),
            )
        ),
    )
    with_spans = with_spans.withColumn("__spans", merged)

    # complement intervals [keep_s, keep_e): walk the spans with a fold
    # carrying (cursor, kept-intervals); spans are disjoint + sorted
    empty_keeps = F.array().cast("array<struct<s:int,e:int>>")
    folded = F.aggregate(
        "__spans",
        F.struct(F.lit(0).alias("cur"), empty_keeps.alias("ivs")),
        lambda acc, sp: F.struct(
            sp["e"].alias("cur"),
            F.when(
                sp["s"] > acc["cur"],
                F.concat(
                    acc["ivs"], F.array(F.struct(acc["cur"].alias("s"), sp["s"].alias("e")))
                ),
            ).otherwise(acc["ivs"]).alias("ivs"),
        ),
        lambda acc: F.when(
            acc["cur"] < F.col("__n"),
            F.concat(
                acc["ivs"], F.array(F.struct(acc["cur"].alias("s"), F.col("__n").alias("e")))
            ),
        ).otherwise(acc["ivs"]),
    )
    with_spans = with_spans.withColumn("__keeps", folded)

    kept_tokens = F.flatten(
        F.transform("__keeps", lambda iv: F.slice("__toks", iv["s"] + 1, iv["e"] - iv["s"]))
    )
    n_removed = F.aggregate(
        "__spans", F.lit(0), lambda acc, sp: acc + (sp["e"] - sp["s"])
    )
    out = with_spans.select(
        F.col("__did").alias(id_col),
        F.array_join(kept_tokens, " ").alias(text_col),
        F.col("__n").alias("n_tokens"),
        n_removed.alias("n_tokens_removed"),
        F.size("__spans").alias("n_spans_removed"),
    )
    # preserve the caller's other columns (line_dedup convention); a
    # prior run's stat columns are superseded, not duplicated — dropping
    # them keeps the operator idempotently chainable
    return docs.drop(
        text_col, "n_tokens", "n_tokens_removed", "n_spans_removed"
    ).join(out, on=id_col, how="left")
