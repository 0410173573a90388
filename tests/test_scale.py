"""Scale extensions: dedup, similarity search, text analysis, multimodal
plumbing — driven on the real driver testdata tables."""

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import (
    cosine_topk_bruteforce,
    dedup_embedding_cosine,
    dedup_exact,
    detect_language,
    document_fingerprint,
    lsh_bucketed_topk,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    token_count,
)
from trackintel_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_dedup_exact(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "x y z")], "doc_id long, text string"
    )
    out = dedup_exact(df).orderBy("doc_id").collect()
    assert [(r.doc_id, r.dup_count) for r in out] == [(0, 2), (2, 1)]


def test_minhash_identical_docs_identical_signatures(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different words here nothing shared at all whatsoever")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.minhash for r in minhash_signature(df, num_perm=16).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog on a sunny morning in the park"
    near = base.replace("sunny", "rainy")
    far = "entirely unrelated content about database query optimization and spark plans"
    df = spark.createDataFrame([(0, base), (1, near), (2, far)], "doc_id long, text string")
    pairs = minhash_lsh_candidates(df, num_perm=32, bands=16).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f"), (2, "q r s t u v")], "doc_id long, text string"
    )
    out = ngram_jaccard_pairs(df, n=2, threshold=0.9).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]
    assert out[0].jaccard == 1.0


def test_ngram_jaccard_prefix_filter_matches_bruteforce(spark):
    """The PPJoin-style prefix filter is lossless: its output must equal
    the brute-force all-pairs Jaccard at every threshold — including on
    a corpus where one boilerplate shingle appears in EVERY document
    (the hot-token case the prefix order exists to neutralize)."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(24):
        words = rng.sample(vocab, rng.randint(6, 12))
        # shared boilerplate prefix on every doc -> hot shingles
        docs.append((i, "footer legal text " + " ".join(words)))
    # plus three exact/near duplicates
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " extra"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def brute(n, t):
        import re

        def sh(s):
            toks = re.findall(r"\S+", s.lower())
            return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

        sets = {i: sh(s) for i, s in docs}
        out = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                out.add((a, b, round(j, 9)))
        return out

    for n, t in [(2, 0.5), (3, 0.8), (2, 0.95), (1, 0.3)]:
        got = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(df, n=n, threshold=t).collect()
        }
        assert got == brute(n, t), (n, t)


def test_simhash_similar_docs_close(spark):
    base = "the quick brown fox jumps over the lazy dog again and again every day"
    df = spark.createDataFrame(
        [(0, base), (1, base + " truly"), (2, "spark catalyst optimizer rewrites logical plans into physical ones")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.simhash for r in simhash(df).collect()}
    ham01 = sum(a != b for a, b in zip(out[0], out[1]))
    ham02 = sum(a != b for a, b in zip(out[0], out[2]))
    assert len(out[0]) == 32
    assert ham01 < ham02


def test_embedding_cosine_dedup(spark, emb):
    # duplicate vector 0 with id 10_000: must be found as a near-dup pair
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(10_000).cast("long"))
    out = dedup_embedding_cosine(emb.unionByName(dup), threshold=0.999).collect()
    assert any(r.id_a == 0 and r.id_b == 10_000 for r in out)


def test_embedding_cosine_dedup_exact_on_unit_norm(spark):
    """Projection banding is LOSSLESS: on unit-norm vectors (the case
    where the old norm banding pruned nothing) the output must equal
    the brute-force all-pairs result exactly, for several thresholds."""
    import numpy as np

    rng = np.random.RandomState(7)
    vs = rng.standard_normal((60, 16))
    # plant tight near-dup clusters
    for i in range(0, 30, 3):
        vs[i + 1] = vs[i] + 0.05 * rng.standard_normal(16)
        vs[i + 2] = vs[i] + 0.02 * rng.standard_normal(16)
    vs /= np.linalg.norm(vs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<double>",
    )
    sims = vs @ vs.T
    for t in (0.5, 0.9, 0.99):
        expect = {
            (i, j): sims[i, j]
            for i in range(len(vs))
            for j in range(i + 1, len(vs))
            if sims[i, j] >= t
        }
        got = {(r.id_a, r.id_b): r.cosine for r in dedup_embedding_cosine(df, threshold=t).collect()}
        assert set(got) == set(expect), f"threshold {t}"
        for k_ in got:
            assert abs(got[k_] - expect[k_]) < 1e-9


def test_cosine_topk_bruteforce(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = cosine_topk_bruteforce(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    # self-similarity must rank first
    firsts = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    assert all(q == v for q, v in firsts.items())


def test_lsh_topk_recall_at_1(spark, emb):
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = lsh_bucketed_topk(emb, queries, k=3, n_planes=6)
    firsts = {r.query_id: r.vec_id for r in out.collect() if r.rank == 1}
    # the query vector itself always falls in its own bucket -> recall@1 = 1
    assert all(q == v for q, v in firsts.items())


def test_topk_rank_deterministic_under_exact_ties(spark):
    """Crafted tied fixture (r9 VERDICT #8): duplicate vectors are
    mathematically tied on cosine, so ranks must resolve by vec_id —
    and the rounded-score rank (the bm25 convention) keeps boundary
    ranks stable when float sum order injects sub-ulp noise."""
    from trackintel_spark.scale.similarity import cosine_topk_bruteforce, lsh_bucketed_topk

    # 8 distinct directions, each duplicated 3x -> every cosine tied 3-way
    base = [[float((i * 7 + j * 3) % 11) + 1.0 for j in range(8)] for i in range(8)]
    rows = [(i * 10 + c, base[i]) for i in range(8) for c in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame([(0, base[0])], "query_id long, embedding array<double>")

    for fn in (
        lambda: cosine_topk_bruteforce(emb, queries, k=3),
        lambda: lsh_bucketed_topk(emb, queries, k=3, n_planes=4),
    ):
        runs = [tuple((r.rank, r.vec_id) for r in sorted(fn().collect(), key=lambda r: r.rank))
                for _ in range(3)]
        assert runs[0] == runs[1] == runs[2]
        # the tied triple {0, 1, 2} of the query's own direction must
        # occupy ranks 1..3 in vec_id order
        assert runs[0] == ((1, 0), (2, 1), (3, 2))


def test_token_count_and_quality(spark, docs):
    out = quality_score(docs.withColumn("n_tok", token_count(F.col("text")))).limit(50).collect()
    for r in out:
        assert r.n_tok == len(r.text.split())
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is warm"),
            (1, "der hund ist nicht zu hause und die katze"),
            (2, "le chat est sur la table et il ne dort pas"),
            (3, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in detect_language(df).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr"
    assert out[3] is None


def test_document_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, "other text")], "doc_id long, text string"
    )
    out = {r.doc_id: r.fingerprint for r in document_fingerprint(df).collect()}
    assert out[0] == out[1] != out[2]


def test_multimodal_plumbing(spark):
    from trackintel_spark.scale.multimodal import attach_media_metadata, extract_features, sample_video_frames

    df = spark.createDataFrame(
        [(0, bytearray(b"\x89PNG\r\n" + b"x" * 100)), (1, bytearray(b"RIFF" + b"y" * 300))],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r.media_meta for r in attach_media_metadata(df).collect()}
    assert meta[0].format == "png" and meta[0].media_type == "image"
    assert meta[1].format == "riff" and meta[1].media_type == "audio"

    # RIFF disambiguation + BMP sniff (ADVICE r9): WEBP is RIFF-contained
    # and must be an image; WAVE stays audio; "BM" is bmp.
    df2 = spark.createDataFrame(
        [
            (10, bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"z" * 32)),
            (11, bytearray(b"RIFF\x00\x00\x00\x00WAVEfmt " + b"z" * 32)),
            (12, bytearray(b"BM" + b"\x00" * 40)),
        ],
        "doc_id long, payload binary",
    )
    meta2 = {r.doc_id: r.media_meta for r in attach_media_metadata(df2).collect()}
    assert meta2[10].format == "webp" and meta2[10].media_type == "image"
    assert meta2[11].format == "wav" and meta2[11].media_type == "audio"
    assert meta2[12].format == "bmp" and meta2[12].media_type == "image"

    feats = extract_features(df, feature_dim=16).collect()
    assert len(feats) == 2 and all(len(r.features) == 16 for r in feats)
    # determinism
    feats2 = extract_features(df, feature_dim=16).collect()
    assert {r.doc_id: r.features for r in feats} == {r.doc_id: r.features for r in feats2}

    frames = sample_video_frames(df).collect()
    assert len(frames) > 2
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_video_frames(df, decode_stub=False).collect()


def test_multimodal_real_decode(spark):
    """PPM and PCM WAV need no codec library, so their decode path is
    REAL: pixel means, nearest-neighbor resize round-trips, and audio
    statistics must match values computed directly from the payloads."""
    import io
    import wave

    import numpy as np

    from trackintel_spark.scale.multimodal import (
        attach_media_metadata,
        audio_features,
        decode_ppm,
        encode_ppm,
        image_features,
        resize_images,
    )

    img0 = np.zeros((2, 3, 3), dtype=np.uint8)
    img0[..., 0] = 200  # pure red-ish
    img1 = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    sig = (np.sin(2 * np.pi * 440 * np.arange(1600) / 16000) * 16000).astype("<i2")
    w.writeframes(sig.tobytes())
    w.close()
    rows = [
        (0, bytearray(encode_ppm(img0))),
        (1, bytearray(encode_ppm(img1))),
        (2, bytearray(buf.getvalue())),
        (3, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    meta = {r.doc_id: r.media_meta for r in attach_media_metadata(df).collect()}
    assert meta[0].format == "ppm" and meta[0].media_type == "image"
    assert meta[2].format == "wav" and meta[2].media_type == "audio"
    assert meta[3].format is None

    feats = {r.doc_id: r for r in image_features(df).collect()}
    assert (feats[0].width, feats[0].height) == (3, 2)
    assert feats[0].mean_r == pytest.approx(200.0) and feats[0].mean_b == pytest.approx(0.0)
    assert feats[1].mean_r == pytest.approx(float(img1[..., 0].mean()))
    assert feats[2].width is None and feats[3].width is None  # non-images: NULLs

    # resize: 4x4 -> 2x2 nearest-neighbor picks rows/cols 0 and 2
    resized = {r.doc_id: bytes(r.payload) for r in resize_images(df, 2, 2).collect()}
    got = decode_ppm(resized[1])
    assert (got == img1[[0, 2]][:, [0, 2]]).all()
    assert resized[3] == b"not media at all"  # non-PPM passes through

    au = {r.doc_id: r for r in audio_features(df).collect()}
    a = au[2]
    assert a.sample_rate == 16000 and a.n_samples == 1600
    assert a.duration_s == pytest.approx(0.1)
    assert a.rms == pytest.approx(float(np.sqrt(np.mean((sig / 32768.0) ** 2))), abs=1e-12)
    assert 0.05 < a.zero_cross_rate < 0.06  # 440 Hz at 16 kHz: ~0.055
    assert au[0].sample_rate is None  # images: NULLs

    with pytest.raises(ValueError):
        resize_images(df, 0, 2)


def test_ivf_topk_full_probe_equals_bruteforce(spark):
    from pyspark.sql import functions as F

    from trackintel_spark.scale import cosine_topk_bruteforce, ivf_topk
    from trackintel_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.rank): r.vec_id for r in cosine_topk_bruteforce(emb, queries, k=5).collect()}
    full = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(emb, queries, k=5, n_centers=6, n_probe=6).collect()
    }
    assert full == exact


def test_ivf_topk_partial_probe_recall(spark):
    from pyspark.sql import functions as F

    from trackintel_spark.scale import cosine_topk_bruteforce, ivf_topk
    from trackintel_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centers=8, n_probe=3).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # the synthetic embeddings are structureless, so IVF recall is about
    # n_probe / n_centers; real clustered data does better
    assert recall >= 0.6 * (3 / 8)
    # every returned hit must carry its true exact cosine (rescore is exact)
    exact_cos = {(r.query_id, r.vec_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_cos:
            assert abs(r.cosine - exact_cos[(r.query_id, r.vec_id)]) < 1e-12


def test_connected_components_basic(spark):
    from trackintel_spark.plans.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], "a long, b long"
    )
    got = {r.vertex: r.component for r in connected_components(edges).collect()}
    # {1,2,3,8,9} merge through 9-1; {5,6} separate
    assert got == {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 5: 5, 6: 5}


def test_connected_components_fast_path_equals_distributed(spark):
    """The union-find fast path and the min-label loop must agree —
    including chains (pointer jumping), self-loops, and singletons-via-
    self-loop."""
    import random

    from trackintel_spark.plans.graph import connected_components

    rng = random.Random(7)
    # a long chain, a star, random merges, a self-loop vertex
    pairs = [(i, i + 1) for i in range(40, 80)]  # chain
    pairs += [(100, 100 + i) for i in range(1, 9)]  # star
    pairs += [(rng.randrange(200, 240), rng.randrange(200, 240)) for _ in range(30)]
    pairs += [(999, 999)]  # self-loop only
    edges = spark.createDataFrame(pairs, "a long, b long")

    fast = {r.vertex: r.component for r in connected_components(edges).collect()}
    slow = {
        r.vertex: r.component
        for r in connected_components(edges, small_graph_edges=0).collect()
    }
    assert fast == slow
    assert fast[999] == 999
    assert all(fast[v] == 40 for v in range(40, 81))


def test_dedup_clusters_end_to_end(spark):
    from pyspark.sql import functions as F

    from trackintel_spark.scale import dedup_clusters, minhash_lsh_candidates
    from trackintel_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = minhash_lsh_candidates(docs, num_perm=16, bands=8, shingle_n=2)
    out = dedup_clusters(docs, pairs, keep="min_id").persist()
    assert out.count() == docs.count()  # every doc labeled
    # exactly one canonical per cluster
    per = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"), F.count(F.lit(1)).alias("n")
    )
    assert per.filter(F.col("n_canon") != 1).count() == 0
    # min_id policy: canonical == cluster_id
    assert out.filter(F.col("is_canonical") & (F.col("doc_id") != F.col("cluster_id"))).count() == 0
    # clusters agree with the pair graph: paired docs share a cluster
    lbl = {r.doc_id: r.cluster_id for r in out.collect()}
    for r in pairs.collect():
        assert lbl[r.id_a] == lbl[r.id_b]


def test_dedup_clusters_longest_policy(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "aa", 2), (1, "aaaa", 4), (2, "a", 1), (7, "zz", 2)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    from trackintel_spark.scale import dedup_clusters

    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(docs, pairs, keep="longest").collect()}
    assert out[0] == (0, False) and out[1] == (0, True) and out[2] == (0, False)
    assert out[7] == (7, True)  # singleton keeps itself


def test_shuffle_deterministic_is_a_stable_permutation(spark, docs):
    from trackintel_spark.scale import shuffle_deterministic

    base = docs.select("doc_id", "text").limit(200)
    out = {r.doc_id: r.shuffle_pos for r in shuffle_deterministic(base, "doc_id").collect()}
    # a permutation of 0..n-1
    assert sorted(out.values()) == list(range(200))
    # partitioning-invariant and rerun-stable
    again = {
        r.doc_id: r.shuffle_pos
        for r in shuffle_deterministic(base.repartition(7), "doc_id").collect()
    }
    assert again == out
    # salt re-deals, md5 variant is its own (portable) order
    salted = {r.doc_id: r.shuffle_pos for r in shuffle_deterministic(base, "doc_id", salt="x").collect()}
    assert salted != out and sorted(salted.values()) == list(range(200))
    md5 = {r.doc_id: r.shuffle_pos for r in shuffle_deterministic(base, "doc_id", hash_fn="md5").collect()}
    assert sorted(md5.values()) == list(range(200))
    # duplicate keys still get distinct positions (tie-break is total)
    dup = base.unionByName(base.limit(5))
    dd = shuffle_deterministic(dup, "doc_id").collect()
    assert sorted(r.shuffle_pos for r in dd) == list(range(205))
    import pytest as _pt

    with _pt.raises(ValueError, match="hash_fn"):
        shuffle_deterministic(base, "doc_id", hash_fn="crc")


def test_split_by_hash_deterministic_and_proportional(spark, docs):
    from trackintel_spark.scale import split_by_hash

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_by_hash(docs, "doc_id", fr)
    b = split_by_hash(docs, "doc_id", fr)
    assert {(r.doc_id, r.split) for r in a.collect()} == {(r.doc_id, r.split) for r in b.collect()}
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert counts["train"] / n > 0.7 and counts["val"] / n < 0.2
    # different salt re-deals
    c = split_by_hash(docs, "doc_id", fr, salt="v2")
    assert {(r.doc_id, r.split) for r in c.collect()} != {(r.doc_id, r.split) for r in a.collect()}


def test_pack_sequences_respects_budget(spark, docs):
    from trackintel_spark.scale import pack_sequences
    from trackintel_spark.scale.text import token_count

    d = docs.withColumn("n_tokens", token_count(F.col("text")))
    out = pack_sequences(d, max_tokens=120, num_partitions=4).persist()
    assert out.count() == d.count()  # every doc packed exactly once
    per = out.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n"),
        F.max("n_tokens").alias("mx"),
    )
    # budget holds unless a single oversize doc owns the bin
    bad = per.filter((F.col("tok") > 120) & ~((F.col("n") == 1) & (F.col("mx") > 120)))
    assert bad.count() == 0
    # pack_pos is a clean 0..n-1 sequence per bin
    pos_ok = out.groupBy("pack_id").agg(
        (F.count(F.lit(1)) - 1 == F.max("pack_pos")).alias("ok"), F.min("pack_pos").alias("mn")
    )
    assert pos_ok.filter(~F.col("ok") | (F.col("mn") != 0)).count() == 0


def test_redact_pii(spark):
    from trackintel_spark.scale import redact_pii

    df = spark.createDataFrame(
        [
            (0, "contact me at jane.doe+x@example.co.uk or 555-123-4567 thanks"),
            (1, "server 192.168.1.200 rejected ssn 123-45-6789"),
            (2, "iban CH93 0076 2011 6238 5295 7 is not a phone"),
            (3, "nothing sensitive here, just the year 2024"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.text, r.n_redactions) for r in redact_pii(df).collect()}
    assert "<EMAIL>" in out[0][0] and "jane" not in out[0][0]
    assert "<PHONE>" in out[0][0] and out[0][1] == 2
    assert "<IP>" in out[1][0] and "<SSN>" in out[1][0] and out[1][1] == 2
    assert "<IBAN>" in out[2][0]
    assert out[3][0].endswith("2024") and out[3][1] == 0


def test_normalize_text(spark):
    from trackintel_spark.scale import normalize_text

    df = spark.createDataFrame([(0, "  Hello\t\tWorld\x00\x1f \n again  ")], "doc_id long, text string")
    assert normalize_text(df).first().text == "Hello World again"
    assert normalize_text(df, lowercase=True).first().text == "hello world again"


def test_kmeans_ivf(spark):
    """kmeans_centers: trained quantizer plugs into ivf_topk; full probe
    stays exactly brute force; on clustered data partial probe with
    trained centers recovers the true neighbors."""
    import numpy as np
    from pyspark.sql import functions as F

    from trackintel_spark.scale import cosine_topk_bruteforce, ivf_topk
    from trackintel_spark.scale.similarity import kmeans_centers

    # 4 tight clusters in 8-d
    rng = np.random.RandomState(3)
    protos = rng.standard_normal((4, 8))
    rows = []
    for i in range(400):
        v = protos[i % 4] + 0.05 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    centers = kmeans_centers(emb, n_centers=4, iters=4, seed=1)
    assert len(centers) == 4 and all(len(c) == 8 for c in centers)
    # spherical: unit-norm centers
    assert all(abs(float(np.linalg.norm(c)) - 1.0) < 1e-9 for c in centers)
    # each center should sit on one distinct prototype direction
    sims = [
        max(
            float(np.dot(c, p) / (np.linalg.norm(c) * np.linalg.norm(p)))
            for p in protos
        )
        for c in centers
    ]
    assert min(sims) > 0.98

    queries = emb.filter(F.col("vec_id") < 4).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.rank): r.vec_id for r in cosine_topk_bruteforce(emb, queries, k=5).collect()}
    # full probe == brute force, with the trained quantizer
    full = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(emb, queries, k=5, n_probe=4, centers=centers).collect()
    }
    assert full == exact
    # single-probe with trained centers: perfect recall on clustered data
    one = {(r.query_id, r.vec_id) for r in ivf_topk(emb, queries, k=5, n_probe=1, centers=centers).collect()}
    assert one == {(q, v) for (q, _), v in exact.items()}


def test_kmeans_udf_assignment_path_matches_codegen(spark):
    """Large k*dim switches the Lloyd iteration to the fused
    mapInPandas path (r13: assignment + per-partition sum/count
    partials in one pass, driver-merged mean); centers must agree with
    the codegen + posexplode/avg shape to float-merge-order noise."""
    import numpy as np

    from trackintel_spark.scale.similarity import kmeans_centers

    rng = np.random.RandomState(5)
    protos = rng.standard_normal((3, 6))
    rows = [
        (i, [float(x) for x in protos[i % 3] + 0.03 * rng.standard_normal(6)])
        for i in range(150)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = kmeans_centers(emb, n_centers=3, iters=3, seed=2)  # codegen path
    b = kmeans_centers(emb, n_centers=3, iters=3, seed=2, codegen_max_terms=1)  # UDF path
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_sample_by_weight(spark):
    from trackintel_spark.scale import sample_by_weight

    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    # constant weight ~ keeps that fraction, deterministically
    kept = sample_by_weight(df, "doc_id", 0.3)
    n = kept.count()
    assert abs(n / 20_000 - 0.3) < 0.02
    assert kept.count() == n  # stable across evaluations
    # different salt re-deals; same salt reproduces
    n2 = sample_by_weight(df, "doc_id", 0.3, salt="x").count()
    assert n2 != n and abs(n2 / 20_000 - 0.3) < 0.02
    # row-dependent weight: ids < 10k get w=1 (all kept), rest w=0
    w = F.when(F.col("doc_id") < 10_000, F.lit(1.0)).otherwise(F.lit(0.0))
    sel = sample_by_weight(df, "doc_id", w)
    assert sel.count() == 10_000
    assert sel.agg(F.max("doc_id")).first()[0] < 10_000


def test_sample_by_weight_replicate(spark):
    from trackintel_spark.scale import sample_by_weight

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    # weight 2.3 -> 2 or 3 copies, expectation 2.3
    up = sample_by_weight(df, "doc_id", 2.3, replicate=True)
    n = up.count()
    assert abs(n / 10_000 - 2.3) < 0.05
    copies = up.groupBy("doc_id").count()
    cnts = {r["count"] for r in copies.collect()}
    assert cnts == {2, 3}
    assert copies.count() == 10_000  # every row kept at least twice
    # fractional-only weight behaves like Bernoulli with a __copy column
    down = sample_by_weight(df, "doc_id", 0.4, replicate=True)
    assert abs(down.count() / 10_000 - 0.4) < 0.03
    assert down.select(F.max("__copy")).first()[0] == 1


def _semdedup_reference(rows, centers, threshold):
    """Driver-side reimplementation of the SemDeDup triangular rule."""
    import numpy as np

    C = np.asarray(centers, dtype=float)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    out = {}
    clusters = {}
    for vid, vec in rows:
        v = np.asarray(vec, dtype=float)
        n = np.linalg.norm(v)
        if n == 0:
            out[vid] = (None, None, True)
            continue
        sims = C @ (v / n)
        cid = int(np.argmax(sims))
        clusters.setdefault(cid, []).append((float(sims[cid]), vid, v / n))
    for cid, members in clusters.items():
        members.sort(key=lambda t: (t[0], t[1]))  # (centroid_cos asc, id asc)
        for i, (ccos, vid, u) in enumerate(members):
            dup = any(
                float(u @ members[j][2]) >= threshold for j in range(i)
            )
            out[vid] = (cid, ccos, not dup)
    return out


def test_semantic_dedup_keep_rule(spark):
    """Three near-identical vectors in one cluster: only the one
    FARTHEST from the centroid survives; distinct vectors all survive;
    zero vectors pass through kept with NULL cluster."""
    from trackintel_spark.scale import semantic_dedup

    # two orthogonal prototype directions as fixed centers
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        # cluster 0: a tight duplicate triple (mutual cos > 0.999)
        (1, [1.0, 0.01, 0.0, 0.0]),
        (2, [1.0, 0.011, 0.0, 0.0]),
        (3, [1.0, 0.02, 0.003, 0.0]),
        # cluster 0: far from the triple (cos ~ 0.71 to them)
        (4, [1.0, 1.0, 0.0, 0.0]),
        # cluster 1: two singletons, not duplicates of each other
        (5, [0.0, 1.0, 0.5, 0.0]),
        (6, [0.0, 1.0, -0.5, 0.0]),
        # unplaceable
        (7, [0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.95, centers=[e1, e2]).collect()
    }
    assert len(got) == 7
    ref = _semdedup_reference(rows, [e1, e2], 0.95)
    for vid, (cid, ccos, kept) in ref.items():
        assert got[vid]["cluster_id"] == cid, vid
        assert got[vid]["is_kept"] == kept, vid
        if ccos is not None:
            assert abs(got[vid]["centroid_cosine"] - ccos) < 1e-9
    # the triple: exactly one survivor, and it is the one with the
    # LOWEST centroid cosine (vec 3 leans farthest off e1)
    triple = [got[i]["is_kept"] for i in (1, 2, 3)]
    assert triple == [False, False, True]
    assert got[4]["is_kept"] and got[5]["is_kept"] and got[6]["is_kept"]
    assert got[7]["cluster_id"] is None and got[7]["is_kept"]


def test_semantic_dedup_matches_reference_randomized(spark):
    """Random corpus with planted duplicate groups: Spark output equals
    the driver-side triangular-rule reimplementation exactly, and is
    invariant to input partitioning."""
    import numpy as np

    from trackintel_spark.scale import semantic_dedup

    rng = np.random.RandomState(7)
    dim, n_base = 6, 40
    base = rng.standard_normal((n_base, dim))
    rows = []
    vid = 0
    for i in range(n_base):
        rows.append((vid, base[i].tolist()))
        vid += 1
        if i % 5 == 0:  # plant 2 near-duplicates of every 5th vector
            for _ in range(2):
                rows.append((vid, (base[i] + 0.001 * rng.standard_normal(dim)).tolist()))
                vid += 1
    centers = rng.standard_normal((4, dim)).tolist()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ref = _semdedup_reference(rows, centers, 0.98)

    for df in (emb, emb.repartition(13)):
        got = {
            r["vec_id"]: r for r in semantic_dedup(df, threshold=0.98, centers=centers).collect()
        }
        assert {v: got[v]["is_kept"] for v in got} == {v: k for v, (_, _, k) in ref.items()}
        assert {v: got[v]["cluster_id"] for v in got} == {v: c for v, (c, _, _) in ref.items()}
    # every planted group lost at least its two clones
    n_kept = sum(1 for r in got.values() if r["is_kept"])
    assert n_kept <= n_base

    # per-cluster cap: with every cluster under the cap the capped run
    # must agree with the exact run EXACTLY...
    capped = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.98, centers=centers, max_compare=200).collect()
    }
    assert {v: capped[v]["is_kept"] for v in capped} == {v: got[v]["is_kept"] for v in got}
    # ...and a tight cap only RELAXES the drop rule (kept superset)
    tight = {
        r["vec_id"]: r["is_kept"]
        for r in semantic_dedup(emb, threshold=0.98, centers=centers, max_compare=1).collect()
    }
    assert all(tight[v] for v in got if got[v]["is_kept"])


def test_semantic_dedup_trains_centers_inline(spark):
    """Without precomputed centers the inline k-means path runs and the
    keep-list still drops planted exact clones."""
    import numpy as np

    from trackintel_spark.scale import semantic_dedup

    rng = np.random.RandomState(11)
    protos = np.eye(5) * 10
    rows = []
    vid = 0
    for p in protos:
        for _ in range(6):
            rows.append((vid, (p + 0.01 * rng.standard_normal(5)).tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, threshold=0.999, n_centers=5, iters=3, seed=3).collect()
    assert len(out) == 30
    kept = [r for r in out if r["is_kept"]]
    # 5 blobs of 6 mutual near-clones -> one survivor each
    assert len(kept) == 5
    assert len({r["cluster_id"] for r in kept}) == 5


def test_line_dedup_first_and_none_policies(spark):
    """Corpus-wide boilerplate lines are stripped (kept once under
    'first', everywhere under 'none'); short lines and unique lines
    survive; in-document line order is preserved."""
    from trackintel_spark.scale import line_dedup

    banner = "subscribe to our newsletter today!"  # > 10 chars, in all docs
    rows = [
        (1, f"{banner}\nalpha unique content line one\nok"),
        (2, f"beta unique content line two\n{banner}\nok"),
        (3, f"{banner}\ngamma unique content line three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    first = {r["doc_id"]: r for r in line_dedup(docs, keep="first").collect()}
    assert first[1]["text"] == f"{banner}\nalpha unique content line one\nok"
    assert first[2]["text"] == "beta unique content line two\nok"
    assert first[3]["text"] == "gamma unique content line three"
    assert [first[i]["n_lines_removed"] for i in (1, 2, 3)] == [0, 1, 1]
    assert first[2]["n_lines"] == 3
    # 'ok' is under min_chars -> exempt even though it repeats

    none = {r["doc_id"]: r for r in line_dedup(docs, keep="none").collect()}
    assert none[1]["text"] == "alpha unique content line one\nok"
    assert [none[i]["n_lines_removed"] for i in (1, 2, 3)] == [1, 1, 1]


def test_line_dedup_intra_doc_repeats_dont_trigger(spark):
    """A line repeated only WITHIN one document is not corpus
    boilerplate (distinct-doc count stays 1)."""
    from trackintel_spark.scale import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "repeated inside this doc\nrepeated inside this doc"),
            (2, "something else entirely here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in line_dedup(docs).collect()}
    assert out[1] == "repeated inside this doc\nrepeated inside this doc"
    assert out[2] == "something else entirely here"


def test_line_dedup_min_count_and_partition_invariance(spark):
    from trackintel_spark.scale import line_dedup

    shared = "this exact sentence appears in several documents"
    rows = [(i, f"{shared}\nunique filler number {i} with words") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # threshold above the occurrence count -> nothing removed
    hi = line_dedup(docs, min_count=7).collect()
    assert all(r["n_lines_removed"] == 0 for r in hi)
    # at the threshold -> removed everywhere but doc 0
    lo = {r["doc_id"]: r for r in line_dedup(docs, min_count=6).collect()}
    assert lo[0]["n_lines_removed"] == 0 and all(lo[i]["n_lines_removed"] == 1 for i in range(1, 6))
    # partition invariance
    lo13 = {r["doc_id"]: r["text"] for r in line_dedup(docs.repartition(13), min_count=6).collect()}
    assert lo13 == {k: v["text"] for k, v in lo.items()}


def test_chunk_dedup_fraction(spark):
    """Planted verbatim 20-token overlap is detected; unique docs get
    0.0; short docs get NULL; values are exact and partition-invariant."""
    from trackintel_spark.scale import chunk_dedup_fraction

    shared = " ".join(f"s{i}" for i in range(20))  # exactly one window
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(20))),
        (2, shared + " " + " ".join(f"b{i}" for i in range(20))),
        (3, " ".join(f"c{i}" for i in range(40))),
        (4, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for d in (docs, docs.repartition(7)):
        got = {
            r["doc_id"]: r
            for r in chunk_dedup_fraction(d, window=20, stride=10).collect()
        }
        # docs 1/2: 40 tokens -> starts 0,10,20 -> 3 chunks; only the
        # start-0 chunk (the shared block) recurs across docs
        assert got[1]["n_chunks"] == 3 and got[2]["n_chunks"] == 3
        assert got[1]["dup_chunk_fraction"] == pytest.approx(1 / 3)
        assert got[2]["dup_chunk_fraction"] == pytest.approx(1 / 3)
        assert got[3]["dup_chunk_fraction"] == 0.0
        assert got[4]["n_chunks"] == 0 and got[4]["dup_chunk_fraction"] is None


def test_chunk_dedup_fraction_intra_doc_repeat(spark):
    """A chunk repeated only inside one doc does not count as
    corpus-duplicated (distinct-doc census)."""
    from trackintel_spark.scale import chunk_dedup_fraction

    block = " ".join(f"r{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, block + " " + block), (2, " ".join(f"z{i}" for i in range(25)))],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in chunk_dedup_fraction(docs, window=20, stride=20).collect()}
    assert got[1]["dup_chunk_fraction"] == 0.0


def test_chunk_documents_shapes_and_overlap(spark):
    from trackintel_spark.scale import chunk_documents

    text10 = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text10, "a"), (2, "only three tokens", "b"), (3, "", "c")],
        "doc_id long, text string, meta string",
    )
    out = chunk_documents(docs, max_tokens=4, overlap=2)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["text"], r["n_chunks"], r["chunk_n_tokens"], r["meta"])
         for r in out.collect())
    )
    # doc 1: starts 0,2,4,6 -> 4 chunks of 4 tokens sharing 2
    d1 = [r for r in rows if r[0] == 1]
    assert [r[1] for r in d1] == [0, 1, 2, 3]
    assert d1[0][2] == "t0 t1 t2 t3" and d1[1][2] == "t2 t3 t4 t5"
    assert d1[3][2] == "t6 t7 t8 t9"
    assert all(r[3] == 4 and r[4] == 4 and r[5] == "a" for r in d1)
    # doc 2: one short chunk
    d2 = [r for r in rows if r[0] == 2]
    assert len(d2) == 1 and d2[0][2] == "only three tokens" and d2[0][4] == 3
    # doc 3: preserved as one empty chunk
    d3 = [r for r in rows if r[0] == 3]
    assert len(d3) == 1 and d3[0][2] == "" and d3[0][4] == 0


def test_chunk_documents_no_overlap_reconstructs(spark):
    """overlap=0: concatenating chunks in chunk_id order rebuilds the
    (whitespace-normalized) document."""
    from trackintel_spark.scale import chunk_documents

    text = " ".join(f"w{i}" for i in range(23))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(docs, max_tokens=5, overlap=0).orderBy("chunk_id").collect()
    assert len(out) == 5  # ceil(23/5)
    assert " ".join(r["text"] for r in out) == text
    assert [r["chunk_n_tokens"] for r in out] == [5, 5, 5, 5, 3]


def test_chunk_documents_validation(spark):
    from trackintel_spark.scale import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_random_project_preserves_cosine_geometry(spark):
    """JL projection 64->16: pairwise cosines survive within loose
    distortion; output is unit-norm, deterministic, partition-invariant,
    and top-1 neighbors match the full-dim answer on separated blobs."""
    import numpy as np

    from trackintel_spark.scale import cosine_topk_bruteforce, random_project

    rng = np.random.RandomState(4)
    protos = rng.standard_normal((4, 64)) * 5
    rows = []
    vid = 0
    for p in protos:
        for _ in range(10):
            rows.append((vid, (p + 0.1 * rng.standard_normal(64)).tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = random_project(emb, 16, seed=7)
    got = {r["vec_id"]: np.asarray(r["embedding"]) for r in proj.collect()}
    assert all(len(v) == 16 for v in got.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-9 for v in got.values())

    # determinism + partition invariance
    got13 = {r["vec_id"]: np.asarray(r["embedding"]) for r in random_project(emb.repartition(13), 16, seed=7).collect()}
    assert all(np.allclose(got[k], got13[k]) for k in got)

    # same-blob pairs stay similar, cross-blob pairs stay dissimilar
    same = float(got[0] @ got[1])
    cross = float(got[0] @ got[11])
    assert same > 0.8 and cross < 0.6

    # top-1 neighbor agreement vs full-dim on a few queries
    q = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    full = {r["query_id"]: r["vec_id"] for r in cosine_topk_bruteforce(emb, q, k=2).filter("rank=2").collect()}
    qp = random_project(q.withColumnRenamed("query_id", "vec_id"), 16, seed=7).withColumnRenamed("vec_id", "query_id")
    low = {r["query_id"]: r["vec_id"] for r in cosine_topk_bruteforce(proj, qp, k=2).filter("rank=2").collect()}
    # same blob guaranteed; exact id may differ -> compare blob of the hit
    assert all(low[k] // 10 == full[k] // 10 for k in full)


def test_mix_corpora_schema_union_and_validation(spark):
    """Corpora with differing columns union with NULL fill; empty input
    rejected."""
    from trackintel_spark.scale import mix_corpora

    a = spark.createDataFrame([(1, "t1", "en")], "doc_id long, text string, lang string")
    b = spark.createDataFrame([(2, "t2", 0.9)], "doc_id long, text string, quality double")
    out = mix_corpora({"a": (a, 1.0), "b": (b, 1.0)}).collect()
    got = {r["mix_source"]: r for r in out}
    assert got["a"]["lang"] == "en" and got["a"]["quality"] is None
    assert got["b"]["quality"] == 0.9 and got["b"]["lang"] is None
    with pytest.raises(ValueError):
        mix_corpora({})


def test_chunk_then_pack_integration(spark):
    """The chunk -> count -> pack chain: every pack respects the token
    budget and every chunk lands in exactly one pack."""
    from pyspark.sql import functions as F

    from trackintel_spark.scale import chunk_documents, pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(37 + i))) for i in range(20)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, max_tokens=16).withColumn(
        "chunk_key", F.col("doc_id") * 1000 + F.col("chunk_id")
    )
    packed = pack_sequences(
        chunks.withColumn("n_tokens", F.col("chunk_n_tokens")),
        max_tokens=64,
        id_col="chunk_key",
    )
    rows = packed.collect()
    assert len(rows) == chunks.count()  # every chunk packed exactly once
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r["pack_id"], 0)
        per_pack[r["pack_id"]] += r["n_tokens"]
    assert all(v <= 64 for v in per_pack.values())


def test_minhash_lsh_validates_band_parameters(spark):
    """bands > num_perm silently degenerated every band hash to md5('')
    — an all-pairs quadratic join; num_perm % bands != 0 silently
    ignored trailing signature positions. Both must fail loudly."""
    import pytest as _pytest

    from trackintel_spark.scale import minhash_lsh_candidates

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bands"):
        minhash_lsh_candidates(docs, num_perm=8, bands=16)
    with _pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(docs, num_perm=10, bands=4)
    with _pytest.raises(ValueError, match="bands"):
        minhash_lsh_candidates(docs, num_perm=8, bands=0)


def test_line_dedup_regex_delimiter_is_literal(spark):
    """A delimiter like '|' must split literally, not as a Java regex
    (which would split at every position)."""
    from trackintel_spark.scale import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "keep me alone|this boilerplate line repeats"),
            (1, "another unique line|this boilerplate line repeats"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in line_dedup(docs, min_count=2, delimiter="|").collect()}
    assert out[0] == "keep me alone|this boilerplate line repeats"
    assert out[1] == "another unique line"


def test_embedding_cosine_dedup_lsh_mode(spark):
    """method='lsh' (the approximate billion-scale escape hatch) must
    keep precision 1 (every emitted pair verified >= threshold) and
    catch planted exact duplicates (identical vectors share every sign
    bucket)."""
    import numpy as np

    rng = np.random.RandomState(3)
    vs = rng.standard_normal((40, 16))
    vs[1] = vs[0]  # exact duplicate
    vs[3] = vs[2]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<double>",
    )
    got = dedup_embedding_cosine(df, threshold=0.99, method="lsh", n_planes=8).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    assert (0, 1) in pairs and (2, 3) in pairs
    for r in got:
        assert r.cosine >= 0.99


def test_embedding_cosine_dedup_null_first_vector(spark):
    """A NULL embedding in the FIRST row used to make the dimension
    probe return None (F.size(NULL) -> NULL) and numpy raise TypeError;
    NULL vectors must simply be dropped like zero-norm ones."""
    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0, 0.0]), (2, [1.0, 1e-4, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1)
    for method in ("exact", "lsh"):
        got = {
            (r.id_a, r.id_b)
            for r in dedup_embedding_cosine(df, threshold=0.99, method=method).collect()
        }
        assert (1, 2) in got
        assert not any(0 in pair for pair in got)


def test_connected_components_small_probe_short_circuits(spark):
    """The edge_count=None size gate probes via limit(n+1): the small
    path must label correctly from the probe rows alone, and a graph
    just over the budget must fall through to the distributed loop with
    identical labels."""
    from trackintel_spark.plans.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(100, 101), (101, 102)],
        "a long, b long",
    )
    expect = {r.vertex: r.component for r in connected_components(edges, small_graph_edges=0).collect()}
    got = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert got == expect
    # budget boundary: exactly at the count -> small path; one less -> distributed
    n_edges = edges.count()
    at = {r.vertex: r.component for r in connected_components(edges, small_graph_edges=n_edges).collect()}
    below = {
        r.vertex: r.component
        for r in connected_components(edges, small_graph_edges=n_edges - 1).collect()
    }
    assert at == expect and below == expect


def test_semantic_dedup_defaults_auto_centers(spark):
    """The no-parameter call (auto-derived n_centers, default
    max_compare cap) must run and keep exactness on small clusters:
    with every cluster far below the 1024 cap the result equals the
    uncapped one."""
    import numpy as np

    from trackintel_spark.scale import semantic_dedup

    rng = np.random.RandomState(11)
    vs = rng.standard_normal((80, 12))
    for i in range(0, 40, 4):
        vs[i + 1] = vs[i] + 1e-3 * rng.standard_normal(12)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<double>",
    )
    auto = {r.vec_id: r.is_kept for r in semantic_dedup(df, threshold=0.999).collect()}
    uncapped = {
        r.vec_id: r.is_kept
        for r in semantic_dedup(df, threshold=0.999, max_compare=None).collect()
    }
    assert auto == uncapped
    assert sum(not k for k in auto.values()) == 10  # one drop per planted pair


def _brute_dedup_substrings(rows, window, stride, min_count, keep):
    """Independent python model of the dedup_substrings spec."""
    import re

    toks = {d: [t for t in re.split(r"\s+", txt) if t] for d, txt in rows}
    occ = []  # (chunk, doc, start)
    for d, ts in toks.items():
        for s in range(0, len(ts) - window + 1, stride):
            occ.append(("\x1f".join(ts[s:s + window]), d, s))
    by_chunk: dict = {}
    for c, d, s in occ:
        by_chunk.setdefault(c, []).append((d, s))
    flagged: dict = {d: set() for d, _ in rows}
    for c, lst in by_chunk.items():
        if len({d for d, _ in lst}) < min_count:
            continue
        keeper = min(lst)
        for d, s in lst:
            if keep == "first" and (d, s) == keeper:
                continue
            flagged[d].add(s)
    out = {}
    for d, ts in toks.items():
        spans = []
        for s in sorted(flagged[d]):
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + window)
            else:
                spans.append([s, s + window])
        drop = set()
        for s, e in spans:
            drop.update(range(s, e))
        kept = [t for i, t in enumerate(ts) if i not in drop]
        out[d] = (" ".join(kept), len(ts), len(drop), len(spans))
    return out


def test_dedup_substrings_curated(spark):
    from trackintel_spark.scale import dedup_substrings

    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [
        (0, f"alpha beta {boiler} gamma delta"),
        (1, f"one two three {boiler} four five"),
        (2, "unique text with no duplication at all here"),
        (3, f"{boiler} standalone prefix case"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in dedup_substrings(docs, window=10, stride=1, min_count=2).collect()
    }
    # keeper doc 0 keeps its copy; docs 1/3 lose exactly the 12 fully-
    # duplicated tokens (edge windows mix doc-specific context -> kept)
    assert got[0].n_tokens_removed == 0 and "b0" in got[0].text
    assert got[1].n_tokens_removed == 12 and got[1].text == "one two three four five"
    assert got[3].n_tokens_removed == 12 and got[3].text == "standalone prefix case"
    assert got[2].n_tokens_removed == 0
    assert got[1].n_spans_removed == 1

    # keep='none' strips the keeper too
    none = {
        r.doc_id: r
        for r in dedup_substrings(docs, window=10, stride=1, min_count=2, keep="none").collect()
    }
    assert none[0].n_tokens_removed == 12 and "b0" not in none[0].text

    # short docs pass through untouched
    short = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    r9 = dedup_substrings(short, window=10, stride=1).collect()[0]
    assert r9.text == "tiny doc" and r9.n_spans_removed == 0


def test_dedup_substrings_matches_brute_force_randomized(spark):
    """Randomized parity with an independent python model: overlapping
    spans, intra-doc repeats, keeper exemptions, stride > 1."""
    import random

    from trackintel_spark.scale import dedup_substrings

    rng = random.Random(77)
    phrases = [
        " ".join(f"p{k}_{i}" for i in range(rng.randint(6, 14))) for k in range(6)
    ]
    rows = []
    for d in range(24):
        parts = []
        for _ in range(rng.randint(2, 5)):
            if rng.random() < 0.6:
                parts.append(rng.choice(phrases))
            else:
                parts.append(" ".join(f"u{d}_{i}" for i in range(rng.randint(3, 9))))
        rows.append((d, " ".join(parts)))

    for window, stride, keep in ((6, 1, "first"), (6, 2, "none"), (8, 3, "first")):
        expect = _brute_dedup_substrings(rows, window, stride, 2, keep)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_tokens, r.n_tokens_removed, r.n_spans_removed)
            for r in dedup_substrings(
                docs, window=window, stride=stride, min_count=2, keep=keep
            ).collect()
        }
        assert got == expect, (window, stride, keep)


def test_dedup_substrings_validation(spark):
    import pytest as _pt

    from trackintel_spark.scale import dedup_substrings

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with _pt.raises(ValueError, match="keep"):
        dedup_substrings(docs, keep="bogus")
    with _pt.raises(ValueError, match="window"):
        dedup_substrings(docs, window=0)


def test_dedup_ops_are_idempotently_chainable(spark):
    """Running dedup_substrings / line_dedup on a frame that already
    carries a previous run's stat columns supersedes them instead of
    producing AMBIGUOUS_REFERENCE duplicates."""
    from trackintel_spark.scale import dedup_substrings, line_dedup

    boiler = " ".join(f"b{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(0, f"alpha beta {boiler} gamma delta"), (1, f"one two {boiler} three four")],
        "doc_id long, text string",
    )
    once = dedup_substrings(docs, window=10, stride=1, min_count=2)
    twice = dedup_substrings(once, window=10, stride=1, min_count=2)
    assert twice.columns.count("n_tokens") == 1
    # second pass removes nothing (the dup span is already gone)
    assert all(r.n_tokens_removed == 0 for r in twice.select("n_tokens_removed").collect())

    ldocs = spark.createDataFrame(
        [(0, "keep me\nSHARED LINE HERE\nmore"), (1, "other\nSHARED LINE HERE\ntail")],
        "doc_id long, text string",
    )
    l1 = line_dedup(ldocs, min_count=2, min_chars=5)
    l2 = line_dedup(l1, min_count=2, min_chars=5)
    assert l2.columns.count("n_lines_removed") == 1
    assert all(r.n_lines_removed == 0 for r in l2.select("n_lines_removed").collect())


def test_semantic_dedup_grouped_pair_mode_matches_join(spark):
    """pair_mode='grouped' (one chunked BLAS matmul per cluster) must
    reproduce the join path's decisions exactly across cap settings —
    unbounded, cap smaller than clusters (capped relaxation engaged),
    and cap larger than clusters — including the zero-vector NULL
    branch. Random inputs keep cosines away from the float-rounding
    boundary where the two summation orders could legitimately differ."""
    import numpy as np

    from trackintel_spark.scale import semantic_dedup

    rng = np.random.RandomState(3)
    centers = (rng.standard_normal((12, 16)) * 3).tolist()
    rows = []
    for i in range(1500):
        c = np.array(centers[i % 12])
        noise = 0.01 if i % 3 == 0 else 1.0
        rows.append((i, (c + rng.standard_normal(16) * noise).tolist()))
    rows.append((99999, [0.0] * 16))  # zero vector: NULL cluster, kept
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for mc in (None, 5, 400):
        key = lambda r: (
            r.cluster_id, r.is_kept,
            None if r.centroid_cosine is None else round(r.centroid_cosine, 9),
        )
        a = {r.vec_id: key(r) for r in semantic_dedup(
            emb, threshold=0.9, centers=centers, max_compare=mc,
            pair_mode="join").collect()}
        b = {r.vec_id: key(r) for r in semantic_dedup(
            emb, threshold=0.9, centers=centers, max_compare=mc,
            pair_mode="grouped").collect()}
        assert a == b, f"max_compare={mc}"
        assert a[99999][0] is None and a[99999][1] is True
    # some rows actually dropped (non-vacuous)
    assert sum(1 for v in a.values() if not v[1]) > 50


def test_audio_features_malformed_wav_emits_nulls(spark):
    """Round-9 regression (ADVICE r8): a structurally-valid RIFF with
    sample_rate=0 (or n_channels=0) raised ZeroDivisionError inside the
    kernel and killed the whole task instead of emitting the documented
    NULL-field row."""
    import struct

    from trackintel_spark.scale.multimodal import audio_features, decode_wav_pcm

    def wav(n_channels, sample_rate):
        fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                          sample_rate * n_channels * 2, n_channels * 2, 16)
        data = b"\x00\x01" * 8
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for bad in (wav(1, 0), wav(0, 16000)):
        with pytest.raises(ValueError):
            decode_wav_pcm(bad)

    rows = [(0, bytearray(wav(1, 0))), (1, bytearray(wav(0, 16000))),
            (2, bytearray(wav(1, 8000)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    au = {r.doc_id: r for r in audio_features(df).collect()}
    assert au[0].sample_rate is None and au[1].sample_rate is None
    assert au[2].sample_rate == 8000 and au[2].n_samples == 8


def test_semantic_dedup_auto_routes_and_matches_join(spark):
    """pair_mode='auto' (the round-9 default): clusters at or under the
    balloon cut go through the grouped BLAS path, ballooned clusters
    through the splittable join — and the combined decisions must match
    a pure 'join' run exactly on random (tie-free) inputs, including
    the zero-vector NULL branch. The mixture here forces BOTH branches:
    one 60-member cluster balloons past max_compare+1=9 while the
    other clusters stay under it."""
    import numpy as np

    from trackintel_spark.scale import semantic_dedup

    rng = np.random.RandomState(9)
    centers = (rng.standard_normal((6, 12)) * 4).tolist()
    rows = []
    i = 0
    for c_idx, size in enumerate([60, 8, 8, 7, 6, 5]):
        c = np.array(centers[c_idx])
        for _ in range(size):
            noise = 0.01 if i % 3 == 0 else 0.8
            rows.append((i, (c + rng.standard_normal(12) * noise).tolist()))
            i += 1
    rows.append((99999, [0.0] * 12))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    key = lambda r: (
        r.cluster_id, r.is_kept,
        None if r.centroid_cosine is None else round(r.centroid_cosine, 9),
    )
    # auto_group_max_bytes=4096 -> balloon cut = max(9, 4096/(8*12)) = 42
    # members: the 60-member cluster takes the join branch, the rest the
    # grouped branch (<= max_compare+1, judged exactly by both paths)
    auto = {r.vec_id: key(r) for r in semantic_dedup(
        emb, threshold=0.9, centers=centers, max_compare=8,
        auto_group_max_bytes=4096).collect()}
    join = {r.vec_id: key(r) for r in semantic_dedup(
        emb, threshold=0.9, centers=centers, max_compare=8,
        pair_mode="join").collect()}
    assert auto == join
    assert auto[99999][0] is None and auto[99999][1] is True
    assert sum(1 for v in auto.values() if not v[1]) > 3  # non-vacuous

    # default task bound: every cluster here fits one grouped task, so
    # the default-auto decisions must also match (tie-free inputs)
    auto_default = {r.vec_id: key(r) for r in semantic_dedup(
        emb, threshold=0.9, centers=centers, max_compare=8).collect()}
    assert auto_default == join

    with pytest.raises(ValueError):
        semantic_dedup(emb, threshold=0.9, centers=centers, pair_mode="nope")


def _png_chunks(ihdr_fields, idat_raw, plte=None):
    """Hand-assemble a PNG from raw (pre-compression) scanline bytes."""
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", __import__("zlib").compress(idat_raw)) + chunk(b"IEND", b"")


def test_decode_png_all_filters_and_color_types():
    """Round-9 (VERDICT r8 item 7): codec-free PNG decode. Each scanline
    filter (None/Sub/Up/Average/Paeth) is applied FORWARD by hand here
    and the decoder must invert it exactly; plus gray, palette, RGBA,
    and round-trips through the filter-0 encoder."""
    import numpy as np

    from trackintel_spark.scale.multimodal import decode_png, encode_png

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    h, w, c = img.shape
    body = img.reshape(h, w * c).astype(np.int32)

    def fwd(f):
        """Filter the raster forward with per-line filter f."""
        raw = b""
        prev = np.zeros(w * c, dtype=np.int32)
        for y in range(h):
            cur = body[y]
            if f == 0:
                line = cur
            elif f == 1:
                line = (cur - np.concatenate([np.zeros(c, np.int32), cur[:-c]])) & 0xFF
            elif f == 2:
                line = (cur - prev) & 0xFF
            else:
                line = np.empty(w * c, dtype=np.int32)
                for x in range(w * c):
                    a = int(cur[x - c]) if x >= c else 0
                    b = int(prev[x])
                    if f == 3:
                        line[x] = (cur[x] - ((a + b) >> 1)) & 0xFF
                    else:
                        cc = int(prev[x - c]) if x >= c else 0
                        p = a + b - cc
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                        line[x] = (cur[x] - pred) & 0xFF
            raw += bytes([f]) + line.astype(np.uint8).tobytes()
            prev = cur
        return raw

    for f in range(5):
        payload = _png_chunks((w, h, 8, 2, 0, 0, 0), fwd(f))
        assert (decode_png(payload) == img).all(), f"filter {f}"

    # grayscale (1ch), RGBA (4ch), gray+alpha (2ch) round-trips
    for c2 in (1, 2, 4):
        im = rng.randint(0, 256, size=(3, 7, c2), dtype=np.uint8)
        got = decode_png(encode_png(im))
        assert got.shape == (3, 7, c2) and (got == im).all(), c2

    # palette: 2x2 with 3 palette entries
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    got = decode_png(_png_chunks((2, 2, 8, 3, 0, 0, 0), raw, plte=pal))
    assert got.shape == (2, 2, 3)
    assert (got[0, 0] == [255, 0, 0]).all() and (got[1, 0] == [0, 0, 255]).all()

    # rejections
    import pytest as _pytest
    for bad in (
        b"not a png",
        _png_chunks((2, 2, 16, 2, 0, 0, 0), b""),      # 16-bit
        _png_chunks((2, 2, 8, 2, 0, 0, 1), b""),       # interlaced
        _png_chunks((2, 2, 8, 2, 0, 0, 0), b"\x00\x00"),  # truncated
    ):
        with _pytest.raises(ValueError):
            decode_png(bad)


def test_image_features_and_resize_route_png(spark):
    """image_features/resize_images accept PNG alongside PPM: real pixel
    means (gray replicated to RGB, alpha dropped) and a same-format
    nearest-neighbor re-encode."""
    import numpy as np

    from trackintel_spark.scale.multimodal import (
        decode_png,
        encode_png,
        image_features,
        resize_images,
    )

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    gray = np.full((2, 3, 1), 9, dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png(rgb))),
        (1, bytearray(encode_png(gray))),
        (2, bytearray(b"\xff\xd8\xff jpeg-ish junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    feats = {r.doc_id: r for r in image_features(df).collect()}
    assert (feats[0].width, feats[0].height) == (4, 4)
    assert feats[0].mean_r == pytest.approx(float(rgb[..., 0].mean()))
    assert feats[1].mean_r == pytest.approx(9.0) and feats[1].mean_b == pytest.approx(9.0)
    assert feats[2].width is None  # JPEG: still NULLs (codec-gated)

    resized = {r.doc_id: bytes(r.payload) for r in resize_images(df, 2, 2).collect()}
    out = decode_png(resized[0])
    assert (out == rgb[[0, 2]][:, [0, 2]]).all()
    assert decode_png(resized[1]).shape == (2, 2, 1)  # format+channels kept
    assert resized[2] == bytes(rows[2][1])  # junk passes through


# -- baseline JPEG: the last common web image format, real-decoded -------------


def _jpeg_test_image(h=24, w=40, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / (w - 1), yy * 255 / (h - 1), (xx + yy) * 255 / (w + h - 2)], axis=2
    )
    return np.clip(img + rng.standard_normal(img.shape) * 2, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_within_quantization_error():
    """Every decoder path: 4:4:4, 4:2:0 chroma upsampling, restart
    markers, grayscale — reconstruction error bounded by the Annex K
    quantization tables on a smooth gradient."""
    import numpy as np

    from trackintel_spark.scale._jpeg import decode_jpeg, encode_jpeg

    img = _jpeg_test_image()
    for kwargs, tol_mean, tol_max in [
        ({}, 4.0, 20),
        ({"subsample": True}, 6.0, 30),
        ({"restart_interval": 2}, 4.0, 20),
        ({"subsample": True, "restart_interval": 3}, 6.0, 30),
    ]:
        dec = decode_jpeg(encode_jpeg(img, **kwargs))
        assert dec.shape == img.shape, kwargs
        err = np.abs(dec.astype(float) - img.astype(float))
        assert err.mean() < tol_mean and err.max() < tol_max, (kwargs, err.mean(), err.max())

    gray = _jpeg_test_image()[:, :, 0]
    dec = decode_jpeg(encode_jpeg(gray))
    assert dec.shape == (24, 40, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()  # gray replicates
    err = np.abs(dec[:, :, 0].astype(float) - gray.astype(float))
    assert err.mean() < 4.0

    # uniform color survives almost exactly (pure-DC blocks)
    u = np.full((17, 19, 3), [200, 30, 90], dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(u, subsample=True))
    assert np.abs(dec.astype(float) - u.astype(float)).max() <= 3


def test_jpeg_rejects_non_baseline():
    import pytest as _pytest

    from trackintel_spark.scale._jpeg import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    data = bytearray(encode_jpeg(_jpeg_test_image(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2: a baseline-style full-band
    # scan is not a legal progressive scan (r12: SOF2 itself now decodes)
    with _pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC3  # lossless sequential: still unsupported
    with _pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC9  # arithmetic coding: still unsupported
    with _pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(data))
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(encode_jpeg(_jpeg_test_image(8, 8))[: 40]))  # truncated pre-SOS


def test_progressive_jpeg_matches_baseline_pixels():
    """SOF2 (r12): a progressive encoding carries the SAME quantized
    coefficients as the baseline encoding (shared _prep_quantized), so
    decode_jpeg must produce pixel-IDENTICAL output for both — the scan
    structures share no code, only the coefficients. Covers 4:4:4,
    4:2:0, grayscale, restart intervals, non-divisible dims, and the
    content classes that force each entropy path (flat -> batched EOB
    runs, gradient -> long runs + refinement, dots -> ZRL)."""
    import numpy as np

    from trackintel_spark.scale._jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:95, 0:133]
    grad = np.stack(
        [(xx // 4) % 256, (yy // 4) % 256, ((xx + yy) // 8) % 256], -1
    ).astype(np.uint8)
    dots = np.zeros((64, 64, 3), np.uint8)
    dots[::9, ::11] = 255
    cases = [
        (rng.integers(0, 256, (37, 53, 3), dtype=np.uint8), False, 0),
        (rng.integers(0, 256, (40, 56, 3), dtype=np.uint8), True, 5),
        (rng.integers(0, 256, (29, 31), dtype=np.uint8), False, 0),
        (rng.integers(0, 256, (129, 77, 3), dtype=np.uint8), True, 0),
        (rng.integers(0, 256, (1, 1, 3), dtype=np.uint8), False, 0),
        (np.full((48, 80, 3), 130, np.uint8), True, 4),
        (grad, True, 7),
        (dots, False, 0),
        (dots, True, 0),
        ((yy % 256).astype(np.uint8), False, 2),
    ]
    for i, (img, sub, ri) in enumerate(cases):
        base = decode_jpeg(encode_jpeg(img, subsample=sub, restart_interval=ri))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, subsample=sub, restart_interval=ri)
        )
        assert (base == prog).all(), (i, img.shape, sub, ri)


def test_progressive_jpeg_through_spark_image_kernels(spark):
    """A progressive payload real-decodes inside image_features and
    re-encodes (as baseline) through resize_images."""
    import numpy as np

    from trackintel_spark.scale._jpeg import decode_jpeg, encode_jpeg_progressive
    from trackintel_spark.scale.multimodal import image_features, resize_images

    flat = np.full((24, 40, 3), [10, 200, 60], dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg_progressive(flat, subsample=True)))],
        "doc_id long, payload binary",
    )
    f = image_features(df).collect()[0]
    assert (f.width, f.height) == (40, 24)
    assert abs(f.mean_g - 200) < 4 and abs(f.mean_r - 10) < 4
    out = decode_jpeg(bytes(resize_images(df, 8, 8).collect()[0].payload))
    assert out.shape == (8, 8, 3)


def test_jpeg_through_spark_image_kernels(spark):
    """image_features and resize_images run REAL decode on JPEG
    payloads via mapInPandas; media metadata sniffs the magic."""
    import numpy as np

    from trackintel_spark.scale._jpeg import decode_jpeg, encode_jpeg
    from trackintel_spark.scale.multimodal import (
        attach_media_metadata,
        image_features,
        resize_images,
    )

    img = _jpeg_test_image(16, 16)
    flat = np.full((16, 16, 3), [10, 200, 60], dtype=np.uint8)
    rows = [(1, bytearray(encode_jpeg(img))), (2, bytearray(encode_jpeg(flat, subsample=True)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    meta = {r.doc_id: r.media_meta for r in attach_media_metadata(df).collect()}
    assert meta[1]["format"] == "jpeg" and meta[1]["media_type"] == "image"

    feats = {r.doc_id: r for r in image_features(df).collect()}
    assert feats[1].width == 16 and feats[1].height == 16
    assert abs(feats[2].mean_g - 200) < 4 and abs(feats[2].mean_r - 10) < 4

    resized = {r.doc_id: bytes(r.payload) for r in resize_images(df, 8, 8).collect()}
    out = decode_jpeg(resized[2])
    assert out.shape == (8, 8, 3)
    assert abs(float(out[:, :, 1].mean()) - 200) < 6


# -- MP4 container probe (duration/resolution/codec without a frame decode) ---


def _box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + typ + body


def _mp4_fixture(duration_s=12.5, timescale=1000, w=640, h=360, v1=False):
    import struct

    if v1:
        mvhd = b"\x01" + b"\x00" * 3 + b"\x00" * 16 + struct.pack(">I", timescale) \
            + struct.pack(">Q", int(duration_s * timescale)) + b"\x00" * 80
    else:
        mvhd = b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", timescale) \
            + struct.pack(">I", int(duration_s * timescale)) + b"\x00" * 80
    tkhd_video = b"\x00" * 4 + b"\x00" * 20 + b"\x00" * 52 \
        + struct.pack(">II", w << 16, h << 16)
    tkhd_audio = b"\x00" * 4 + b"\x00" * 20 + b"\x00" * 52 + struct.pack(">II", 0, 0)
    stsd_v = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + _box(b"avc1", b"\x00" * 70))
    stsd_a = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + _box(b"mp4a", b"\x00" * 20))
    trak_v = _box(b"trak", _box(b"tkhd", tkhd_video)
                  + _box(b"mdia", _box(b"minf", _box(b"stbl", stsd_v))))
    trak_a = _box(b"trak", _box(b"tkhd", tkhd_audio)
                  + _box(b"mdia", _box(b"minf", _box(b"stbl", stsd_a))))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak_v + trak_a)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + _box(b"mdat", b"\x00" * 32)


def test_probe_mp4_box_tree():
    from trackintel_spark.scale.multimodal import probe_mp4

    for v1 in (False, True):
        m = probe_mp4(_mp4_fixture(v1=v1))
        assert m["duration_s"] == 12.5, m
        assert (m["width"], m["height"]) == (640, 360)
        assert m["n_tracks"] == 2
        assert m["codecs"] == ["avc1", "mp4a"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        probe_mp4(b"\x89PNG not an mp4")
    # malformed box size must raise, not loop or overread
    bad = bytearray(_mp4_fixture())
    bad[0:4] = (10**9).to_bytes(4, "big")
    with _pytest.raises(ValueError):
        probe_mp4(bytes(bad))


def test_video_metadata_kernel(spark):
    from trackintel_spark.scale.multimodal import video_metadata

    rows = [
        (1, bytearray(_mp4_fixture())),
        (2, bytearray(b"not a container")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in video_metadata(df).collect()}
    assert got[1].duration_s == 12.5 and got[1].width == 640
    assert got[1].codecs == "avc1,mp4a" and got[1].n_tracks == 2
    assert got[2].duration_s is None and got[2].codecs is None
    plan = video_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _mp3_fixture(n_frames=38, br_idx=9, sr_idx=0, id3=False, vbr=False):
    """CBR (or alternating-bitrate) MPEG-1 Layer III frame train."""
    out = bytearray()
    if id3:
        tag = b"junkjunkjunk"  # 12 bytes -> syncsafe 12
        out += b"ID3\x03\x00\x00" + bytes([0, 0, 0, len(tag)]) + tag
    rates = [44100, 48000, 32000]
    brs = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    for i in range(n_frames):
        bi = br_idx if not vbr or i % 2 == 0 else br_idx + 2
        hdr = bytes([0xFF, 0xFB, (bi << 4) | (sr_idx << 2), 0x00])
        frame_len = 144 * brs[bi] * 1000 // rates[sr_idx]
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


def test_probe_mp3_frame_walk():
    import pytest as _pytest

    from trackintel_spark.scale.multimodal import probe_mp3

    m = probe_mp3(_mp3_fixture())
    assert m["n_frames"] == 38 and m["sample_rate"] == 44100
    assert abs(m["duration_s"] - 38 * 1152 / 44100) < 1e-6
    assert m["bitrate_kbps"] == 128.0 and not m["vbr"]

    m = probe_mp3(_mp3_fixture(id3=True, vbr=True))
    assert m["n_frames"] == 38 and m["vbr"]

    with _pytest.raises(ValueError):
        probe_mp3(b"RIFFxxxxWAVE")
    with _pytest.raises(ValueError):
        probe_mp3(None)


def test_mp3_metadata_kernel(spark):
    from trackintel_spark.scale.multimodal import mp3_metadata

    df = spark.createDataFrame(
        [(1, bytearray(_mp3_fixture())), (2, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in mp3_metadata(df).collect()}
    assert got[1].n_frames == 38 and got[1].sample_rate == 44100
    assert got[2].duration_s is None


# -- GIF: third web image format, real LZW decode -------------------------------


def test_gif_roundtrip_uncompressed_lzw():
    import numpy as np

    from trackintel_spark.scale.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(3)
    # 6 distinct colors over a 23x17 canvas (odd sizes cross sub-block edges)
    pal = rng.randint(0, 256, (6, 3)).astype(np.uint8)
    idx = rng.randint(0, 6, (17, 23))
    img = pal[idx]
    out = decode_gif(encode_gif(img))
    assert out.shape == (17, 23, 3)
    assert (out == img).all()  # palette round-trip is EXACT

    # grayscale input replicates; > 256 colors refused
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)
    assert (decode_gif(encode_gif(g))[:, :, 0] == g).all()
    import pytest as _pytest

    i = np.arange(17 * 16)
    many = np.stack([i % 256, i // 256, np.zeros_like(i)], axis=1).astype(np.uint8).reshape(17, 16, 3)
    with _pytest.raises(ValueError):
        encode_gif(many)  # 272 unique colors
    with _pytest.raises(ValueError):
        decode_gif(b"\x89PNG nope")


def test_gif_kwkwk_and_width_growth():
    """Hand-packed LZW stream exercising the KwKwK special case (code ==
    table length) and the code-width bump the uncompressed encoder
    never emits. Pixels: [1,1,1,1,1] -> codes clear,1,6,6,eoi with the
    final eoi read at width 4."""
    import numpy as np

    from trackintel_spark.scale.multimodal import _lzw_decode

    def pack(codes_widths):
        acc = bits = 0
        out = bytearray()
        for code, width in codes_widths:
            acc |= code << bits
            bits += width
            while bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
        if bits:
            out.append(acc & 0xFF)
        return bytes(out)

    # min_code=2: clear=4, eoi=5. table len after clear = 6.
    # read 1 (w3, len 6), read 6 (w3, KwKwK -> len 7), read 6 (w3 -> len 8
    # -> width bumps to 4), read eoi at w4.
    stream = pack([(4, 3), (1, 3), (6, 3), (6, 3), (5, 4)])
    assert bytes(_lzw_decode(stream, 2, 10)) == bytes([1, 1, 1, 1, 1])


def test_gif_interlaced_frame():
    import numpy as np

    from trackintel_spark.scale.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (13, 9))
    img = pal[idx]
    data = bytearray(encode_gif(img))
    # set the interlace bit on the image descriptor and permute rows the
    # way an interlaced encoder would store them
    h = 13
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    permuted = img[order]
    data2 = bytearray(encode_gif(permuted))
    i = data2.find(b"\x2c")
    data2[i + 9] |= 0x40  # interlace flag
    out = decode_gif(bytes(data2))
    assert (out == img).all()


def test_gif_through_image_kernels(spark):
    import numpy as np

    from trackintel_spark.scale.multimodal import (
        attach_media_metadata,
        decode_gif,
        encode_gif,
        image_features,
        resize_images,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :, 1] = 200
    df = spark.createDataFrame([(1, bytearray(encode_gif(img)))], "doc_id long, payload binary")
    meta = attach_media_metadata(df).collect()[0].media_meta
    assert meta["format"] == "gif" and meta["media_type"] == "image"
    f = image_features(df).collect()[0]
    assert f.width == 8 and f.mean_g == 200.0 and f.mean_r == 0.0
    resized = resize_images(df, 4, 4).collect()[0]
    assert decode_gif(bytes(resized.payload)).shape == (4, 4, 3)


def test_probe_gif_block_walk():
    import numpy as np
    import pytest as _pytest

    from trackintel_spark.scale.multimodal import encode_gif, probe_gif

    img = np.zeros((6, 9, 3), dtype=np.uint8)
    m = probe_gif(encode_gif(img))
    assert (m["width"], m["height"], m["n_frames"]) == (9, 6, 1)
    assert not m["animated"]

    # splice a second image block in -> animated
    data = bytearray(encode_gif(img))
    one_frame = bytes(data[data.find(b"\x2c") : -1])  # descriptor..before trailer
    data = data[:-1] + one_frame + b"\x3b"
    m = probe_gif(bytes(data))
    assert m["n_frames"] == 2 and m["animated"]

    with _pytest.raises(ValueError):
        probe_gif(b"nope")


def test_bmp_roundtrip_and_variants():
    import numpy as np
    import pytest as _pytest

    from trackintel_spark.scale.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)  # odd width -> row padding
    assert (decode_bmp(encode_bmp(img)) == img).all()
    g = rng.randint(0, 256, (5, 6)).astype(np.uint8)
    assert (decode_bmp(encode_bmp(g))[:, :, 0] == g).all()

    # top-down negative-height variant
    data = bytearray(encode_bmp(img))
    flipped = bytearray(encode_bmp(img[::-1]))
    flipped[22:26] = (-9).to_bytes(4, "little", signed=True)
    assert (decode_bmp(bytes(flipped)) == img).all()

    with _pytest.raises(ValueError):
        decode_bmp(b"PNG nope")
    data[30] = 1  # BI_RLE8
    with _pytest.raises(ValueError):
        decode_bmp(bytes(data))


def test_probe_webp_variants():
    import pytest as _pytest

    from trackintel_spark.scale.multimodal import probe_webp

    def riff(fourcc, chunk):
        body = fourcc + len(chunk).to_bytes(4, "little") + chunk
        return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WEBP" + body

    # lossy keyframe: frame tag (3) + 9D012A + 14-bit dims
    vp8 = b"\x00" * 3 + b"\x9d\x01\x2a" + (320).to_bytes(2, "little") + (240).to_bytes(2, "little") + b"\x00" * 8
    m = probe_webp(riff(b"VP8 ", vp8))
    assert (m["width"], m["height"], m["variant"]) == (320, 240, "lossy")

    bits = (127 - 1) | ((63 - 1) << 14) | (1 << 28)
    vp8l = b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 8
    m = probe_webp(riff(b"VP8L", vp8l))
    assert (m["width"], m["height"], m["has_alpha"], m["variant"]) == (127, 63, True, "lossless")

    vp8x = bytes([0x10]) + b"\x00" * 3 + (799).to_bytes(3, "little") + (599).to_bytes(3, "little") + b"\x00" * 4
    m = probe_webp(riff(b"VP8X", vp8x))
    assert (m["width"], m["height"], m["has_alpha"]) == (800, 600, True)

    with _pytest.raises(ValueError):
        probe_webp(b"RIFFxxxxWAVEdata")


def test_bmp_through_image_kernels(spark):
    import numpy as np

    from trackintel_spark.scale.multimodal import decode_bmp, encode_bmp, image_features, resize_images

    img = np.full((8, 8, 3), [5, 100, 250], dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(img)))], "doc_id long, payload binary")
    f = image_features(df).collect()[0]
    assert (f.mean_r, f.mean_g, f.mean_b) == (5.0, 100.0, 250.0)
    out = resize_images(df, 2, 2).collect()[0]
    assert decode_bmp(bytes(out.payload)).shape == (2, 2, 3)


def test_gif_animation_frames_compositing():
    """r12: decode_gif_frames composites GCE-controlled animations —
    transparency keeps the canvas, disposal 2 clears the rect to
    transparent, disposal 3 restores the previous canvas — with the
    encode_gif_anim fixture sibling providing exact (palette-indexed,
    losslessly-packed) frames. decode_gif stays the cheap
    first-frame-RGB path and must agree on frame 0."""
    import numpy as np

    from trackintel_spark.scale.multimodal import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
        encode_gif_anim,
        probe_gif,
    )

    rng = np.random.default_rng(1)
    img = (rng.integers(0, 8, (10, 14, 3)) * 32).astype(np.uint8)
    fr = decode_gif_frames(encode_gif(img))
    assert len(fr) == 1 and fr[0][1] is None
    assert (fr[0][0][:, :, :3] == img).all() and (fr[0][0][:, :, 3] == 255).all()

    base = np.full((12, 16, 3), [200, 10, 10], np.uint8)
    patch = np.full((6, 6, 3), [10, 200, 10], np.uint8)
    dot = np.full((3, 3, 3), [10, 10, 200], np.uint8)
    tcol = (1, 2, 3)
    patch[0, 0] = tcol
    data = encode_gif_anim(
        [base, patch, dot], durations=[40, 50, 60],
        offsets=[(0, 0), (4, 4), (0, 0)], disposal=[0, 2, 0],
        canvas_size=(16, 12), transparent=tcol, loop=3,
    )
    frames = decode_gif_frames(data)
    assert [d for _, d in frames] == [40, 50, 60]
    f0, f1, f2 = [f for f, _ in frames]
    assert (f0[:, :, :3] == base).all()
    assert (f1[4:10, 4:10, :3][1:, 1:] == patch[1:, 1:]).all()
    assert tuple(f1[4, 4, :3]) == (200, 10, 10)  # transparent px kept canvas
    assert (f2[4:10, 4:10, 3] == 0).all()  # disposal-2 transparent hole
    assert (f2[0:3, 0:3, :3] == dot).all()
    p = probe_gif(data)
    assert p["n_frames"] == 3 and p["animated"] and p["duration_ms"] == 150
    assert (decode_gif(data) == f0[:, :, :3]).all()
    assert len(decode_gif_frames(data, max_frames=2)) == 2

    a = np.full((8, 8, 3), 9, np.uint8)
    b = np.full((4, 4, 3), 99, np.uint8)
    c = np.full((2, 2, 3), 199, np.uint8)
    f2b = decode_gif_frames(
        encode_gif_anim([a, b, c], offsets=[(0, 0), (2, 2), (0, 0)],
                        disposal=[0, 3, 0])
    )[2][0]
    assert (f2b[2:6, 2:6, :3] == 9).all()  # disposal-3 restored previous
    assert (f2b[0:2, 0:2, :3] == 199).all()


def test_gif_animation_hygiene():
    """decode_gif_frames honors the ValueError-only contract under the
    bit-flip + truncation battery, and rejects frames outside the
    logical screen."""
    import random
    import zlib

    import numpy as np
    import pytest as _pytest

    from trackintel_spark.scale.multimodal import decode_gif_frames, encode_gif_anim

    a = np.full((8, 8, 3), 5, np.uint8)
    good = encode_gif_anim([a, a], offsets=[(0, 0), (2, 2)], canvas_size=(10, 10))
    with _pytest.raises(ValueError, match="outside"):
        bad = bytearray(good)
        i = bad.find(bytes([0x2C]))
        bad[i + 1 : i + 3] = (9).to_bytes(2, "little")  # ix=9 + iw=8 > 10
        decode_gif_frames(bytes(bad))
    rng = random.Random(zlib.crc32(b"gifanim"))
    for _ in range(200):
        bad = bytearray(good)
        for _ in range(rng.randint(1, 8)):
            bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
        try:
            decode_gif_frames(bytes(bad))
        except ValueError:
            pass
    for cut in range(0, len(good), 5):
        try:
            decode_gif_frames(bytes(good[:cut]))
        except ValueError:
            pass
