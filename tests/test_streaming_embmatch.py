"""Online embedding matching (streaming/embmatch.py): stateless
stream-static LSH match, batch == stream == brute force."""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from trackintel_spark.streaming import embedding_match_stream, index_embedding_corpus

DIM = 16


def _vecs(rng, n):
    v = rng.standard_normal((n, DIM))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _corpus_df(spark, mat, start=0):
    rows = [(start + i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _brute_matches(queries, corpus, tau):
    sims = queries @ corpus.T
    return {
        (qi, ci)
        for qi in range(len(queries))
        for ci in range(len(corpus))
        if sims[qi, ci] >= tau
    }


def test_batch_mode_matches_brute_force_within_lsh_recall(spark):
    rng = np.random.RandomState(3)
    base = _vecs(rng, 40)
    # queries = corpus vectors + small noise -> near-dup pairs exist
    qm = base[:10] + rng.standard_normal((10, DIM)) * 0.05
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    corpus = _corpus_df(spark, base)
    queries = _corpus_df(spark, qm).withColumnRenamed("vec_id", "query_id")

    index = index_embedding_corpus(corpus, n_planes=6).persist()
    got = {
        (r.query_id, r.vec_id)
        for r in embedding_match_stream(queries, index, min_cosine=0.9, n_planes=6).collect()
    }
    want = _brute_matches(qm, base, 0.9)
    # every reported pair is a TRUE match (exact cosine verifies)...
    assert got <= want
    # ...and the planted self-pairs survive LSH with multiprobe
    assert len(got & {(i, i) for i in range(10)}) >= 8
    # exactness of the reported cosine
    for r in embedding_match_stream(queries, index, min_cosine=0.9, n_planes=6).collect():
        assert r.cosine == pytest.approx(float(qm[r.query_id] @ base[r.vec_id]), abs=1e-9)
    index.unpersist()


def test_stream_matches_batch(spark, tmp_path):
    rng = np.random.RandomState(7)
    base = _vecs(rng, 30)
    qm = np.vstack([base[:5], _vecs(rng, 5)])  # 5 exact dups + 5 fresh
    corpus = _corpus_df(spark, base)
    index = index_embedding_corpus(corpus, n_planes=6).persist()
    index.count()

    queries = _corpus_df(spark, qm).withColumnRenamed("vec_id", "query_id")
    batch = {
        (r.query_id, r.vec_id, round(r.cosine, 9))
        for r in embedding_match_stream(queries, index, min_cosine=0.95, n_planes=6).collect()
    }

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, sl in enumerate([slice(0, 6), slice(6, 10)]):  # two micro-batches
        d = os.path.join(src, f"f{i}")
        rows = [(j, [float(x) for x in qm[j]]) for j in range(*sl.indices(10))]
        spark.createDataFrame(rows, "query_id long, embedding array<double>").coalesce(
            1
        ).write.parquet(d)
        now = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    stream = (
        spark.readStream.schema("query_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = embedding_match_stream(stream, index, min_cosine=0.95, n_planes=6)
    q = (
        out.writeStream.format("memory").queryName("embmatch")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.query_id, r.vec_id, round(r.cosine, 9))
        for r in spark.sql("SELECT * FROM embmatch").collect()
    }
    assert got == batch
    assert {(i, i) for i in range(5)} <= {(a, b) for a, b, _ in got}
    index.unpersist()


def test_plan_is_stateless_and_query_side_explodes(spark):
    rng = np.random.RandomState(1)
    corpus = _corpus_df(spark, _vecs(rng, 20))
    queries = _corpus_df(spark, _vecs(rng, 3)).withColumnRenamed("vec_id", "query_id")
    index = index_embedding_corpus(corpus, n_planes=4)
    out = embedding_match_stream(queries, index, min_cosine=0.5, n_planes=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "StateStore" not in plan
    assert "Generate explode" in plan  # bounded multiprobe fan-out, query side only
    # one bucket per corpus vector
    assert index.count() == 20 and index.select("vec_id").distinct().count() == 20
