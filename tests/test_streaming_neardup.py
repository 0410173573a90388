"""neardup_stream: online MinHash-LSH near-duplicate detection —
batch parity with minhash_lsh_candidates and chunk-invariance."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from trackintel_spark.streaming import neardup_stream, resolve_neardup


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "behind distant purple mountains and rivers flow quietly north"
    )
    rows = [
        (0, base),
        (1, base + " extra trailing clause appended here"),           # near-dup of 0
        (2, "completely different content about cooking pasta with "
            "garlic tomatoes olive oil basil and parmesan cheese"),
        (3, base.replace("quick", "swift")),                           # near-dup of 0
        (4, "another unrelated document regarding quantum computing "
            "error correction codes and topological qubits research"),
        (5, base),                                                     # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_signature_expr_matches_batch_signature(spark):
    from trackintel_spark.scale.dedup import minhash_signature, minhash_signature_expr

    docs = _docs(spark)
    batch = {
        r.doc_id: list(r.minhash)
        for r in minhash_signature(docs, num_perm=16).select("doc_id", "minhash").collect()
    }
    expr = {
        r.doc_id: list(r.s)
        for r in docs.select(
            "doc_id", minhash_signature_expr(F.col("text"), 16).alias("s")
        ).collect()
    }
    assert batch == expr
    # shingle-less doc -> NULL both ways
    empty = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    r = empty.select(minhash_signature_expr(F.col("text"), 16, shingle_n=3).alias("s")).first()
    assert r.s is None


def test_batch_verdicts_match_lsh_candidates(spark):
    """Pure-LSH mode: resolve(neardup_stream) == the per-doc reduction
    of the batch candidate pairs (dup_of = smallest earlier collider)."""
    from trackintel_spark.scale import minhash_lsh_candidates

    docs = _docs(spark)
    pairs = minhash_lsh_candidates(docs, num_perm=16, bands=8).collect()
    expect: dict = {}
    for p in pairs:
        expect[p.id_b] = min(expect.get(p.id_b, p.id_a), p.id_a)

    verdicts = neardup_stream(docs, num_perm=16, bands=8)
    got = {r.doc_id: r for r in resolve_neardup(verdicts).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}
    for d in got:
        if d in expect:
            assert got[d].is_dup and got[d].dup_of == expect[d], d
        else:
            assert not got[d].is_dup, d
    assert got[5].is_dup and got[5].dup_of == 0  # exact dup
    assert not got[2].is_dup and not got[4].is_dup


def test_threshold_filters_weak_collisions(spark):
    docs = _docs(spark)
    strict = resolve_neardup(
        neardup_stream(docs, num_perm=16, bands=8, threshold=0.999)
    )
    got = {r.doc_id: r.is_dup for r in strict.collect()}
    assert got[5] is True       # identical signature passes any threshold
    assert got[2] is False


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    docs = _docs(spark)
    batch = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in resolve_neardup(neardup_stream(docs, num_perm=16, bands=8)).collect()
    }

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    rows = docs.collect()
    chunks = [rows[:2], rows[2:4], rows[4:]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f_ in os.listdir(d):
            os.utime(os.path.join(d, f_), (now, now))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        neardup_stream(stream, num_perm=16, bands=8)
        .writeStream.format("memory").queryName("nd_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in resolve_neardup(spark.sql("SELECT * FROM nd_stream")).collect()
    }
    assert got == batch


def test_bucket_cap_still_matches_stored_sample(spark):
    docs = _docs(spark)
    got = {
        r.doc_id: r.is_dup
        for r in resolve_neardup(
            neardup_stream(docs, num_perm=16, bands=8, max_bucket=1)
        ).collect()
    }
    # doc 5 (exact dup of 0) still matches: 0 is the one stored entry
    assert got[5] is True


def test_neardup_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="divisible"):
        neardup_stream(docs, num_perm=16, bands=5)
    with pytest.raises(ValueError, match="bands"):
        neardup_stream(docs, num_perm=16, bands=0)


def test_short_documents_get_never_dup_verdict(spark):
    """Shingle-less documents (< shingle_n tokens) can't collide but
    must still appear in the verdict stream — a band=-1 never-a-dup row
    — so resolve_neardup covers EVERY input document."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "tiny doc"), (3, "x")],
        "doc_id long, text string",
    )
    out = resolve_neardup(neardup_stream(docs, num_perm=16, bands=8))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].is_dup is False and rows[2].dup_of is None
    assert rows[3].is_dup is False


def test_staged_signature_matches_single_expression(spark):
    """The staged two-projection form (minhash_hashes_expr ->
    minhash_signature_from_hashes, the streaming hot path) is value-
    identical to the one-expression form."""
    from trackintel_spark.scale.dedup import (
        minhash_hashes_expr,
        minhash_signature_expr,
        minhash_signature_from_hashes,
    )

    docs = _docs(spark)
    one = {
        r.doc_id: r.s and list(r.s)
        for r in docs.select(
            "doc_id", minhash_signature_expr(F.col("text"), 16).alias("s")
        ).collect()
    }
    staged_df = docs.select(
        "doc_id", minhash_hashes_expr(F.col("text")).alias("h")
    ).select("doc_id", minhash_signature_from_hashes(F.col("h"), 16).alias("s"))
    staged = {r.doc_id: r.s and list(r.s) for r in staged_df.collect()}
    assert one == staged


@pytest.mark.slow
def test_state_ttl_accepted_and_correct_within_window(spark, tmp_path):
    """state_ttl_min wires ProcessingTimeTimeout through the stream path
    (and is a no-op in batch mode); with a generous TTL nothing is
    evicted mid-run, so results equal the no-TTL baseline."""
    docs = _docs(spark)
    base = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in resolve_neardup(neardup_stream(docs, num_perm=16, bands=8)).collect()
    }
    # batch mode: TTL ignored
    got_b = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in resolve_neardup(
            neardup_stream(docs, num_perm=16, bands=8, state_ttl_min=60)
        ).collect()
    }
    assert got_b == base

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    rows = docs.collect()
    for i, chunk in enumerate([rows[:3], rows[3:]]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f_ in os.listdir(d):
            os.utime(os.path.join(d, f_), (now, now))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        neardup_stream(stream, num_perm=16, bands=8, state_ttl_min=60)
        .writeStream.format("memory").queryName("nd_ttl")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got_s = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in resolve_neardup(spark.sql("SELECT * FROM nd_ttl")).collect()
    }
    assert got_s == base


def test_staged_projections_digest_text_once(spark):
    """The staging contract in minhash_hashes_expr's docstring, pinned at
    the plan level: CollapseProject must NOT fold the base-hash column
    into the per-permutation mins (the alias is non-cheap and multiply
    referenced), so the optimized plan digests the text ONCE — the
    single-expression form re-digests it once per permutation."""
    from trackintel_spark.scale.dedup import (
        minhash_hashes_expr,
        minhash_signature_expr,
        minhash_signature_from_hashes,
    )

    docs = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    staged = docs.select(
        "doc_id", minhash_hashes_expr(F.col("text")).alias("__h")
    ).select("doc_id", minhash_signature_from_hashes(F.col("__h"), 16).alias("__sig"))
    plan = staged._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("md5") == 1

    single = docs.select(
        "doc_id", minhash_signature_expr(F.col("text"), 16).alias("__sig")
    )
    plan1 = single._jdf.queryExecution().optimizedPlan().toString()
    assert plan1.count("md5") >= 16  # what the staging avoids


def test_bucket_saturation_is_observable(spark):
    """max_bucket=1: the second and third near-identical documents hit
    a full bucket — their verdicts carry bucket_saturated=True (matched
    against the frozen sample, not stored), and resolve_neardup
    surfaces the per-document saw_saturated_bucket recall-loss flag."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, base), (3, "completely different words " * 4)],
        "doc_id long, text string",
    )
    verdicts = neardup_stream(docs, num_perm=16, bands=8, max_bucket=1)
    per_band = verdicts.filter("band >= 0").collect()
    by_doc = {}
    for r in per_band:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0 seeded its buckets un-saturated; docs 1 and 2 hit full ones
    assert all(not r.bucket_saturated for r in by_doc[0])
    assert all(r.bucket_saturated for r in by_doc[1])
    assert all(r.bucket_saturated for r in by_doc[2])
    resolved = {r.doc_id: r for r in resolve_neardup(verdicts).collect()}
    assert resolved[0].saw_saturated_bucket is False
    assert resolved[1].saw_saturated_bucket is True
    assert resolved[1].is_dup and resolved[1].dup_of == 0
    # doc 2 still matches doc 0 (the stored sample) despite saturation
    assert resolved[2].is_dup and resolved[2].dup_of == 0
    assert resolved[3].saw_saturated_bucket is False
