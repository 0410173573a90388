"""Incremental dedup-against-index == one global batch dedup.

The whole point of scale/incremental.py is that checking a daily shard
against a compact index makes the SAME accept/reject decisions a
from-scratch batch dedup over history ∪ shard would make. These tests
pin that equivalence for both the exact and the near-dup path, the
index algebra (merge ≡ rebuild, idempotence), and the no-exchange-on-
the-index-side plan property the module docstring claims.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale import (
    build_exact_index,
    build_neardup_index,
    dedup_against_index,
    dedup_exact,
    merge_exact_index,
    merge_neardup_index,
    minhash_lsh_candidates,
    neardup_against_index,
)

HIST = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "sphinx of black quartz judge my vow"),
    (3, "the quick brown fox jumps over the lazy dog"),  # dup within history
    (4, "how vexingly quick daft zebras jump"),
]
SHARD = [
    (1000, "pack my box with five dozen liquor jugs"),  # dup of history 1
    (1001, "a wholly new document about mountains"),
    (1002, "a wholly new document about mountains"),  # within-shard dup of 1001
    (1003, "sphinx of black quartz judge my vow"),  # dup of history 2
    (1004, "another new document entirely different"),
    (1005, "a wholly new document about mountains"),  # within-shard dup again
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_incremental_matches_global_batch(spark):
    hist = _docs(spark, HIST)
    shard = _docs(spark, SHARD)
    index = build_exact_index(hist)

    out = dedup_against_index(shard, index).orderBy("doc_id").collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == len(SHARD)  # one verdict per shard doc

    assert by_id[1000].dup_of == 1 and not by_id[1000].is_new
    assert by_id[1003].dup_of == 2 and not by_id[1003].is_new
    assert by_id[1001].is_new and by_id[1001].dup_of is None
    assert by_id[1004].is_new
    assert by_id[1002].dup_of == 1001 and not by_id[1002].is_new
    assert by_id[1005].dup_of == 1001

    # equivalence: is_new set == global batch keep-set restricted to the shard
    global_kept = {
        r.doc_id
        for r in dedup_exact(hist.unionByName(shard)).collect()
        if r.doc_id >= 1000
    }
    assert {r.doc_id for r in out if r.is_new} == global_kept


def test_exact_index_merge_equals_rebuild_and_is_idempotent(spark):
    hist = _docs(spark, HIST)
    shard = _docs(spark, SHARD)
    merged = merge_exact_index(build_exact_index(hist), build_exact_index(shard))
    rebuilt = build_exact_index(hist.unionByName(shard))
    as_set = lambda df: {(r.digest, r.first_id) for r in df.collect()}
    assert as_set(merged) == as_set(rebuilt)
    # idempotent: folding the same additions twice changes nothing
    twice = merge_exact_index(merged, build_exact_index(shard))
    assert as_set(twice) == as_set(merged)


NEAR_HIST = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "one two three four five six seven eight nine ten eleven twelve"),
    (2, "completely unrelated text about the weather in zurich today"),
]
NEAR_SHARD = [
    # near-dup of history 0 (one token changed)
    (100, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    # exact text of history 1 (jaccard 1.0)
    (101, "one two three four five six seven eight nine ten eleven twelve"),
    # unrelated
    (102, "trains and stations and platforms and signals and delays"),
]


def test_neardup_incremental_matches_global_candidates(spark):
    kw = dict(num_perm=32, bands=16, shingle_n=3)
    threshold = 0.4
    hist = _docs(spark, NEAR_HIST)
    shard = _docs(spark, NEAR_SHARD)
    index = build_neardup_index(hist, **kw)

    out = {r.doc_id: r for r in neardup_against_index(shard, index, threshold, **kw).collect()}
    assert len(out) == len(NEAR_SHARD)

    # ground truth: batch LSH over history ∪ shard, cross pairs only
    batch = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in minhash_lsh_candidates(hist.unionByName(shard), **kw).collect()
        if r.id_a < 100 <= r.id_b and r.jaccard_est >= threshold
    }
    for sid, row in out.items():
        best = sorted(
            ((est, -hid) for (hid, b), est in batch.items() if b == sid),
            reverse=True,
        )
        if best:
            assert not row.is_new
            assert row.dup_of == -best[0][1]
            assert row.jaccard_est == pytest.approx(best[0][0])
        else:
            assert row.is_new and row.dup_of is None
    # non-vacuous: the exact copy MUST be caught with estimate 1.0
    assert out[101].dup_of == 1 and out[101].jaccard_est == pytest.approx(1.0)
    assert not out[100].is_new  # near-dup caught
    assert out[102].is_new


def test_neardup_index_merge_is_idempotent(spark):
    kw = dict(num_perm=32, bands=8, shingle_n=3)
    idx = build_neardup_index(_docs(spark, NEAR_HIST), **kw)
    add = build_neardup_index(_docs(spark, NEAR_SHARD), **kw)
    merged = merge_neardup_index(idx, add)
    twice = merge_neardup_index(merged, add)
    assert twice.count() == merged.count() == idx.count() + add.count()


def test_bucketed_index_join_shuffles_only_the_shard(spark):
    """Module-docstring claim: with the index stored bucketed on
    ``digest``, the nightly shard join plans with no exchange on the
    index side — at 100 TB the history never re-shuffles."""
    from trackintel_spark.plans.partitioning import write_bucketed

    hist = _docs(spark, [(i, f"history document number {i}") for i in range(200)])
    shard = _docs(spark, [(1000 + i, f"shard document number {i}") for i in range(50)])
    name = "t_incremental_index_pin"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(build_exact_index(hist), name, ("digest",), num_buckets=4)
        out = dedup_against_index(shard, spark.table(name))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # exactly the shard-side digest exchanges; scanning the bucketed
        # index never feeds an Exchange hashpartitioning(digest...)
        scan_to_exchange = plan.count("Exchange hashpartitioning(digest")
        assert scan_to_exchange <= 2, plan  # shard probe + shard_first agg
        assert out.filter("is_new").count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_exact_incremental_fuzz_vs_global(spark, seed):
    """Randomized: texts drawn from a small pool (forcing natural
    collisions within history, within shard, and across) must produce
    the same shard keep-set as one global batch dedup."""
    import random

    rng = random.Random(seed)
    pool = [f"pooled text variant {i} with shared words" for i in range(12)]
    hist_rows = [
        (i, rng.choice(pool) if rng.random() < 0.7 else f"hist unique {seed}-{i}")
        for i in range(40)
    ]
    shard_rows = [
        (1000 + i, rng.choice(pool) if rng.random() < 0.7 else f"shard unique {seed}-{i}")
        for i in range(30)
    ]
    hist = _docs(spark, hist_rows)
    shard = _docs(spark, shard_rows)
    out = dedup_against_index(shard, build_exact_index(hist)).collect()
    got_new = {r.doc_id for r in out if r.is_new}
    global_kept = {
        r.doc_id
        for r in dedup_exact(hist.unionByName(shard)).collect()
        if r.doc_id >= 1000
    }
    assert got_new == global_kept
    # dup_of targets always carry the same text as the duplicate
    texts = dict(hist_rows + shard_rows)
    for r in out:
        if r.dup_of is not None:
            assert texts[r.dup_of] == texts[r.doc_id]
            assert r.dup_of < r.doc_id


def test_bucketed_neardup_index_elides_band_exchange(spark):
    """The banded index stored bucketed on (band, bhash) joins the
    shard probe with no exchange on the index side either."""
    from trackintel_spark.plans.partitioning import write_bucketed

    hist = _docs(spark, [(i, f"history words number {i} alpha beta gamma") for i in range(100)])
    shard = _docs(spark, [(1000 + i, f"shard words number {i} alpha beta gamma") for i in range(30)])
    name = "t_neardup_index_pin"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(build_neardup_index(hist), name, ("band", "bhash"), num_buckets=4)
        out = neardup_against_index(shard, spark.table(name), threshold=0.9)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning(band") <= 1, plan  # probe side only
        assert out.count() == 30
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
