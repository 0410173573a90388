"""trajectory_match_stream: stream == batch == brute force.

The operator is stateless, so stream correctness reduces to (a) the
plan being streaming-legal end-to-end (two stream-static joins + a
mapInPandas kernel) and (b) the match set being EXACT vs an all-pairs
numpy ground truth regardless of micro-batch chopping.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from test_trajectory_join import _df, _mk_trajs
from trackintel_spark.geogr.trajectory_distance import dtw_distance, frechet_distance
from trackintel_spark.streaming import index_trajectory_corpus, trajectory_match_stream

TAU = 900.0


def _brute_cross(queries, corpus, fn, tau):
    def arr(pts):
        return np.array([[p["lon"], p["lat"]] for p in pts], dtype=float)

    out = {}
    for qi, qpts in queries:
        for ci, cpts in corpus:
            d = fn(arr(qpts), arr(cpts))
            if d <= tau:
                out[(qi, ci)] = d
    return out


@pytest.mark.parametrize(
    "metric,fn,tau", [("frechet", frechet_distance, TAU), ("dtw", dtw_distance, 2 * TAU)]
)
def test_batch_match_equals_bruteforce(spark, metric, fn, tau):
    corpus = _mk_trajs(40, seed=10)
    queries = [(1000 + i, pts) for i, pts in _mk_trajs(25, seed=11)]
    cells, arrays = index_trajectory_corpus(_df(spark, corpus), tau)
    got = {
        (r.query_id, r.match_id): r.dist_m
        for r in trajectory_match_stream(
            _df(spark, queries), cells, arrays, tau, metric=metric
        ).collect()
    }
    want = _brute_cross(queries, corpus, fn, tau)
    assert set(got) == set(want) and len(want) > 5
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_stream_match_equals_batch(spark, tmp_path):
    corpus = _mk_trajs(40, seed=20)
    queries = [(1000 + i, pts) for i, pts in _mk_trajs(30, seed=21)]
    cells, arrays = index_trajectory_corpus(_df(spark, corpus), TAU)
    cells, arrays = cells.persist(), arrays.persist()

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i in range(3):  # 3 micro-batches of 10 queries
        _df(spark, queries[i * 10 : (i + 1) * 10]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))

    stream = (
        spark.readStream.schema("id long, geom array<struct<lon:double,lat:double>>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = trajectory_match_stream(stream, cells, arrays, TAU)
    query = (
        out.writeStream.format("memory")
        .queryName("traj_match_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    got = {
        (r.query_id, r.match_id): r.dist_m
        for r in spark.sql("SELECT * FROM traj_match_stream").collect()
    }
    want = _brute_cross(queries, corpus, frechet_distance, TAU)
    assert set(got) == set(want) and len(want) > 5
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    cells.unpersist(); arrays.unpersist()


def test_index_tau_validation(spark):
    with pytest.raises(ValueError):
        index_trajectory_corpus(_df(spark, _mk_trajs(3, seed=1)), -5.0)
    cells, arrays = index_trajectory_corpus(_df(spark, _mk_trajs(3, seed=1)), 100.0)
    with pytest.raises(ValueError):
        trajectory_match_stream(_df(spark, _mk_trajs(3, seed=2)), cells, arrays, 100.0, metric="nope")
