"""Streaming robots.txt gate (streaming/web.py): stream-static join,
batch == stream pinned, snapshot refresh between micro-batches."""

import os
import time

import pytest
from pyspark.sql import functions as F

from trackintel_spark.scale.web import filter_by_robots
from trackintel_spark.streaming import robots_gate_stream

ROBOTS_ROWS = [
    ("a.com", "User-agent: *\nDisallow: /"),
    ("b.com", "User-agent: *\nDisallow: /private/\nAllow: /private/public/"),
    # c.com has no robots row -> keep_unmatched applies
]

URL_ROWS = [
    (0, "https://a.com/x"),
    (1, "https://b.com/private/secret"),
    (2, "https://b.com/private/public/ok"),
    (3, "https://b.com/open"),
    (4, "https://c.com/anything"),
]


def _urls_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def _stream_gate(spark, tmp_path, file_chunks, robots, name, max_files=None):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(file_chunks):
        d = os.path.join(src, f"f{i}")
        _urls_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(d)
        now = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    reader = spark.readStream.schema("doc_id long, url string")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(src)
    out = robots_gate_stream(stream, robots).select("doc_id", "url", "robots_allowed")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_robots_gate_stream_matches_batch(spark, tmp_path):
    robots = spark.createDataFrame(ROBOTS_ROWS, "host string, robots_txt string")
    got = _stream_gate(spark, tmp_path, [URL_ROWS], robots, "robots_one")
    stream_verdicts = {r.doc_id: r.robots_allowed for r in got}
    batch_verdicts = {
        r.doc_id: r.robots_allowed
        for r in filter_by_robots(_urls_df(spark, URL_ROWS), robots).collect()
    }
    assert stream_verdicts == batch_verdicts
    assert stream_verdicts == {0: False, 1: False, 2: True, 3: True, 4: True}


def test_robots_gate_stream_across_microbatches(spark, tmp_path):
    robots = spark.createDataFrame(ROBOTS_ROWS, "host string, robots_txt string")
    got = _stream_gate(
        spark, tmp_path, [URL_ROWS[:2], URL_ROWS[2:]], robots, "robots_two", max_files=1
    )
    assert {r.doc_id: r.robots_allowed for r in got} == {
        0: False, 1: False, 2: True, 3: True, 4: True,
    }


def test_robots_gate_stream_snapshot_refresh_via_foreachbatch(spark, tmp_path):
    """Rotating the snapshot WITHOUT a query restart: the documented
    foreachBatch recipe reads the snapshot fresh each micro-batch, so a
    rewrite between batches changes later verdicts only. (The
    stream-static join freezes its file listing at query start — a
    plain-parquet rewrite there needs a checkpointed restart.)"""
    snap = os.path.join(str(tmp_path), "robots_snapshot")
    spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /")], "host string, robots_txt string"
    ).coalesce(1).write.mode("overwrite").parquet(snap)

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate([[(0, "https://a.com/x")], [(1, "https://a.com/y")]]):
        d = os.path.join(src, f"f{i}")
        _urls_df(spark, rows).coalesce(1).write.parquet(d)
        now = time.time() + i
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))

    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    verdicts: dict[int, bool] = {}

    def gate(batch_df, batch_id):
        robots = spark.read.parquet(snap)  # fresh listing per batch
        out = filter_by_robots(batch_df, robots)
        verdicts.update({r.doc_id: r.robots_allowed for r in out.collect()})
        # flip the snapshot AFTER this batch: allow-all from now on
        spark.createDataFrame(
            [("a.com", "User-agent: *\nAllow: /")], "host string, robots_txt string"
        ).coalesce(1).write.mode("overwrite").parquet(snap)

    q = stream.writeStream.foreachBatch(gate).trigger(availableNow=True).start()
    q.awaitTermination(120)
    # batch 0 saw the disallow-all snapshot, batch 1 the refreshed one
    assert verdicts == {0: False, 1: True}


def test_robots_gate_stream_rejects_streaming_robots(spark, tmp_path):
    snap = os.path.join(str(tmp_path), "r")
    spark.createDataFrame(ROBOTS_ROWS, "host string, robots_txt string").write.parquet(snap)
    robots_stream = spark.readStream.schema("host string, robots_txt string").parquet(snap)
    urls = _urls_df(spark, URL_ROWS)
    with pytest.raises(ValueError, match="static snapshot"):
        robots_gate_stream(urls, robots_stream)
