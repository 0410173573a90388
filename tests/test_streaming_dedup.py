"""Streaming exact dedup: first occurrence wins, state spans
micro-batches within the watermark."""

import os
import time
from datetime import datetime, timedelta

from trackintel_spark.streaming import dedup_stream

T0 = datetime(2024, 1, 1, 8, 0, 0)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")


def _stream_dedup(spark, tmp_path, files, name, max_files=None, **kw):
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(files):
        _docs_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i  # file-source ordering follows mtime
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    reader = spark.readStream.schema("doc_id long, ts timestamp, text string")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(src)
    out = dedup_stream(stream, watermark="30 minutes", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_dedup_stream_within_batch(spark, tmp_path):
    rows = [
        (0, T0, "the same document text"),
        (1, T0 + timedelta(minutes=1), "The  Same document TEXT"),  # normalizes equal
        (2, T0 + timedelta(minutes=2), "a different document"),
    ]
    got = _stream_dedup(spark, tmp_path, [rows], "dedup_one_batch")
    assert sorted(r.doc_id for r in got) == [0, 2]
    assert all(r.fingerprint is not None for r in got)


def test_dedup_stream_state_spans_microbatches(spark, tmp_path):
    f1 = [
        (0, T0, "alpha beta gamma"),
        (1, T0 + timedelta(minutes=1), "delta epsilon zeta"),
    ]
    f2 = [
        (2, T0 + timedelta(minutes=5), "alpha  BETA gamma"),  # dup of 0, later batch
        (3, T0 + timedelta(minutes=6), "fresh content here"),
    ]
    got = _stream_dedup(spark, tmp_path, [f1, f2], "dedup_two_batches", max_files=1)
    assert sorted(r.doc_id for r in got) == [0, 1, 3]


def test_dedup_stream_exact_text_mode(spark, tmp_path):
    rows = [
        (0, T0, "x y z"),
        (1, T0 + timedelta(minutes=1), "x y z"),
        (2, T0 + timedelta(minutes=2), "x y w"),
    ]
    got = _stream_dedup(spark, tmp_path, [rows], "dedup_exact_text", exact_text=True)
    assert sorted(r.doc_id for r in got) == [0, 2]


def test_dedup_stream_batch_fallback(spark):
    # the same plan works on a batch DataFrame (dropDuplicates semantics)
    rows = [
        (0, T0, "one two"),
        (1, T0 + timedelta(minutes=1), "one  TWO"),
        (2, T0 + timedelta(minutes=2), "three four"),
    ]
    got = dedup_stream(_docs_df(spark, rows)).collect()
    assert sorted(r.doc_id for r in got) == [0, 2]


# -- canonical-URL dedup at ingest ---------------------------------------------


def _urls_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, ts timestamp, url string")


def _stream_url_dedup(spark, tmp_path, files, name, max_files=None, **kw):
    from trackintel_spark.streaming import url_dedup_stream

    src = os.path.join(str(tmp_path), "usrc")
    os.makedirs(src, exist_ok=True)
    for i, chunk in enumerate(files):
        _urls_df(spark, chunk).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))
        now = time.time() + i
        d = os.path.join(src, f"f{i}")
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now, now))
    reader = spark.readStream.schema("doc_id long, ts timestamp, url string")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.option("recursiveFileLookup", "true").parquet(src)
    out = url_dedup_stream(stream, watermark="30 minutes", **kw)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_url_dedup_stream_canonical_collapse(spark, tmp_path):
    rows = [
        (0, T0, "https://www.example.com/a/?utm_source=x"),
        (1, T0 + timedelta(minutes=1), "HTTPS://EXAMPLE.COM:443/a"),  # same canonical
        (2, T0 + timedelta(minutes=2), "https://example.com/b"),
    ]
    got = _stream_url_dedup(spark, tmp_path, [rows], "urldedup_one")
    assert sorted(r.doc_id for r in got) == [0, 2]
    assert {r.canonical_url for r in got} == {
        "https://example.com/a",
        "https://example.com/b",
    }


def test_url_dedup_stream_state_spans_microbatches(spark, tmp_path):
    f1 = [(0, T0, "https://example.com/p?b=2&a=1")]
    f2 = [
        (1, T0 + timedelta(minutes=5), "https://example.com/p?a=1&b=2&gclid=z"),  # dup of 0
        (2, T0 + timedelta(minutes=6), "https://example.com/q"),
    ]
    got = _stream_url_dedup(spark, tmp_path, [f1, f2], "urldedup_two", max_files=1)
    assert sorted(r.doc_id for r in got) == [0, 2]


def test_url_dedup_stream_batch_fallback_matches_dedup_url(spark):
    from trackintel_spark.scale import dedup_url
    from trackintel_spark.streaming import url_dedup_stream

    rows = [
        (3, T0 + timedelta(minutes=3), "https://www.example.com/a/"),
        (0, T0, "https://example.com/a"),
        (5, T0 + timedelta(minutes=5), "https://example.com/c"),
    ]
    df = _urls_df(spark, rows)
    # batch fallback: first BY EVENT TIME per canonical (doc_id 0 beats 3)
    got = sorted(r.doc_id for r in url_dedup_stream(df).collect())
    assert got == [0, 5]
    # dedup_url keeps min id — same winner here
    batch = sorted(r.doc_id for r in dedup_url(df).collect())
    assert batch == got
