"""WARC/WET crawl-archive reader (sources/warc.py)."""

import gzip
import os

from trackintel_spark.sources import read_warc, read_warc_responses, read_wet
from trackintel_spark.sources.warc import parse_warc_bytes


def _record(rtype, url, body: bytes, ctype="text/html", date="2024-01-01T00:00:00Z"):
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        + (f"WARC-Target-URI: {url}\r\n" if url else "")
        + f"WARC-Date: {date}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


HTML_BODY = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html><body><p>hello crawl</p><script>x()</script></body></html>"
)


def _warc_bytes():
    return (
        _record("warcinfo", None, b"software: test\r\n", ctype="application/warc-fields")
        + _record("response", "https://www.Example.com/a/?utm_source=t", HTML_BODY)
        + _record("conversion", "https://example.com/a", b"hello crawl extracted",
                  ctype="text/plain")
        + _record("response", "https://example.com/b", b"no http envelope here")
    )


def test_parse_warc_bytes_plain_and_gzip():
    raw = _warc_bytes()
    for data in (raw, gzip.compress(raw)):
        recs = list(parse_warc_bytes(data))
        assert [r[0] for r in recs] == ["warcinfo", "response", "conversion", "response"]
        assert recs[1][1] == "https://www.Example.com/a/?utm_source=t"
        assert recs[1][5] == HTML_BODY
        assert recs[2][4] == len(b"hello crawl extracted")


def test_parse_warc_frame_matches_file_reader(spark, tmp_path):
    """parse_warc_frame over a pre-loaded (path, content) frame yields
    the same records as read_warc over the same bytes on disk."""
    from trackintel_spark.sources import parse_warc_frame

    raw = _warc_bytes()
    p = _write(tmp_path, "seg.warc", raw)
    from_files = read_warc(spark, str(tmp_path)).drop("file").collect()
    frame = spark.createDataFrame([("seg", bytearray(raw))], "path string, content binary")
    from_frame = parse_warc_frame(frame, record_types=None).drop("file").collect()
    assert sorted(map(tuple, from_files)) == sorted(map(tuple, from_frame))


def test_parse_warc_bytes_lf_headers_with_crlf_payload():
    # ADVICE r9: a WARC with LF-terminated headers whose payload contains
    # a CRLF blank line (any HTTP envelope) must pick the FIRST blank
    # line as the header terminator, not the payload's \r\n\r\n —
    # otherwise Content-Length is mis-read and the rest of the file's
    # records are silently dropped.
    def lf_record(rtype, url, body: bytes, ctype="text/html"):
        hdr = (
            f"WARC/1.0\n"
            f"WARC-Type: {rtype}\n"
            + (f"WARC-Target-URI: {url}\n" if url else "")
            + "WARC-Date: 2024-01-01T00:00:00Z\n"
            f"Content-Type: {ctype}\n"
            f"Content-Length: {len(body)}\n"
            f"\n"
        ).encode()
        return hdr + body + b"\n\n"

    raw = lf_record("response", "https://h/1", HTML_BODY) + lf_record(
        "conversion", "https://h/2", b"plain text", ctype="text/plain"
    )
    recs = list(parse_warc_bytes(raw))
    assert [r[0] for r in recs] == ["response", "conversion"]
    assert recs[0][5] == HTML_BODY  # full envelope payload, intact
    assert recs[1][5] == b"plain text"


def test_parse_warc_bytes_multimember_gzip_and_truncation():
    # CC-style per-record gzip members concatenated
    raw = _warc_bytes()
    members = b"".join(gzip.compress(_record("conversion", f"https://h/{i}", b"t" * i,
                                             ctype="text/plain")) for i in range(1, 4))
    assert [r[4] for r in parse_warc_bytes(members)] == [1, 2, 3]
    # truncated tail must not raise
    recs = list(parse_warc_bytes(raw[: len(raw) - len(HTML_BODY) // 2 - 40]))
    assert len(recs) >= 1


def _write(tmp_path, name, data):
    p = os.path.join(str(tmp_path), name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_read_warc_distributed(spark, tmp_path):
    _write(tmp_path, "seg-00000.warc", _warc_bytes())
    _write(tmp_path, "seg-00001.warc.gz", gzip.compress(_warc_bytes()))
    df = read_warc(spark, str(tmp_path))
    got = df.collect()
    assert len(got) == 8  # 4 records x 2 files
    types = {r.record_type for r in got}
    assert types == {"warcinfo", "response", "conversion"}
    # type pre-filter keeps unwanted payloads out of Arrow
    assert read_warc(spark, str(tmp_path), record_types=["conversion"]).count() == 2


def test_read_wet_text(spark, tmp_path):
    _write(tmp_path, "a.warc.gz", gzip.compress(_warc_bytes()))
    got = read_wet(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].text == "hello crawl extracted"
    assert got[0].url == "https://example.com/a"


def test_read_warc_responses_splits_http_envelope(spark, tmp_path):
    _write(tmp_path, "a.warc", _warc_bytes())
    got = {r.url: r for r in read_warc_responses(spark, str(tmp_path)).collect()}
    r = got["https://www.Example.com/a/?utm_source=t"]
    assert r.http_headers.startswith("HTTP/1.1 200 OK")
    assert r.html.startswith("<html>")
    # a payload without an HTTP envelope keeps everything as html
    assert got["https://example.com/b"].html == "no http envelope here"


def test_warc_to_stage0_composition(spark, tmp_path):
    """The crawl chain: read_warc_responses -> canonicalize_url ->
    strip_html_expr, all engine-side."""
    from pyspark.sql import functions as F

    from trackintel_spark.scale import canonicalize_url, strip_html_expr

    _write(tmp_path, "a.warc", _warc_bytes())
    out = (
        read_warc_responses(spark, str(tmp_path))
        .withColumn("canonical_url", canonicalize_url("url"))
        .withColumn("text", strip_html_expr("html"))
        .filter(F.col("text") != "")
        .collect()
    )
    by_url = {r.canonical_url: r.text for r in out}
    assert by_url["https://example.com/a"] == "hello crawl"


def test_read_warc_stream_online_url_dedup(spark, tmp_path):
    """Streaming crawl ingest: new segments arrive as micro-batches,
    parse with the batch kernel, and the online stage-0 chain
    (canonical-URL dedup) runs on top."""
    import time

    from pyspark.sql import functions as F

    from trackintel_spark.scale import canonicalize_url
    from trackintel_spark.sources import read_warc_stream

    src = os.path.join(str(tmp_path), "segs")
    os.makedirs(src)
    seg0 = _record("response", "https://www.Example.com/a/?utm_source=x", HTML_BODY) \
        + _record("response", "https://example.com/b", b"x")
    seg1 = _record("response", "https://EXAMPLE.com:443/a", b"re-fetch") \
        + _record("response", "https://example.com/c", b"y")
    _write(src, "seg-0.warc", seg0)
    now = time.time()
    os.utime(os.path.join(src, "seg-0.warc"), (now, now))
    _write(src, "seg-1.warc.gz", gzip.compress(seg1))
    os.utime(os.path.join(src, "seg-1.warc.gz"), (now + 1, now + 1))

    stream = read_warc_stream(spark, src, record_types=["response"])
    assert stream.isStreaming
    out = (
        stream.withColumn("canonical_url", canonicalize_url("url"))
        .withColumn("ts", F.to_timestamp(F.col("date")))
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["canonical_url"])
    )
    q = (
        out.writeStream.format("memory").queryName("warcstream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT canonical_url FROM warcstream").collect()
    urls = sorted(r.canonical_url for r in got)
    assert urls == [
        "https://example.com/a",
        "https://example.com/b",
        "https://example.com/c",
    ]


def test_corrupt_gzip_member_keeps_decoded_prefix():
    """A corrupt or truncated gzip member mid-segment must not throw
    away the whole segment (or the Spark task): every record from the
    members BEFORE the corruption survives; garbage with a gzip magic
    yields zero records instead of raising."""
    img = b"".join(
        _record("response", f"http://x/{i}", b"hello") for i in range(100)
    )
    quarters = [img[i * len(img) // 4 : (i + 1) * len(img) // 4] for i in range(4)]
    members = [gzip.compress(p, 6) for p in quarters]
    # pristine multi-member: all 100
    assert len(list(parse_warc_bytes(b"".join(members)))) == 100
    # corrupt 3rd member: the first two quarters' records survive
    bad = bytearray(members[2])
    bad[len(bad) // 2] ^= 0xFF
    recs = list(parse_warc_bytes(members[0] + members[1] + bytes(bad) + members[3]))
    assert 45 <= len(recs) <= 55
    # truncated final member: first member's records survive
    recs = list(parse_warc_bytes(members[0] + members[1][: len(members[1]) // 2]))
    assert len(recs) >= 25
    # gzip magic + garbage: empty, not an exception
    assert list(parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 50)) == []


def test_gunzip_per_record_members_linear_time():
    """Common Crawl gzips each record as its own member: tens of
    thousands of members per segment. The member scan must advance a
    cursor through the original buffer (O(n) total), never rebuild the
    remaining tail per member (O(members x stream_size) — a per-task
    hang on real ~1 GB segments)."""
    import time

    one = gzip.compress(_record("conversion", "http://x/a", b"y" * 20), 6)
    blob = one * 30000
    t0 = time.time()
    recs = list(parse_warc_bytes(blob))
    dt = time.time() - t0
    assert len(recs) == 30000
    # quadratic tail-rebuild took >60s on this shape; linear is <1s
    assert dt < 10.0, f"member scan took {dt:.1f}s — quadratic regression"
