"""WARC / WET crawl-archive reader (stdlib-only, distributed).

Web-scale training corpora ship as WARC archives (ISO 28500: Common
Crawl's ~1 GB `.warc.gz` / `.warc.wet.gz` segments). This reader turns
a directory of them into a DataFrame of records so the web stage-0 ops
(:func:`trackintel_spark.scale.canonicalize_url`,
:func:`trackintel_spark.scale.strip_html_expr`) can run straight off
the crawl.

Scale shape: ``spark.read.format("binaryFile")`` yields ONE task per
archive file — exactly the parallelism Common Crawl is published for
(a crawl is ~64k independent ~1 GB segments; 1000 executors chew the
file list with no shuffle at all). Record splitting + header parsing
run in an Arrow-batched ``mapInPandas`` kernel over the file bytes;
gzip members decompress with stdlib ``gzip`` (multi-member streams —
the per-record-gzipped layout CC uses — decode in one call). No
Python touches the rows again after the kernel: filtering by record
type, URL canonicalization and HTML stripping are all codegen
expressions downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WARC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_id", T.LongType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, keeping every
    member that decodes: real crawl segments arrive truncated or with a
    corrupt tail member, and ``gzip.decompress`` would throw the WHOLE
    segment away (and with it the Spark task — one bad segment in a
    64k-file crawl must not fail the job). Member-by-member via
    zlib(wbits=31); stops at the first undecodable byte.

    O(n) over the whole stream: a cursor ``off`` advances through the
    ORIGINAL buffer by exactly the bytes each member consumed
    (fed - len(unused_data)); the tail is never re-concatenated.
    Common Crawl segments gzip each record as its own member (tens of
    thousands per ~1 GB file), so any per-member copy of the remaining
    buffer would be O(members x stream_size) — a per-task hang on
    exactly the workload this reader targets."""
    import zlib

    out = []
    chunk = 1 << 16
    n = len(data)
    off = 0
    while data[off : off + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        i = off
        err = False
        while i < n and not d.eof:
            try:
                out.append(d.decompress(data[i : i + chunk]))
            except zlib.error:
                err = True  # chunks decoded before the error are kept
                break
            i += chunk
        if err or not d.eof:  # corrupt or truncated member ends the scan
            break
        fed = min(i, n) - off
        off += fed - len(d.unused_data)
    return b"".join(out)


def parse_warc_bytes(data: bytes):
    """Split one (possibly multi-member gzip) WARC byte stream into
    records: yields (record_type, url, date, content_type, length,
    payload bytes). Pure function — unit-testable without Spark.

    Tolerant of trailing garbage and truncated final records (real
    crawl segments have both): a record that can't be parsed ends the
    scan rather than raising.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines (CRLF or bare-LF WARCs)
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 2 if data[pos : pos + 2] == b"\r\n" else 1
        if not data[pos : pos + 5] == b"WARC/":
            break
        # Take whichever blank-line terminator occurs FIRST from pos: an
        # LF-terminated WARC header block whose payload contains a CRLF
        # blank line (any HTTP envelope does) must not pick the payload's
        # \r\n\r\n as the header terminator — that mis-reads
        # Content-Length and silently drops the rest of the file.
        # Single forward walk over "\n" hits, stopping at the first
        # terminator of EITHER flavor: two unbounded data.find() calls
        # here would each rescan the whole remaining buffer per record
        # whenever one flavor never occurs (strict-CRLF Common Crawl
        # segments have no bare "\n\n"), turning parsing into
        # O(records x filesize) on real ~1 GB segments.
        hdr_end = -1
        sep = 0
        i = data.find(b"\n", pos)
        while i != -1:
            if data[i + 1 : i + 2] == b"\n":
                hdr_end, sep = i, 2  # "\n\n"
                break
            if (
                i - 1 >= pos
                and data[i - 1 : i] == b"\r"
                and data[i + 1 : i + 3] == b"\r\n"
            ):
                hdr_end, sep = i - 1, 4  # "\r\n\r\n"
                break
            i = data.find(b"\n", i + 1)
        if hdr_end == -1:
            break
        headers = {}
        for line in data[pos:hdr_end].split(b"\n")[1:]:
            line = line.strip(b"\r")
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        body_start = hdr_end + sep
        payload = data[body_start : body_start + length]
        yield (
            headers.get(b"warc-type", b"").decode("ascii", "replace") or None,
            headers.get(b"warc-target-uri", b"").decode("utf-8", "replace") or None,
            headers.get(b"warc-date", b"").decode("ascii", "replace") or None,
            headers.get(b"content-type", b"").decode("ascii", "replace") or None,
            length,
            payload,
        )
        pos = body_start + length


def read_warc(spark: SparkSession, path: str, record_types: list[str] | None = None) -> DataFrame:
    """Read ``<path>`` (glob over ``.warc`` / ``.warc.gz`` files) into
    one row per WARC record.

    ``record_types`` pre-filters inside the kernel (e.g.
    ``["response"]`` for fetched pages, ``["conversion"]`` for WET
    text) so unwanted payload bytes never enter Arrow.

    Columns: ``file, record_id (per-file ordinal), record_type, url,
    date, content_type, content_length, payload (binary)``.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _parse_warc_files(files, record_types)


def read_warc_stream(
    spark: SparkSession, path: str, record_types: list[str] | None = None
) -> DataFrame:
    """Streaming sibling of :func:`read_warc`: watch ``<path>`` for new
    crawl segments with the file stream source (binaryFile needs its
    schema pinned up front in streaming mode) and parse each arriving
    segment with the SAME kernel — an online ingest pipeline composes
    this with :func:`trackintel_spark.streaming.url_dedup_stream` and
    the codegen stage-0 ops. One micro-batch task per new segment; the
    kernel carries no state."""
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
        .select("path", "content")
    )
    return _parse_warc_files(files, record_types)


def parse_warc_frame(files: DataFrame, record_types: list[str] | None = None) -> DataFrame:
    """Record-split a DataFrame of pre-loaded WARC images — columns
    ``path string, content binary`` — with the same Arrow kernel
    :func:`read_warc` uses on files. For archives that arrive as bytes
    rather than paths (message queues, object-store range reads, or a
    synthesized fixture column); one kernel, two entry points.
    """
    return _parse_warc_files(files.select("path", "content"), record_types)


def _parse_warc_files(files: DataFrame, record_types: list[str] | None) -> DataFrame:
    wanted = set(record_types) if record_types else None

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "file", "record_id", "record_type", "url", "date",
                "content_type", "content_length", "payload",
            )}
            for path_, data in zip(pdf["path"], pdf["content"]):
                rid = 0
                for rtype, url, date, ctype, length, payload in parse_warc_bytes(bytes(data)):
                    rid += 1
                    if wanted is not None and rtype not in wanted:
                        continue
                    out["file"].append(path_)
                    out["record_id"].append(rid)
                    out["record_type"].append(rtype)
                    out["url"].append(url)
                    out["date"].append(date)
                    out["content_type"].append(ctype)
                    out["content_length"].append(length)
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=_WARC_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET convenience view: the ``conversion`` (extracted-text)
    records of a WET archive as (file, record_id, url, date, text) —
    the natural input to the documents pipeline. The utf-8 decode is a
    codegen cast, not Python."""
    recs = read_warc(spark, path, record_types=["conversion"])
    return recs.select(
        "file",
        "record_id",
        "url",
        "date",
        F.col("payload").cast("string").alias("text"),
    )


def read_warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """HTTP ``response`` records with the HTTP header block split off:
    (file, record_id, url, date, http_headers, html). The header/body
    split is a codegen substring on the first blank line — WARC
    response payloads embed the HTTP envelope before the body."""
    recs = read_warc(spark, path, record_types=["response"])
    body = F.col("payload").cast("string")
    # first blank line splits HTTP envelope from body; a payload without
    # one (non-HTTP capture) keeps everything as html and NULL headers
    headers = F.nullif(
        F.regexp_extract(body, "(?s)^(.*?)(\r\n\r\n|\n\n)", 1), F.lit("")
    )
    html = F.when(
        body.rlike("(?s)^.*?(\r\n\r\n|\n\n)"),
        F.regexp_replace(body, "(?s)^.*?(\r\n\r\n|\n\n)", ""),
    ).otherwise(body)
    return recs.select(
        "file", "record_id", "url", "date",
        headers.alias("http_headers"), html.alias("html"),
    )
