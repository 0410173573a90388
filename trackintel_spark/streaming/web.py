"""Online crawl politeness: the robots.txt gate as a stream-static join.

Closes the last batch-only web stage-0 operator: a fetch-frontier
stream gets its RFC 9309 verdict against a periodically-refreshed
robots snapshot. The verdict logic is
:func:`trackintel_spark.scale.web.filter_by_robots` itself — its shape
(one equi-join on host + pure array expressions) is already
stream-legal, so batch == stream is a property of ONE code path, the
same discipline as ``url_dedup_stream``.

Snapshot refresh semantics: a stream-static join re-reads the static
side's DATA each micro-batch, but the file LISTING is frozen into the
query plan at start — so with a plain parquet snapshot the verdicts
track the snapshot that existed when the query started, and a rewrite
requires a query restart (checkpointed restarts are cheap and exact).
To rotate the snapshot WITHOUT restarting — robots bodies are
re-fetched on their own cadence — apply the gate inside
``foreachBatch`` instead, reading the snapshot fresh per batch::

    def gate(batch_df, _id):
        robots = spark.read.parquet(snapshot_dir)   # fresh listing
        filter_by_robots(batch_df, robots).write...

Both recipes are pinned in tests/test_streaming_web.py. The join
carries no streaming state: hosts are dimension-cardinality and AQE
broadcasts them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from trackintel_spark.scale.web import filter_by_robots


def robots_gate_stream(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    keep_unmatched: bool = True,
) -> DataFrame:
    """Add ``robots_allowed`` to a streaming (or batch) URL frame.

    ``urls`` may be a ``readStream`` source; ``robots`` must be a
    static frame of (host, robots_txt) — the snapshot. Left
    stream-static joins with the stream on the left are supported by
    Structured Streaming in append mode, and everything downstream of
    the join is a map-side projection, so the gate adds no shuffle
    beyond the join itself and no state store.

    Filter on ``robots_allowed`` to enforce; compose with
    :func:`trackintel_spark.streaming.url_dedup_stream` and the WARC
    stream source for the full online stage 0
    (``read_warc_stream -> canonicalize -> gate -> dedup``).
    """
    if robots.isStreaming:
        raise ValueError(
            "robots must be a static snapshot frame (stream-stream robots "
            "joins would need state the RFC semantics don't: re-read the "
            "snapshot location instead)"
        )
    return filter_by_robots(
        urls, robots, url_col=url_col, agent=agent, keep_unmatched=keep_unmatched
    )
