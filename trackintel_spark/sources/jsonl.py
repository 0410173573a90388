"""JSONL document corpus IO — the lingua-franca format of LLM training
data (one JSON object per line; .jsonl / .jsonl.gz shards).

Spark-first: ``spark.read.json`` IS a distributed line-oriented reader
(and transparently decompresses .gz per file), so ingest is one scan
with an EXPLICIT schema — schema inference would cost a full extra
pass over 100 TB and can silently widen types between shards. Corrupt
lines land in ``_corrupt_record`` (PERMISSIVE mode) instead of failing
the job; ``read_documents_jsonl`` surfaces them as a count so pipeline
code can assert hygiene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, url string, "
    "ts timestamp, meta map<string,string>"
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOC_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL document corpus with a fixed schema.

    Unknown keys are ignored; missing keys are NULL; unparseable lines
    are dropped (or kept with their raw text in ``_corrupt_record``
    when ``keep_corrupt`` — audit mode). Globs and directories work
    (``part-*.jsonl.gz``). Audit caveat: Spark refuses queries that
    reference ONLY ``_corrupt_record`` on a raw scan — ``.persist()``
    the audit frame before counting corrupt rows.
    """
    if keep_corrupt:
        return (
            spark.read.schema(schema + ", _corrupt_record string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    # DROPMALFORMED, not a PERMISSIVE+filter: a filter on the corrupt
    # column trips Spark's corrupt-column-only restriction as soon as a
    # downstream count() prunes the data columns
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def write_documents_jsonl(
    df: DataFrame, path: str, num_shards: int | None = None, compression: str | None = "gzip"
) -> None:
    """Write a corpus as JSONL shards (optionally gzip) — repartition
    controls shard count; omit to keep the upstream partitioning."""
    out = df.repartition(num_shards) if num_shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
