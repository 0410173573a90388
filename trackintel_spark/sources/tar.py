"""WebDataset-style TAR shard reader (stdlib tarfile, distributed).

Multimodal training corpora ship as TAR shards whose members pair up
by basename — ``000123.jpg`` + ``000123.txt`` + ``000123.json`` is one
sample (the WebDataset convention; LAION, img2dataset, OpenCLIP all
produce it). This reader turns a directory of ``.tar`` shards into
either raw members or grouped samples.

Scale shape: like the WARC reader, ``binaryFile`` yields ONE task per
shard — the published parallelism of the format (shards are sized for
exactly this, typically 100 MB-1 GB) — and member extraction runs in
an Arrow kernel from the in-memory bytes; sample grouping is a
``groupBy`` on (shard, key) whose width is bounded by the sample's own
payload sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),       # basename before the FIRST dot
        T.StructField("ext", T.StringType()),        # everything after the first dot
        T.StructField("member", T.StringType()),     # full member path
        T.StructField("idx", T.LongType()),          # member ordinal within the shard
        T.StructField("size", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_tar_members(spark: SparkSession, path: str, extensions: list[str] | None = None) -> DataFrame:
    """One row per regular TAR member across ``<path>``'s ``.tar`` /
    ``.tar.gz`` shards. ``extensions`` pre-filters inside the kernel
    (match on the full post-first-dot suffix, e.g. ``["jpg", "txt",
    "json"]``) so unwanted payloads never enter Arrow.

    WebDataset key convention: ``key`` = member basename up to the
    FIRST dot, ``ext`` = the rest — so ``x/000123.seg.png`` pairs with
    ``x/000123.txt`` under key ``x/000123``.
    """
    wanted = set(extensions) if extensions else None

    def run(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in ("shard", "key", "ext", "member", "idx", "size", "payload")}
            for shard, data in zip(pdf["path"], pdf["content"]):
                # corrupt/truncated shards are routine in large corpora:
                # keep every member parsed before the failure and move
                # on — one bad shard must not fail the whole Spark task.
                # Each member appends atomically (tuple built first) so
                # a mid-member error can't desync the column lists.
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(data)), mode="r:*") as tf:
                        for idx, m in enumerate(tf):
                            if not m.isreg():
                                continue
                            name = m.name
                            base = name.rsplit("/", 1)[-1]
                            if "." in base:
                                stem, ext = base.split(".", 1)
                            else:
                                stem, ext = base, ""
                            if wanted is not None and ext not in wanted:
                                continue
                            prefix = name[: len(name) - len(base)]
                            f = tf.extractfile(m)
                            payload = f.read() if f is not None else b""
                            for k, v in zip(
                                ("shard", "key", "ext", "member", "idx", "size", "payload"),
                                (shard, prefix + stem, ext, name, idx, m.size, payload),
                            ):
                                rows[k].append(v)
                except (tarfile.TarError, EOFError, OSError):
                    continue
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(run, schema=_MEMBER_SCHEMA)


def read_webdataset(
    spark: SparkSession, path: str, extensions: list[str] | None = None
) -> DataFrame:
    """Grouped WebDataset samples: one row per (shard, key) with
    ``parts`` = map<ext, payload binary> holding every member of the
    sample. Select a modality with ``F.col("parts")["jpg"]`` and feed
    it straight to the multimodal kernels (image_features etc.).

    One shuffle on (shard, key); at WebDataset shard sizes a sample's
    members are adjacent in the same input task, so AQE coalesces the
    tiny partitions the groupBy produces.
    """
    members = read_tar_members(spark, path, extensions=extensions)
    # Real corpora contain duplicate tar entries (re-appended samples); tar
    # extraction semantics say the LAST entry wins. Dedupe per (key, ext)
    # with max_by on the member ordinal INSIDE the same (shard, key)
    # aggregation — map_from_entries would otherwise throw under the
    # default spark.sql.mapKeyDedupPolicy=EXCEPTION and fail the job.
    last_per_ext = (
        members.groupBy("shard", "key", "ext")
        .agg(F.max_by(F.struct("payload", "size"), F.col("idx")).alias("m"))
        .select("shard", "key", "ext", F.col("m.payload").alias("payload"),
                F.col("m.size").alias("size"))
    )
    # n_parts / total_bytes describe the SAME row set as `parts`: the
    # deduped last-wins members. Counting raw entries here would let
    # n_parts exceed size(parts) while total_bytes excluded the losers'
    # bytes — three columns describing three different row sets.
    return (
        last_per_ext.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("ext"), F.col("payload")))
            ).alias("parts"),
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("size").alias("total_bytes"),
        )
    )
