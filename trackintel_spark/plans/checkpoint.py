"""Size-aware lineage truncation for chained entity pipelines.

Chained generate-operators (events -> staypoints -> triplegs -> trips
-> tours) embed their inputs several times each, so subtree copies
multiply down the chain: the composed tours DAG re-references the base
scan hundreds of times. Whether truncating that lineage with an eager
``localCheckpoint`` pays is DATA-DEPENDENT:

* small inputs (the sf0.1 bench tier, ~2 MB of events): re-scans are
  warm and nearly free, while materializing a checkpoint costs a real
  job — measured as a net LOSS (SCALE.md);
* probe/cluster scale (10M+ rows): every duplicated leaf is real I/O
  and recompute, and the same flip already paid off 29x for dbscan.

The decision metric is **redundant scan bytes**: the sum of the
analyzed plan's leaf size estimates minus the same sum over distinct
leaves (semantic-hash dedup) — i.e. the extra bytes one evaluation of
the plan re-reads because of lineage duplication. Leaf statistics come
from the relations themselves (parquet file sizes, range row counts),
so the metric scales with the data while identical plan SHAPES at
different scales decide differently — exactly the knob a constant
choice can't provide.

Tunable via ``spark.trackintel.checkpoint.minRedundantBytes`` (default
1 GiB; ``<= 0`` disables truncation entirely). Streaming frames and
frames below the threshold pass through untouched. Lineage the user
already ``persist()``-ed is exempt: the metric reads the
cache-substituted plan, so ``InMemoryRelation`` segments count zero
(see :func:`redundant_scan_bytes`).

Fault-tolerance tradeoff: ``localCheckpoint`` stores the materialized
blocks on the executors WITHOUT the lineage needed to recompute them —
if an executor is lost after truncation, the job FAILS instead of
recomputing the lost partitions. That is the price of cutting a
multi-hundred-leaf DAG. On clusters with preemptible/spot executors
set ``spark.trackintel.checkpoint.reliable=true`` (r12): truncation
then routes through ``DataFrame.checkpoint`` — the materialized
partitions land in the session's checkpoint directory
(``SparkContext.setCheckpointDir``, typically HDFS/S3) and survive
executor loss. Requires a checkpoint dir to be configured (the session
raises otherwise — a silent fallback to localCheckpoint would
reintroduce exactly the failure mode the knob opts out of). Or set
``spark.trackintel.checkpoint.minRedundantBytes=0`` to keep full
lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MIN_REDUNDANT_BYTES_CONF = "spark.trackintel.checkpoint.minRedundantBytes"
RELIABLE_CONF = "spark.trackintel.checkpoint.reliable"
_DEFAULT_MIN_REDUNDANT_BYTES = 1 << 30  # 1 GiB of duplicated leaf scans
_UNKNOWN_SIZE_FLOOR = 1 << 62  # Catalyst's defaultSizeInBytes sentinel range


def redundant_scan_bytes(df: DataFrame) -> tuple[int, int]:
    """(redundant_bytes, leaf_count) for ``df``'s cache-substituted plan.

    ``redundant_bytes`` = sum of leaf size estimates over ALL leaf
    occurrences minus the sum over semantically-distinct leaves: the
    extra input bytes one evaluation re-reads due to duplicated
    lineage. Leaves with unknown statistics (Catalyst's huge default,
    e.g. an already-checkpointed LogicalRDD) count as zero — garbage
    estimates must never force a materialization.

    Leaves are collected from ``withCachedData`` (the analyzed plan
    after cache substitution), not the raw analyzed plan: a lineage
    segment the user persisted shows up here as an ``InMemoryRelation``
    leaf, and re-evaluating a cached segment is a warm block read, not
    redundant input I/O — counting it would charge warm re-scans as
    cold bytes and trigger an unneeded materialization on exactly the
    pipelines (the generate-operator ``ids.py`` caches) that already
    solved their re-scan problem. InMemoryRelation leaves therefore
    count as zero. Size estimates are resolved once per distinct
    semantic hash, so a 700-leaf chain of one duplicated scan costs one
    ``stats()`` round-trip, not 700.
    """
    leaves = df._jdf.queryExecution().withCachedData().collectLeaves()
    n = leaves.size()
    total = 0
    sizes: dict[int, int] = {}
    for i in range(n):
        leaf = leaves.apply(i)
        h = leaf.semanticHash()
        if h not in sizes:
            if leaf.nodeName() == "InMemoryRelation":
                size = 0
            else:
                try:
                    size = int(leaf.stats().sizeInBytes())
                except Exception:
                    size = 0
                if size >= _UNKNOWN_SIZE_FLOOR:
                    size = 0
            sizes[h] = size
        total += sizes[h]
    return total - sum(sizes.values()), n


def truncate_if_rescan_heavy(df: DataFrame) -> DataFrame:
    """Eagerly ``localCheckpoint`` ``df`` when re-evaluating its lineage
    would re-read more than ``spark.trackintel.checkpoint.
    minRedundantBytes`` of duplicated leaf input; otherwise return it
    unchanged. Called by the generate-operators at their input
    boundaries so chained pipelines reset plan growth between stages
    exactly when the re-scans outweigh one materialization.
    """
    if df.isStreaming:
        return df
    try:
        threshold = int(
            df.sparkSession.conf.get(
                MIN_REDUNDANT_BYTES_CONF, str(_DEFAULT_MIN_REDUNDANT_BYTES)
            )
        )
    except ValueError:
        threshold = _DEFAULT_MIN_REDUNDANT_BYTES
    if threshold <= 0:
        return df
    redundant, _ = redundant_scan_bytes(df)
    if redundant > threshold:
        if df.sparkSession.conf.get(RELIABLE_CONF, "false").lower() == "true":
            # executor-loss-tolerant truncation: partitions go to the
            # reliable checkpoint dir (HDFS/S3) instead of executor
            # block storage. Fail loudly when no dir is configured — a
            # silent localCheckpoint fallback would reintroduce the
            # exact failure mode this knob opts out of.
            sc = df.sparkSession.sparkContext
            if sc._jsc.sc().getCheckpointDir().isEmpty():
                raise ValueError(
                    f"{RELIABLE_CONF}=true but no checkpoint directory is "
                    "set; call SparkContext.setCheckpointDir(<hdfs/s3 "
                    "path>) first"
                )
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)
    return df
