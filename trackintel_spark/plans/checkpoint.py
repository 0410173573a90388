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

A second, scale-INDEPENDENT trigger guards plan size itself (r13):
when the input's analyzed plan already carries more than
``spark.trackintel.checkpoint.maxLeafOccurrences`` leaf references
(default 64), the consuming operator's 2-8x input embedding would
multiply an already-multiplied plan — geometric growth in plan nodes,
and analysis/optimization cost is paid per submission on the DRIVER
regardless of data volume (guide §3.3/§7.3). Cutting at that point
bounds plan growth to a constant factor per operator generation.

The default is deliberately ABOVE the composed bench pipelines
(tours sees 8 leaf references at its trips boundary): an r13 A/B at
sf0.1 measured warm generate_tours cells of 2.6-3.0 s with full
lineage vs 5.5-6.5 s with the boundary truncated — the checkpoint
gives every run a fresh LogicalRDD identity, which defeats Spark's
cache substitution of the persisted trip/kernel intermediates and
re-executes them, costing far more than the plan analysis it saves.
The 15.5k-line rendered tours plan is dominated by the explain
renderer re-printing 4 shared ``InMemoryRelation`` subtrees at every
reference (339 prints); the executed top-level plan is ~290 nodes,
so per-submission planning cost is bounded. The trigger therefore
exists for genuinely unbounded compositions (5+ chained operators
with no persisted intermediates) where leaf fan-out grows
geometrically past this bound.

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
MAX_LEAF_OCCURRENCES_CONF = "spark.trackintel.checkpoint.maxLeafOccurrences"
RELIABLE_CONF = "spark.trackintel.checkpoint.reliable"
_DEFAULT_MIN_REDUNDANT_BYTES = 1 << 30  # 1 GiB of duplicated leaf scans
_DEFAULT_MAX_LEAF_OCCURRENCES = 64  # leaf references before plan-size truncation
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
    minRedundantBytes`` of duplicated leaf input, OR when its analyzed
    plan already carries more than ``spark.trackintel.checkpoint.
    maxLeafOccurrences`` leaf references (plan-size protection — driver
    analysis cost is per-submission and scale-independent, see the
    inline comment); otherwise return it unchanged. Called by the
    generate-operators at their input boundaries so chained pipelines
    reset plan growth between stages. ``minRedundantBytes <= 0`` is the
    master off-switch for both triggers; ``maxLeafOccurrences <= 0``
    disables only the complexity trigger.
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
    if redundant <= threshold:
        # Plan-COMPLEXITY trigger (r13, VERDICT r12 #4 / guide §3.3,
        # §7.3): a persisted input substitutes to ONE InMemoryRelation
        # in withCachedData, so its redundant bytes read zero even when
        # downstream embedding multiplies the analyzed plan; and plan
        # analysis cost is paid per SUBMISSION, independent of data
        # volume. When the input's analyzed plan already references
        # more than maxLeafOccurrences leaves (pre-cache-substitution
        # occurrences — caching does not reduce planning cost), another
        # operator generation can only multiply that geometrically, so
        # the lineage is cut here. The default sits ABOVE the bench
        # pipelines on purpose — see the module docstring for the r13
        # A/B that showed boundary truncation defeating cache reuse of
        # persisted intermediates. ``<= 0`` disables the trigger.
        try:
            max_occ = int(
                df.sparkSession.conf.get(
                    MAX_LEAF_OCCURRENCES_CONF, str(_DEFAULT_MAX_LEAF_OCCURRENCES)
                )
            )
        except ValueError:
            max_occ = _DEFAULT_MAX_LEAF_OCCURRENCES
        if max_occ <= 0:
            return df
        n_occurrences = df._jdf.queryExecution().analyzed().collectLeaves().size()
        if n_occurrences <= max_occ:
            return df
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
