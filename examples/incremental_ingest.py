"""Nightly incremental ingestion: dedup a daily shard against history.

At 100 TB the corpus is never re-deduplicated from scratch — history
lives as a COMPACT digest index (~40 B/doc, bucketed on the digest so
the nightly join plans with zero exchange on the index side), and each
day only the new shard is checked:

    day 0   accept the seed corpus, build + persist the index
    day N   exact-check the shard against the index (and itself),
            near-dup-check the survivors against the banded-signature
            index, fold what was accepted back in

This walkthrough runs three "days" over the driver's documents parquet
and prints, per day, the accept/reject split plus the digest-exchange
count of the exact check — proving the history side never reshuffles:

    python examples/incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from trackintel_spark import get_spark
from trackintel_spark.plans.partitioning import write_bucketed
from trackintel_spark.scale import (
    build_exact_index,
    build_neardup_index,
    dedup_against_index,
    merge_neardup_index,
    neardup_against_index,
)
from trackintel_spark.sources import load_table

INDEX_TABLE = "corpus_digest_index"


def _digest_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning(digest"), plan.count(
        "Exchange hashpartitioning(__digest"
    )


def _shard(docs, day: int):
    """Synthetic day-``day`` shard: a third of the seed re-arrives
    verbatim, a third arrives revised once per day (new text every
    day), a third re-sends YESTERDAY's revision (dup of day-1)."""
    return docs.select(
        (F.col("doc_id") + 100_000 * day).alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.col("text"), F.lit(f" [rev day {day}]")),
        )
        .otherwise(F.concat(F.col("text"), F.lit(f" [rev day {max(day - 1, 1)}]")))
        .alias("text"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    warehouse = tempfile.mkdtemp(prefix="ti_ingest_")
    spark = get_spark(
        app_name="incremental_ingest",
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- day 0: accept the seed corpus, persist both indexes
    write_bucketed(build_exact_index(docs), INDEX_TABLE, ("digest",), num_buckets=8)
    near_index = build_neardup_index(docs).persist()
    print(f"day 0: accepted {docs.count()} seed docs; "
          f"index rows {spark.table(INDEX_TABLE).count()}")

    for day in (1, 2):
        shard = _shard(docs, day)
        index = spark.table(INDEX_TABLE)

        # exact gate: history dups + within-shard dups in one pass
        verdicts = dedup_against_index(shard, index).persist()
        exact_new = verdicts.filter("is_new").select("doc_id", "text")
        n_exact_dup = verdicts.filter("NOT is_new").count()

        # near-dup gate on the exact survivors (signatures vs history)
        near = neardup_against_index(exact_new, near_index, threshold=0.9).persist()
        accepted = near.filter("is_new").select("doc_id", "text").persist()
        n_near_dup = near.filter("NOT is_new").count()
        n_accepted = accepted.count()
        print(
            f"day {day}: shard {shard.count()} -> exact dups {n_exact_dup}, "
            f"near dups {n_near_dup}, accepted {n_accepted}"
        )

        # the plan property that makes this nightly-cheap: scanning the
        # bucketed index never feeds a digest exchange — only the shard
        # (and its within-shard census) shuffles
        dig, tmp = _digest_exchanges(dedup_against_index(shard, index))
        print(f"        digest exchanges in the exact check: {dig + tmp} "
              f"(shard side only; 'Bucketed: true' on the index scan)")

        # fold the accepted docs back in for tomorrow. Accepted digests
        # are DISJOINT from the index by construction (they passed the
        # exact gate), so the nightly fold-back is an APPEND into the
        # bucketed table — no rewrite of the history-sized index.
        # (merge_exact_index is the rebuild/compaction form — use it
        # when re-deriving the index from raw accepted corpora.)
        build_exact_index(accepted).write.mode("append").format("parquet").bucketBy(
            8, "digest"
        ).saveAsTable(INDEX_TABLE)
        near_index = merge_neardup_index(near_index, build_neardup_index(accepted)).persist()
        verdicts.unpersist(); near.unpersist()

    # idempotence: replaying day 2 through BOTH gates accepts nothing
    # (exact-gate survivors that the near gate rejected are not in the
    # exact index — the replay must apply the same full gate chain)
    re_exact = dedup_against_index(_shard(docs, 2), spark.table(INDEX_TABLE))
    re_near = neardup_against_index(
        re_exact.filter("is_new").select("doc_id", "text"), near_index, threshold=0.9
    )
    print(f"replay day 2: newly accepted {re_near.filter('is_new').count()} (expect 0)")
    spark.stop()


if __name__ == "__main__":
    main()
