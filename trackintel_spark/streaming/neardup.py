"""Streaming NEAR-duplicate detection — online MinHash-LSH.

The online counterpart of :func:`trackintel_spark.scale.minhash_lsh_candidates`
for ingest-time filtering of a live crawl: each arriving document's
MinHash signature (computed as one per-row expression —
:func:`trackintel_spark.scale.dedup.minhash_signature_expr`, identical
values to the batch path) is banded, and a stateful operator keyed by
(band, bucket-hash) remembers which documents have hit each bucket.
A document colliding with an earlier one in ANY band is a near-dup
candidate; with ``threshold`` set, the full signatures are compared
and only estimated-Jaccard >= threshold matches count (the batch
verify step, folded into the same operator).

Output is one verdict row PER (document, band): ``(doc_id, band,
dup_of, jaccard_est)`` with ``dup_of`` NULL when the band saw no
qualifying earlier document. Reduce to per-document decisions with
:func:`resolve_neardup` (a batch aggregation — run it on the sink
table, or in-stream with a watermark if event time is available).

100 TB design: the stream shuffles (bands x one row of id+signature)
per document — never the text. State per (band, bucket) is the id +
signature list of documents seen there, capped at ``max_bucket``
entries: a boilerplate bucket hit by millions of near-identical
documents stops growing after the cap (new arrivals still match
against the stored sample — exactly the right behavior for a
saturated bucket; the cap is the documented bounded-state trade-off,
like ``dedup_stream``'s watermark). Within a micro-batch, documents
are processed in ascending ``id_col`` order, so stream == batch for
any chunking (pinned in tests/test_streaming_neardup.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from trackintel_spark.scale.dedup import minhash_signature_expr

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("jaccard_est", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.LongType())),  # flattened
    ]
)


def neardup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float | None = None,
    max_bucket: int = 1024,
) -> DataFrame:
    """Per-band near-dup verdicts for a document stream (or batch —
    unified API, same kernel). ``threshold=None`` counts ANY bucket
    collision (pure LSH); with a threshold, signature agreement must
    reach it. ``dup_of`` is the smallest qualifying earlier id."""
    if not 0 < bands <= num_perm:
        raise ValueError(f"bands must be in (0, num_perm={num_perm}], got {bands}")
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows = num_perm // bands

    sig = minhash_signature_expr(F.col(text_col), num_perm, shingle_n)
    base = docs.select(F.col(id_col).alias("doc_id"), sig.alias("__sig")).filter(
        F.col("__sig").isNotNull()
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    F.concat_ws(
                        "|", *[F.element_at("__sig", b * rows + r + 1) for r in range(rows)]
                    ),
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = base.select(
        "doc_id", "__sig", F.explode(band_structs).alias("__b")
    ).select(
        "doc_id", "__sig", F.col("__b.band").alias("band"), F.col("__b.bucket").alias("bucket")
    )

    np_ = num_perm
    thr = threshold

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        band, _bucket = key
        idbuf = np.empty(max_bucket, dtype=np.int64)
        sigbuf = np.empty((max_bucket, np_), dtype=np.int64)
        if state.exists:
            ids_l, sigs_l = state.get
            count = len(ids_l)
            idbuf[:count] = ids_l
            sigbuf[:count] = np.asarray(sigs_l, dtype=np.int64).reshape(count, np_)
        else:
            count = 0

        pdf = pd.concat(list(batches), ignore_index=True).sort_values(
            "doc_id", kind="stable"
        )
        out = []
        for doc_id, sig_arr in zip(pdf["doc_id"], pdf["__sig"]):
            s = np.asarray(list(sig_arr), dtype=np.int64)
            dup_of, best_est = None, None
            if count:
                # one vectorized signature-agreement pass over the bucket
                est = (sigbuf[:count] == s).mean(axis=1)
                ok = est >= thr if thr is not None else np.ones(count, dtype=bool)
                if ok.any():
                    cand_ids = idbuf[:count][ok]
                    j = int(np.argmin(cand_ids))
                    dup_of = int(cand_ids[j])
                    best_est = float(est[:count][ok][j])
            out.append((int(doc_id), int(band), dup_of, best_est))
            if count < max_bucket:
                idbuf[count] = int(doc_id)
                sigbuf[count] = s
                count += 1

        state.update(
            ([int(v) for v in idbuf[:count]], [int(v) for v in sigbuf[:count].reshape(-1)])
        )
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "band", "dup_of", "jaccard_est"])

    grouped = banded.groupBy("band", "bucket")
    if banded.isStreaming:
        return grouped.applyInPandasWithState(
            fn, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )

    class _FakeState:
        exists = False

        def get(self):  # pragma: no cover - interface parity
            raise ValueError

        def update(self, v):
            self._v = v

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        st = _FakeState()
        frames = list(
            fn((int(pdf["band"].iloc[0]), int(pdf["bucket"].iloc[0])), iter([pdf]), st)
        )
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame({f.name: pd.Series(dtype="object") for f in _OUT_SCHEMA.fields})
        )

    return grouped.applyInPandas(batch_fn, schema=_OUT_SCHEMA)


def resolve_neardup(verdicts: DataFrame) -> DataFrame:
    """Reduce per-band verdicts to per-document decisions: ``(doc_id,
    is_dup, dup_of, jaccard_est)`` — ``dup_of`` the smallest earlier
    document any band matched, with that match's similarity estimate.
    A batch aggregation (run on the sink table)."""
    matched = F.when(
        F.col("dup_of").isNotNull(), F.struct("dup_of", "jaccard_est")
    )  # NULL structs are ignored by min; a no-match band never wins
    return (
        verdicts.groupBy("doc_id")
        .agg(F.min(matched).alias("__m"))
        .select(
            "doc_id",
            F.col("__m").isNotNull().alias("is_dup"),
            F.col("__m.dup_of").alias("dup_of"),
            F.col("__m.jaccard_est").alias("jaccard_est"),
        )
    )
