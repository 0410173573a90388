"""Shared batch-parity shim for the stateful streaming kernels.

Every stateful operator in this package (staypoints, triplegs, trips,
tours, locations, near-dup) is written as ONE ``(key, batches, state)``
kernel and exposed through a unified API that accepts a streaming OR a
batch DataFrame. The streaming path is ``applyInPandasWithState``; the
batch path drives the SAME kernel through ``applyInPandas`` with a
trivial never-existing state (batch mode sees each group exactly once,
so state carry-over is vacuous). Routing both through this helper keeps
the batch == stream guarantee a property of ONE code path instead of
six hand-copied shims.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout


class _FakeState:
    """In-memory ``GroupState`` stand-in for the batch path: never
    exists, accepts one update. (``get`` is an attribute-style method
    rather than the real property — the kernels only touch it behind an
    ``exists`` check, which is always False here.)"""

    exists = False
    hasTimedOut = False

    def get(self):  # pragma: no cover - interface parity
        raise ValueError

    def update(self, v):
        self._v = v

    def remove(self):  # pragma: no cover - interface parity
        self._v = None

    def setTimeoutDuration(self, ms):
        # batch mode sees each group once; a TTL is vacuous
        pass


def apply_with_batch_parity(
    df: DataFrame,
    key_cols: tuple[str, ...],
    fn: Callable[[Tuple[Any, ...], Iterator[pd.DataFrame], Any], Iterator[pd.DataFrame]],
    out_schema: T.StructType,
    state_schema: T.StructType,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Run a stateful kernel on ``df`` grouped by ``key_cols`` —
    ``applyInPandasWithState`` (append mode) when ``df`` is streaming,
    the same kernel via ``applyInPandas`` + :class:`_FakeState` when it
    is a batch frame. All current keys are integral columns; the batch
    key is coerced to python ints to match the streaming runtime's key
    tuples. Kernels that opt into a ``timeout`` other than ``NoTimeout``
    must handle ``state.hasTimedOut`` themselves (batch mode never times
    out)."""
    grouped = df.groupBy(*key_cols)
    if df.isStreaming:
        return grouped.applyInPandasWithState(
            fn, out_schema, state_schema, "append", timeout
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        key = tuple(int(pdf[c].iloc[0]) for c in key_cols)
        frames = list(fn(key, iter([pdf]), _FakeState()))
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )
        )

    return grouped.applyInPandas(batch_fn, schema=out_schema)
