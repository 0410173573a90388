"""Temporal scalar expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duration_s(started_at: Column, finished_at: Column) -> Column:
    """Span duration in (fractional) seconds.

    Computed from exact integer microseconds: casting each timestamp to
    double first (~1.7e9 s) and subtracting loses up to ~0.5 us to
    cancellation, which is visible in derived quantities like speeds.
    """
    return (F.unix_micros(finished_at) - F.unix_micros(started_at)) / F.lit(1e6)


def temp_overlap_ratio(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """Ratio of span-1 that is overlapped by span-2; 0 when span-1 has
    non-positive duration.

    Reference: calc_temp_overlap (preprocessing/util.py:12-44).
    """
    overlap = F.greatest(
        F.lit(0.0),
        F.least(e1.cast("double"), e2.cast("double")) - F.greatest(s1.cast("double"), s2.cast("double")),
    )
    dur = e1.cast("double") - s1.cast("double")
    return F.when(dur > 0, overlap / dur).otherwise(F.lit(0.0))
