"""SQL literal rendering helpers.

Numeric thresholds interpolated into generated Spark SQL must render as
typed DOUBLE literals (``1800.0D``), not bare decimals (``1800.0``):

- a bare decimal parses as DECIMAL(p, s); comparisons against double
  columns still promote to double, so results are identical today, but
  the promotion is an implicit cast in every generated predicate and
  the literal's type silently depends on the value's textual width;
- a non-finite float renders as ``inf``/``nan`` which is not valid SQL
  at all — better a typed Python error at build time than an opaque
  parse error from the SQL compiler.

``repr(float(x))`` round-trips every finite double exactly (shortest
repr is re-parse-exact since Python 3.1), so the rendered literal is
bit-equal to the Python value.
"""

from __future__ import annotations

import math


def sql_double(x: float) -> str:
    """Render ``x`` as a typed Spark SQL DOUBLE literal (``repr(x) + 'D'``).

    Raises ``ValueError`` for non-finite values, which would otherwise
    render as unparseable SQL (``infD``).
    """
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"non-finite value cannot be rendered as a SQL literal: {x!r}")
    return repr(v) + "D"
