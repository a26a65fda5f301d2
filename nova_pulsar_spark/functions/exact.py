"""Cross-engine-exact aggregation idioms.

Two interchangeable renditions of "sum doubles reproducibly":

- **long-cents** (:func:`sum_cents` / :func:`sql_sum_cents`): scale
  each row value to an integer (the data is fixed-point: 2-decimal
  money, ≤6-decimal derived products), sum as int64, divide once.
  ~3× faster than decimal aggregation (primitive codegen path) and
  bit-identical across engines/partitionings. Overflow bound:
  |sum| < 2^63 / scale — fine through petabyte scale factors for
  these schemas; beyond that use the decimal rendition.
- **decimal** (used inline elsewhere): cast row values to DECIMAL,
  sum exactly, cast back. No practical overflow, ~3× slower.

Both rely on the row-level double expression being IEEE-deterministic
(same parse tree both engines) so the scaled value rounds to the same
integer everywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def sum_cents(col: F.Column, scale: int) -> F.Column:
    """Exact sum of a fixed-point double column: Σ round(x·scale) / scale."""
    return F.sum(F.round(col * scale, 0).cast("long")).cast("double") / scale


def sql_sum_cents(expr: str, scale: int) -> str:
    """DuckDB twin of :func:`sum_cents` (identical arithmetic)."""
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}, 0) AS BIGINT)) AS DOUBLE) / {scale}"
