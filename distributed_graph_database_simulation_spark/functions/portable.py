"""Column helpers whose results are bit-identical between Spark and DuckDB.

The driver's correctness gate hashes query output values (order-insensitive)
from both engines. Floating-point aggregation is association-order-dependent,
so any ``SUM(double)`` can differ in ulps between engines/runs. The fix used
throughout this repo: cast inputs to DECIMAL before aggregating (exact
arithmetic, order-independent), cast the exact result back to DOUBLE at the
end (a deterministic nearest-double conversion both engines share).

DECIMAL(12,4) is chosen so products stay inside exact ranges in BOTH engines:
- Spark:  d(12,4) x d(12,4) -> d(25,8);  d(25,8) x d(12,4) -> d(38,12) — no
  precision loss (Spark truncates scale only past precision 38).
- DuckDB: D(12,4) x D(12,4) -> D(24,8);  D(24,8) x D(12,4) -> D(36,12).
Source money columns are 2-decimal doubles well under 1e8, so the casts are
exact and sums of ~1e6 rows fit comfortably.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,4)"


def dec(col: str | Column) -> Column:
    """Exact fixed-point view of a money/measure column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent SUM: decimal-exact, surfaced as DOUBLE."""
    return F.sum(dec(col)).cast("double").alias(alias)


def dsum_expr(expr: Column, alias: str) -> Column:
    """Like :func:`dsum` for an already-decimal product expression.

    Product decimals carry scale 8-12, so a sum's unscaled value can exceed
    2^53 — there the decimal->double conversion is no longer guaranteed to
    round identically across engines (observed: 1-ulp drift on scale-12
    sums). Rounding the exact sum to scale 6 first puts the unscaled value
    back under 2^53, making the conversion exact in both engines. Oracles
    must apply the same ROUND(SUM(...), 6).
    """
    return F.round(F.sum(expr), 6).cast("double").alias(alias)
