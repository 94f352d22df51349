"""Cross-engine determinism helpers.

The driver hash-compares Spark results with a DuckDB oracle, so every
floating-point aggregate must be *order-independent* and *engine-independent*:

- Money-like doubles (2-decimal generated) are cast to DECIMAL(18,2) before
  SUM — exact arithmetic, immune to partial-aggregation order. The exact sum
  is cast back to DOUBLE (exact while |x| < 2^53).
- Averages divide the exact sum by the count in DOUBLE (IEEE division is
  deterministic and identical across engines), then ROUND — both engines
  round doubles half-away-from-zero (verified empirically).
- Raw double SUM/AVG never appears in a query that has an oracle.

At cluster scale the decimal cast is also the *correct* choice for money
(no drift across 10^9-row partial sums), not just a parity trick.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def money_sum(c: str | Column) -> Column:
    """Order-independent exact sum of a 2-decimal double column."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast("double")


def money_avg(c: str | Column, scale: int = 4) -> Column:
    """Exact-sum / count in double, rounded; deterministic across engines."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(col.cast(DEC)).cast("double") / F.count(col), scale)


def sql_money_sum(c: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_money_avg(c: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({c}), {scale})"
