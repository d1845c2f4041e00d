"""Determinism helpers for oracle-tier queries (SURVEY.md §2.0 rules).

The driver compares Spark vs DuckDB by order-insensitive value-hash, so
float aggregates must be bit-identical. Conventions:

- Money sums: aggregate in DECIMAL(18,2)/(18,4) (exact, order-independent),
  cast the final value to DOUBLE (deterministic conversion both engines).
- Averages: exact decimal sum cast to double, divided by the count — never
  the engines' native double `avg` (summation order differs).
- Statistics / similarities: computed in double then rounded (4 or 6 digits)
  as the final projection on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def dec2(c) -> Column:
    """Cast a money column to exact DECIMAL(18,2)."""
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def money_sum(c, alias: str) -> Column:
    """Exact, order-independent sum of a 2-decimal money column → DOUBLE."""
    return F.sum(dec2(c)).cast("double").alias(alias)


def money_avg(c, alias: str) -> Column:
    """Exact-sum / count average of a money column → DOUBLE."""
    return (F.sum(dec2(c)).cast("double") / F.count(F.lit(1))).alias(alias)


# DuckDB-side SQL fragments mirroring the helpers above.
def sql_money_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def sql_money_avg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS {alias}"


# ---------------------------------------------------------------------------
# Fast path: fixed-point integer cents.
#
# Spark decimal products above precision 18 leave the long-backed fast path
# (per-row allocation); measured 4× slower than double math on the flagship.
# For 2-decimal money, round(x*100) → LONG is EXACT: the true value is a
# multiple of 0.01, its double is ~1e-10 from k/100, so x*100+0.5 never sits
# near the floor boundary — floor(x*100+0.5) == the decimal(18,2) cast in
# cents (verified bit-identical vs the decimal path on all fixtures).
#
# Integer sums/products are pure codegen long arithmetic. Dividing the final
# long by 100.0 yields the same double as decimal→double, so DuckDB oracles
# keep the DECIMAL formulation unchanged.
#
# Overflow bound: a charge-style product is ≤ ~4e11 per row; long overflows
# at 9.2e18 → safe to ~2e7 rows per group. Beyond that (full 100 TB groups)
# wrap the product in cast("decimal(28,0)") before summing — products stay
# integer, only the accumulator widens.
# ---------------------------------------------------------------------------


def cents(c) -> Column:
    """Exact integer cents of a 2-decimal money column (LONG)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * 100 + F.lit(0.5))


def money_sum_fast(c, alias: str) -> Column:
    """sum in integer cents → DOUBLE; ≡ money_sum bit-for-bit."""
    return (F.sum(cents(c)) / 100.0).alias(alias)


def money_avg_fast(c, alias: str) -> Column:
    """exact-sum / count in integer cents → DOUBLE; ≡ money_avg."""
    return ((F.sum(cents(c)) / 100.0) / F.count(F.lit(1))).alias(alias)
