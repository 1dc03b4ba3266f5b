"""Aggregation helpers with deterministic, order-independent results.

Double-precision SUM/AVG results depend on accumulation order, which
differs across partition counts, engines, and runs. Worse, *rounding* a
double is itself engine-dependent: Spark's ``round`` goes through the
shortest decimal string (``BigDecimal.valueOf``), DuckDB rounds the
binary value — so two sums 1e-9 apart can round 0.01 apart.

These helpers sidestep both problems: accumulate exactly in DECIMAL,
cast the exact sum to double, and do NOT round. The result is
bit-identical regardless of partitioning or engine. This is also the
right call at 100 TB: a billion-row money sum in double drifts by whole
cents; decimal aggregation in Tungsten is exact and still codegen'd.

Oracle-side equivalents (DuckDB) — see ``queries.tpch.dsum/davg``:

    money_sum:  CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
    stable_avg: CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / count(x)

The per-row double->decimal conversion is deterministic (same IEEE
double in, scale-6 quantization out), so both engines feed identical
exact sums into identical final double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL = "decimal(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money_sum(col: Column | str) -> Column:
    """Order-independent sum of a money-like double column."""
    return F.sum(_c(col).cast(DECIMAL)).cast("double")


def stable_avg(col: Column | str) -> Column:
    """Order-independent average: exact decimal numerator, then one
    double division — bit-identical to the oracle's same formula."""
    c = _c(col)
    return F.sum(c.cast(DECIMAL)).cast("double") / F.count(c)
