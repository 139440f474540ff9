"""Numeric conventions shared by Spark queries and DuckDB oracles.

Floating-point SUM is order-dependent, so a distributed Spark sum and a
single-threaded DuckDB sum over the same doubles can differ in the last
ulp and break value-hash comparison. The engine therefore:

- casts measures to ``DECIMAL(18,4)`` *before* aggregation (the
  double→decimal rounding is deterministic and identical across
  engines away from exact half-way ties, which binary doubles
  essentially never hit), so sums are exact decimal arithmetic;
- casts final outputs to DOUBLE/BIGINT with stable aliases so the
  schema compare sees identical names and types;
- computes averages as ``CAST(sum_dec AS DOUBLE) / count`` — identical
  IEEE division on identical inputs.

This costs nothing at scale: decimal partial aggregation is still
map-side combinable and whole-stage-codegen'd.

One hazard (hit by ind_outlier_flags, round 7): never re-cast a
``davg`` quotient back to decimal. sum(scale-4)/count quotients
routinely land EXACTLY on scale-4 half-way ties (e.g. 98.5642/4 =
24.64105), where Spark's BigDecimal HALF_UP on the double's exact
binary expansion and DuckDB's scaled-multiply rounding can disagree
by one last digit. If a second aggregation level is needed, carry the
measure as DECIMAL end-to-end (sum the decimal sums) and divide to
double only once, at the final output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec", "dsum", "davg", "dcount"]

DECIMAL = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    """Measure cast for exact aggregation (decimal(18,4))."""
    col = F.col(col) if isinstance(col, str) else col
    return col.cast(DECIMAL)


def dsum(col: Column | str, alias: str) -> Column:
    """Exact decimal sum, emitted as double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """sum(decimal)/count as double — bit-identical to the oracle."""
    col = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(col)).cast("double") / F.count(col)).alias(alias)


def dcount(alias: str, col: Column | str | None = None) -> Column:
    """COUNT(*) (or COUNT(col)) as bigint."""
    target = F.lit(1) if col is None else (F.col(col) if isinstance(col, str) else col)
    return F.count(target).cast("bigint").alias(alias)
