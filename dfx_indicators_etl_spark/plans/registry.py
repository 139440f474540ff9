"""Registry of named queries and their DuckDB oracle SQL.

Every operator the engine claims is registered here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an ANSI
SQL string DuckDB runs on the same parquet tables. The driver compares
the two order-insensitively, so queries use the numeric conventions
from ``plans.numeric`` to make Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def decorate(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return decorate
