"""Registry of named queries and their DuckDB oracle SQL.

Every operator the engine claims is registered here as a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an ANSI
SQL string DuckDB runs on the same parquet tables. The driver compares
the two order-insensitively, so queries use the numeric conventions
from ``plans.numeric`` to make Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_session_confs

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    The registered callable first pins the engine's runtime confs
    (nanosAsLong, ANSI off, UTC — see ``session.RUNTIME_CONFS``) on the
    session it is handed, so every query is correct on a stock default
    session, not just on ``get_spark()``'s.
    """

    def decorate(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return decorate
