"""q_market_basket / ind_seasonal_index — direct-model checks (round 8).

The oracle gate already pins both keys against DuckDB on the real
corpus; these tests pin the *math* against hand-computed values on
tiny inputs, where support/lift and seasonal ratios can be checked by
eye.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _basket_pairs(spark, baskets):
    """Run the q_market_basket core on an explicit basket list."""
    rows = [(b, i) for b, items in baskets for i in items]
    tab = spark.createDataFrame(rows, "basket long, item string").distinct()
    n = tab.select(F.count_distinct("basket").alias("n")).collect()[0]["n"]
    a = tab.select("basket", F.col("item").alias("item_a"))
    b = tab.select("basket", F.col("item").alias("item_b"))
    counts = {
        r["item"]: r["c"]
        for r in tab.groupBy("item").agg(F.count("*").alias("c")).collect()
    }
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_both"))
        .collect()
    )
    return n, counts, {(r["item_a"], r["item_b"]): r["n_both"] for r in pairs}


def test_basket_support_lift_math(spark):
    """Hand-checkable co-occurrence: x,y always together (lift > 1),
    x,z never (absent), y,w independent-ish."""
    baskets = [
        (1, ["x", "y"]),
        (2, ["x", "y", "w"]),
        (3, ["z", "w"]),
        (4, ["x", "y"]),
    ]
    n, counts, pairs = _basket_pairs(spark, baskets)
    assert n == 4 and counts["x"] == 3 and counts["w"] == 2
    assert pairs[("x", "y")] == 3
    assert ("x", "z") not in pairs
    # lift(x,y) = n_both·n / (n_x·n_y) = 3·4/(3·3) = 4/3
    assert abs(pairs[("x", "y")] * n / (counts["x"] * counts["y"]) - 4 / 3) < 1e-12


def test_seasonal_index_math(spark):
    """Two series with planted weekly shape: the operator's dow means /
    grand mean reproduce the planted ratios exactly. Uses the
    registered key's logic on a synthetic events frame via the same
    column contract."""
    from dfx_indicators_etl_spark.plans.indicator_queries import (
        ind_seasonal_index,
    )

    # Monkeypatch-free: build a parquet dir shaped like the testdata.
    import tempfile

    rows = []
    # series A: Mondays worth 2.0, every other day 1.0 (4 weeks of Jan 2024)
    eid = 0
    for day in range(1, 29):
        ts = datetime(2024, 1, day, 12, 0, 0)
        val = 2.0 if ts.isoweekday() == 1 else 1.0
        rows.append((eid, ts, 1, "A", val, ""))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {
            r["dow"]: (r["n_obs"], r["seasonal_index"])
            for r in ind_seasonal_index(spark, d).collect()
        }
    # 28 days = 4 of each dow; grand mean = (4·2 + 24·1)/28 = 8/7
    grand = 8 / 7
    assert out[1][0] == 4 and abs(out[1][1] - round(2.0 / grand, 6)) < 1e-9
    assert all(abs(out[d][1] - round(1.0 / grand, 6)) < 1e-9 for d in range(2, 8))
