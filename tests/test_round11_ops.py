"""Round-11 operators: the hot-group bound for per-group cumulative
stages (VERDICT r10 #3) — ``grouped_running_sum`` and its consumers
``weighted_percentiles`` / ``histogram_percentiles`` pinned
bit-identical on the window path and the range-partition offsets path.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def _grouped_frame(spark):
    """One HOT group (200 distinct values — straddles many range
    partitions at local[32]), one NULL group key large enough to
    straddle too, and two small single-partition groups, with exact
    decimal weights."""
    rows = []
    for i in range(200):
        rows.append(("hot", i, Decimal(f"{(i * 13) % 97}.{i % 100:02d}")))
    for i in range(80):
        rows.append((None, i, Decimal(f"{(i * 7) % 31}.{i % 100:02d}")))
    for g, n in [("a", 3), ("b", 5)]:
        for i in range(n):
            rows.append((g, i, Decimal(f"{i}.5000")))
    return spark.createDataFrame(
        rows, "g string, v long, d decimal(18,4)"
    )


def test_grouped_running_sum_matches_partitioned_window(spark):
    """Offsets path == partitioned window path for int counts and
    exact decimals, hot + NULL-key straddler groups included."""
    from pyspark.sql import Window

    from dfx_indicators_etl_spark.operators.scale import grouped_running_sum

    df = _grouped_frame(spark)
    order = [F.col("v").asc()]
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for col in ["v", "d"]:
        want = {
            (r["g"], r["v"]): r["cum"]
            for r in df.withColumn("cum", F.sum(col).over(w)).collect()
        }
        got = {
            (r["g"], r["v"]): r["cum"]
            for r in grouped_running_sum(
                df.repartition(7),
                ["g"],
                col,
                order,
                "cum",
                small_rows_threshold=0,
            ).collect()
        }
        assert got == want, col
        # and the small path is the window verbatim
        small = {
            (r["g"], r["v"]): r["cum"]
            for r in grouped_running_sum(
                df, ["g"], col, order, "cum"
            ).collect()
        }
        assert small == want, col


def test_grouped_running_sum_empty_groups_delegates_global(spark):
    """group_cols=[] must route through global_running_sum (no
    unpartitioned window on the large path)."""
    from pyspark.sql import Window

    from dfx_indicators_etl_spark.operators.scale import grouped_running_sum

    df = spark.createDataFrame(
        [(i, (i * 3) % 7) for i in range(40)], "id long, v long"
    )
    w = Window.orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in grouped_running_sum(
            df, [], "v", [F.col("id")], "cum", small_rows_threshold=0
        ).collect()
    }
    assert got == want


def test_weighted_percentiles_both_paths_identical(spark):
    """The registered weighted-percentile shape (integer×decimal rank
    conditions) is bit-identical whether the cumulative stage ran the
    partitioned window or the offsets algebra."""
    from dfx_indicators_etl_spark.operators.scale import weighted_percentiles

    df = _grouped_frame(spark).withColumn(
        "wgt", F.col("d") + Decimal("0.0001")
    )
    probs = {"p25": (1, 4), "p50": (1, 2), "p90": (9, 10)}
    small = weighted_percentiles(
        df, ["g"], "v", "wgt", probs, total_col="tot"
    ).collect()
    large = weighted_percentiles(
        df, ["g"], "v", "wgt", probs, total_col="tot",
        hist_window_max_rows=0,
    ).collect()
    key = lambda r: (r["g"] is None, r["g"])  # noqa: E731
    assert sorted(
        [tuple(r) for r in small], key=lambda t: (t[0] is None, t)
    ) == sorted([tuple(r) for r in large], key=lambda t: (t[0] is None, t))
    assert len(small) == 4


def test_histogram_percentiles_both_paths_identical(spark):
    """The interpolated-percentile picker shares the hot-group bound:
    grouped flavor pinned identical on both cumulative paths."""
    from dfx_indicators_etl_spark.operators.scale import (
        histogram_percentiles,
    )

    df = _grouped_frame(spark)
    probs = {"p50": 0.5, "p95": 0.95}
    small = {
        r["g"]: (r["p50"], r["p95"])
        for r in histogram_percentiles(df, ["g"], "v", probs).collect()
    }
    large = {
        r["g"]: (r["p50"], r["p95"])
        for r in histogram_percentiles(
            df, ["g"], "v", probs, hist_window_max_rows=0
        ).collect()
    }
    assert small == large
    assert len(small) == 4
