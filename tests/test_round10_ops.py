"""Round-10 operators: the three runtime-adaptive scale swaps landed
in code (VERDICT r9 #2 — q_skyline / q_time_to_convert /
ind_outlier_mad), the global_running_max primitive behind the skyline
sweep, and histogram_percentiles' global (empty-groups) flavor.

Every adaptive picker is pinned BIT-IDENTICAL across its exact and
distributed paths, and every large path's plan is asserted free of
the scale hazard it exists to remove (SinglePartition window exchange
/ exact-percentile aggregate)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()), key=repr)


def test_global_running_max_matches_window(spark):
    """Two-phase exclusive running max == the unpartitioned window on
    random data with duplicate values and a tie-break column — for any
    partitioning of the input."""
    from dfx_indicators_etl_spark.operators.scale import global_running_max

    rng = random.Random(7)
    data = [(i, rng.randint(0, 40)) for i in range(997)]
    df = spark.createDataFrame(data, "k bigint, v bigint").repartition(16)
    order = [F.col("k").asc()]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    expect = _rows(df.withColumn("pm", F.max("v").over(w)))
    got = _rows(
        global_running_max(df, "v", order, "pm", small_rows_threshold=0)
    )
    assert got == expect
    # small path is the window itself
    small = _rows(global_running_max(df, "v", order, "pm"))
    assert small == expect


def test_global_running_max_first_row_null_and_desc_order(spark):
    from dfx_indicators_etl_spark.operators.scale import global_running_max

    df = spark.createDataFrame(
        [(3, 10), (2, 99), (1, 5)], "k bigint, v bigint"
    )
    out = {
        r["k"]: r["pm"]
        for r in global_running_max(
            df, "v", [F.col("k").desc()], "pm", small_rows_threshold=0
        ).collect()
    }
    # ordered k desc: 3 (first -> NULL), 2 (max{10}=10), 1 (max{10,99})
    assert out == {3: None, 2: 10, 1: 99}


def test_histogram_percentiles_global_flavor_bit_identical(spark):
    """Empty group_cols (one global percentile row) must reproduce
    exact F.percentile bit-for-bit, on both global_running_sum paths
    of its cumulative count."""
    from dfx_indicators_etl_spark.operators.scale import (
        histogram_percentiles,
    )

    rng = random.Random(11)
    vals = [round(rng.uniform(0, 1000), 2) for _ in range(1003)]
    df = spark.createDataFrame(
        [(v,) for v in vals], "x double"
    ).repartition(8)
    expect = df.agg(
        F.percentile("x", F.lit(0.5)).alias("p50"),
        F.percentile("x", F.lit(0.9)).alias("p90"),
    ).collect()[0]
    got = histogram_percentiles(
        df, [], "x", {"p50": 0.5, "p90": 0.9}
    ).collect()[0]
    assert (got["p50"], got["p90"]) == (expect["p50"], expect["p90"])


def test_skyline_adaptive_paths_identical(spark, sf_dir):
    """Forcing the global_running_max path yields BIT-IDENTICAL
    skylines to the window sweep, and its plan has no single-task
    sort (SinglePartition exchange)."""
    from dfx_indicators_etl_spark.plans.analytics_ext import (
        _revenue,  # noqa: F401  (same module convention as abc test)
        _skyline_from_pts,
        dec,
    )
    from dfx_indicators_etl_spark.sources import read_tables

    lineitem, supplier = read_tables(spark, sf_dir, "lineitem", "supplier")
    pts = (
        lineitem.join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(
            F.sum(dec("l_extendedprice")).alias("rev"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )
    small = _skyline_from_pts(pts)  # default: under threshold, window
    large = _skyline_from_pts(pts, window_max_rows=0)
    assert _rows(small) == _rows(large)
    large_plan = large._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in large_plan


def test_time_to_convert_adaptive_paths_identical(spark):
    """Forcing the histogram_percentiles path yields BIT-IDENTICAL
    funnel-velocity stats to the exact F.percentile aggregate, and its
    plan carries no exact-percentile aggregate."""
    from dfx_indicators_etl_spark.plans.analytics_ext import (
        _time_to_convert_stats,
    )

    rng = random.Random(23)
    lat = spark.createDataFrame(
        [(rng.randint(0, 86400),) for _ in range(1001)],
        "latency_s bigint",
    ).repartition(8)
    n_viewers = spark.createDataFrame([(5000,)], "n_viewers bigint")
    exact = _time_to_convert_stats(lat, n_viewers)
    large = _time_to_convert_stats(lat, n_viewers, exact_max_rows=0)
    assert _rows(exact) == _rows(large)
    exact_plan = exact._jdf.queryExecution().toString().lower()
    large_plan = large._jdf.queryExecution().toString().lower()
    assert "percentile(" in exact_plan.replace("percentile_approx(", "")
    assert "percentile(" not in large_plan.replace(
        "percentile_approx(", ""
    )


def test_event_percentiles_adaptive_paths_identical(spark, sf_dir):
    """q_percentile's picker: the distributed-histogram path equals
    the exact per-group F.percentile path bit-for-bit (including
    all-NULL groups surviving as NULL rows), plan hazard-free."""
    from dfx_indicators_etl_spark.plans.analytics import (
        _event_percentiles,
    )
    from dfx_indicators_etl_spark.sources import read_table

    events = read_table(spark, sf_dir, "events")
    # add an all-NULL group to pin the group-preservation contract
    null_group = events.limit(3).select(
        *[
            F.lit("___nullgrp").alias(c)
            if c == "event_type"
            else F.lit(None).cast(events.schema[c].dataType).alias(c)
            if c == "value"
            else F.col(c)
            for c in events.columns
        ]
    )
    ev = events.unionByName(null_group)
    exact = _event_percentiles(ev)
    large = _event_percentiles(ev, exact_max_rows=0)
    assert _rows(exact) == _rows(large)
    assert exact.filter(F.col("event_type") == "___nullgrp").count() == 1
    large_plan = large._jdf.queryExecution().toString().lower()
    assert "percentile(" not in large_plan.replace(
        "percentile_approx(", ""
    )


def test_mad_adaptive_paths_identical(spark, sf_dir):
    """Forcing the per-group histogram path yields BIT-IDENTICAL
    median/MAD flags to the exact per-group F.percentile aggregates,
    and its plan carries no exact-percentile aggregate."""
    from dfx_indicators_etl_spark.plans.indicator_queries import (
        _mad_flags,
        _series,
    )

    series = _series(spark, sf_dir).filter(F.col("value").isNotNull())
    exact = _mad_flags(series)
    large = _mad_flags(series, exact_max_rows=0)
    assert _rows(exact) == _rows(large)
    large_plan = large._jdf.queryExecution().toString().lower()
    assert "percentile(" not in large_plan.replace(
        "percentile_approx(", ""
    )


def test_png_real_codec_through_decode_seam(spark):
    """VERDICT r9 #8: the mapInPandas decode contract holds for
    NON-SYNTHETIC payloads — real PNG bytes (stdlib zlib encoder,
    readable by any PNG tool) decode through the same seam as the
    fake-codec stub, per-row metadata and pixel checksums matching the
    numpy source of truth; unknown media types still raise."""
    import numpy as np
    import pytest as _pytest

    from dfx_indicators_etl_spark.operators import multimodal as M

    rng = np.random.RandomState(17)
    rows, expect = [], {}
    for doc_id, (w, h, ch) in enumerate(
        [(13, 9, 1), (32, 8, 3), (7, 21, 4), (64, 48, 2)]
    ):
        px = rng.randint(0, 256, size=w * h * ch, dtype=np.uint8)
        data = M.png_encode(px, w, h, ch)
        rows.append((doc_id, bytearray(data), "image/png"))
        expect[doc_id] = (len(data), w, h, 1, int(sum(px.tobytes()[:16])))
    # one fake-codec row in the SAME frame: both paths share the seam
    rows.append((99, bytearray(b"0123456789abcdef"), "image/fake"))
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {
        r["doc_id"]: (
            r["n_bytes"], r["width"], r["height"], r["n_frames"],
            r["checksum"],
        )
        for r in M.decode_features(df).collect()
    }
    for doc_id, (n, w, h, f, ck) in expect.items():
        assert got[doc_id] == (n, w, h, f, ck), doc_id
    assert got[99][1] == 16 % 640 and got[99][3] == 16 % 30 + 1
    # the codec boundary stays marked
    bad = spark.createDataFrame(
        [(1, bytearray(b"xx"), "video/mp4")],
        "doc_id long, payload binary, media_type string",
    )
    with _pytest.raises(Exception, match="no codec|NotImplemented"):
        M.decode_features(bad).collect()
