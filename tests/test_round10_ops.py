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


def test_weighted_percentiles_hand_and_random(spark):
    """Lower weighted percentile: smallest v with cum weight ≥ p·total
    — hand case plus a brute-force Python model on random data."""
    from dfx_indicators_etl_spark.operators.scale import (
        weighted_percentiles,
    )

    # weights: 10@1, 30@2, 60@3 -> wp50 = 3 (cum 40 < 50 at v=2),
    # wp25 = 2 (cum 10 < 25 at v=1), total 100
    df = spark.createDataFrame(
        [("g", 1.0, 10), ("g", 2.0, 30), ("g", 3.0, 60)],
        "grp string, v double, w bigint",
    )
    row = weighted_percentiles(
        df, ["grp"], "v", "w", {"wp25": (1, 4), "wp50": (1, 2)},
        total_col="tw",
    ).collect()[0]
    assert (row["wp25"], row["wp50"], row["tw"]) == (2.0, 3.0, 100.0)

    rng = random.Random(41)
    data = [
        (f"g{rng.randint(0, 2)}", float(rng.randint(0, 50)),
         rng.randint(1, 9))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(data, "grp string, v double, w bigint")
    got = {
        r["grp"]: (r["wp50"], r["wp90"])
        for r in weighted_percentiles(
            df, ["grp"], "v", "w", {"wp50": (1, 2), "wp90": (9, 10)}
        ).collect()
    }

    def model(rows, num, den):
        rows = sorted(rows)
        total = sum(w for _, w in rows)
        cum = 0
        for v, w in rows:
            cum += w
            if cum * den >= total * num:
                return v
        raise AssertionError

    by = {}
    for g, v, w in data:
        by.setdefault(g, []).append((v, w))
    for g, rows in by.items():
        assert got[g] == (model(rows, 1, 2), model(rows, 9, 10)), g


def test_psi_zero_on_identical_positive_under_shift(spark):
    """PSI(x, x) is exactly 0 (every smoothed term is 0); a location
    shift makes it strictly positive; and the folded value matches a
    numpy model of the identical arithmetic."""
    import math

    from dfx_indicators_etl_spark.plans.analytics_ext import psi_report

    rng = random.Random(5)
    ref_vals = [float(rng.uniform(0, 900)) for _ in range(3000)]
    cur_vals = [v + 200.0 for v in ref_vals[:2000]]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "value double")

    same = psi_report(spark, ref, ref).collect()[0]
    assert same["psi"] == 0.0 and same["n_ref"] == same["n_cur"] == 3000

    drift = psi_report(spark, ref, cur).collect()[0]
    assert drift["psi"] > 0.01

    # numpy-free model of the exact term arithmetic
    def bins(vals):
        c = [0] * 20
        for v in vals:
            c[min(max(int(v // 50), 0), 19)] += 1
        return c

    na, nb = bins(ref_vals), bins(cur_vals)
    ta, tb = sum(na), sum(nb)
    psi = sum(
        round(
            ((a + 1.0) / (ta + 20) - (b + 1.0) / (tb + 20))
            * math.log(((a + 1.0) / (ta + 20)) / ((b + 1.0) / (tb + 20))),
            12,
        )
        for a, b in zip(na, nb)
    )
    assert abs(drift["psi"] - round(psi, 6)) < 1e-9


def test_bitmap_retention_hand_case(spark):
    """Week 1 {1,2,3}, week 2 {2,3,4,5}, week 3 {5}: the AND-merged
    report reproduces active/retained/new/churned exactly, including
    users 64 apart (different buckets) and the first-week NULL churn."""
    import datetime as dt

    from dfx_indicators_etl_spark.plans.analytics_ext import (
        bitmap_retention_report,
    )

    w1, w2, w3 = (
        dt.date(2024, 1, 1),
        dt.date(2024, 1, 8),
        dt.date(2024, 1, 15),
    )
    rows = (
        [(w1, u) for u in (1, 2, 3, 130)]  # 130 = bucket 2
        + [(w2, u) for u in (2, 3, 4, 5, 130)]
        + [(w3, u) for u in (5,)]
    )
    e = spark.createDataFrame(rows, "week date, user_id bigint")
    got = {
        r["week"]: (
            r["n_active"], r["n_retained"], r["n_new"], r["n_churned"]
        )
        for r in bitmap_retention_report(e).collect()
    }
    assert got[w1] == (4, 0, 4, None)
    assert got[w2] == (5, 3, 2, 1)  # retained {2,3,130}; churned {1}
    assert got[w3] == (1, 1, 0, 4)


def test_png_real_resize_through_seam(spark):
    """The resize seam also runs the REAL codec for PNG payloads:
    nearest-neighbor decode→sample→re-encode, the output parses as a
    valid PNG of the target geometry, and the fake path in the same
    frame keeps its truncation contract."""
    import numpy as np

    from dfx_indicators_etl_spark.operators import multimodal as M

    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, size=40 * 30 * 3, dtype=np.uint8)
    data = M.png_encode(px, 40, 30, 3)
    rows = [
        (1, bytearray(data), "image/png"),
        (2, bytearray(b"z" * 5000), "image/fake"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {
        r["doc_id"]: r for r in M.resize_images(df, 10, 6).collect()
    }
    expected = M.png_resize(data, 10, 6)
    w, h, raw = M.png_decode(expected)
    assert (w, h) == (10, 6)
    assert got[1]["out_bytes"] == len(expected)
    assert got[1]["checksum"] == int(sum(expected[:16]))
    assert (got[2]["out_bytes"], got[2]["checksum"]) == (
        60,
        int(sum(b"z" * 16)),
    )


def test_wav_real_codec_through_decode_seam(spark):
    """Second non-synthetic format through the same seam: real WAV
    bytes (stdlib RIFF writer) decode beside PNG and fake rows in ONE
    frame — metadata mapping (rate/channels/samples) and the checksum
    over decoded PCM match the source of truth."""
    import struct

    from dfx_indicators_etl_spark.operators import multimodal as M

    pcm = struct.pack("<12h", *range(-6, 6))
    wav = M.wav_encode(pcm, n_channels=2, sample_rate=8000, bits=16)
    png = M.png_encode(bytes(range(24)), 4, 6, 1)
    rows = [
        (1, bytearray(wav), "audio/wav"),
        (2, bytearray(png), "image/png"),
        (3, bytearray(b"0123456789abcdef"), "image/fake"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {
        r["doc_id"]: (
            r["width"], r["height"], r["n_frames"], r["checksum"]
        )
        for r in M.decode_features(df).collect()
    }
    assert got[1] == (8000, 2, 6, int(sum(pcm[:16])))
    assert got[2] == (4, 6, 1, int(sum(bytes(range(24))[:16])))
    assert got[3][2] == 16 % 30 + 1  # fake path untouched


def test_round10_new_key_plan_shapes(spark, sf_dir):
    """The round-10 keys' scale claims, asserted on executed plans:
    q_psi_drift reduces map-side (no window, no Python, bounded
    scans); q_weighted_percentile's cumulative window is PARTITIONED
    (no SinglePartition exchange) and Python-free; q_bitmap_retention
    derives actives AND the pair join from ONE materialized word log
    (no re-scan per branch past the checkpoint); q_decayed_engagement
    is a narrow map + one key shuffle + bounded top-k."""
    from dfx_indicators_etl_spark.plans import QUERIES

    def plan(name):
        return (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    p = plan("q_psi_drift")
    assert "Window" not in p and "BatchEvalPython" not in p
    assert p.count("Scan parquet") <= 2  # two filtered sides of events

    p = plan("q_weighted_percentile")
    assert "SinglePartition" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    p = plan("q_bitmap_retention")
    # everything past the uneager checkpoint reuses the word log: the
    # events fact must not re-scan per branch
    assert p.count("Scan parquet") <= 1
    assert "BatchEvalPython" not in p

    p = plan("q_decayed_engagement")
    assert "TakeOrderedAndProject" in p  # bounded top-100, no global sort
    assert "BatchEvalPython" not in p
    assert p.count("Exchange hashpartitioning") <= 1  # one key shuffle
