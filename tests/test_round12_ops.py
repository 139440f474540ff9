"""Round-12 pins: first-touch late-arrival crediting (ADVICE r11),
the TTL attribution variant (VERDICT r11 #7), and NaN-aware carry
folds (ADVICE r11)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _write_events_file(spark, tmp_path, src, name, rows):
    import shutil as sh

    stage = tmp_path / "stage" / name
    spark.createDataFrame(
        rows,
        "user_id bigint, event_id bigint, event_type string, "
        "ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    part = next(p for p in stage.iterdir() if p.suffix == ".parquet")
    sh.copy(part, src / f"{name}.parquet")


EVENTS_SCHEMA = (
    "user_id bigint, event_id bigint, event_type string, "
    "ts timestamp, value double"
)


def _drain(spark, tmp_path, src, build, out, ckpt):
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    q = (
        build(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / out))
        .option("checkpointLocation", str(tmp_path / ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "drain timed out"
    q.stop()


def test_first_touch_late_arrival_frame_exact(spark, tmp_path):
    """ADVICE r11: a purchase arriving in a LATER micro-batch with
    event time BEFORE the stored touch must credit 'direct' (the batch
    oracle's 1-PRECEDING frame), and an in-watermark late touch that
    is EARLIER in event time than the stored one re-points future
    purchases (the monotone-downward register)."""
    from dfx_indicators_etl_spark import streaming

    src = tmp_path / "src"
    src.mkdir()
    _write_events_file(spark, tmp_path, src, "f1", [
        (1, 30, "view", "2024-01-01 12:00:00", 0.0),   # stored touch
    ])
    _write_events_file(spark, tmp_path, src, "f2", [
        # event time BEFORE the stored 12:00 view → oracle says direct
        (1, 28, "purchase", "2024-01-01 10:30:00", 4.0),
        # late-but-in-watermark touch, earlier than the stored view:
        # folds the register down to (11:00, click)
        (1, 29, "click", "2024-01-01 11:00:00", 0.0),
        # after every touch → credits the (new) earliest touch
        (1, 31, "purchase", "2024-01-01 13:00:00", 6.0),
    ])
    _drain(
        spark, tmp_path, src,
        streaming.stream_first_touch_attribution, "out", "ckpt",
    )
    got = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {28: "direct", 31: "click"}


def test_first_touch_ttl_restart_and_expiry(spark, tmp_path):
    """The TTL variant: purchases within 7 days of the first touch
    credit it; beyond 7 days they are 'direct'; a mid-backlog restart
    from the same checkpoint changes nothing."""
    from dfx_indicators_etl_spark import streaming

    src = tmp_path / "src"
    src.mkdir()
    _write_events_file(spark, tmp_path, src, "f1", [
        (1, 10, "click", "2024-01-01 10:00:00", 0.0),   # first touch
        (1, 11, "purchase", "2024-01-03 10:00:00", 5.0),  # +2d -> click
        (2, 20, "purchase", "2024-01-02 09:00:00", 7.0),  # no touch -> direct
    ])

    def build(stream):
        return streaming.stream_first_touch_attribution_ttl(stream)

    _drain(spark, tmp_path, src, build, "out", "ckpt")
    _write_events_file(spark, tmp_path, src, "f2", [
        (1, 12, "purchase", "2024-01-07 09:00:00", 3.0),  # +6d -> click
        (1, 13, "purchase", "2024-01-10 11:00:00", 9.0),  # +9d -> direct
        (2, 21, "view", "2024-01-09 08:00:00", 0.0),      # touch for user 2
        (2, 22, "purchase", "2024-01-12 08:30:00", 2.0),  # +3d -> view
    ])
    _drain(spark, tmp_path, src, build, "out", "ckpt")  # SAME checkpoint

    expect = {
        10: None, 11: "click", 20: "direct",
        12: "click", 13: "direct", 22: "view",
    }
    expect = {k: v for k, v in expect.items() if v is not None}
    got = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == expect

    # one-shot drain over the full backlog == the restarted pair
    _drain(spark, tmp_path, src, build, "out2", "ckpt2")
    oneshot = {
        r["event_id"]: r["touch"]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert oneshot == expect


@pytest.mark.parametrize("kind", ["max", "min"])
def test_grouped_running_carry_nan_matches_window(spark, kind):
    """ADVICE r11: Spark max/min order float NaN as the LARGEST value;
    the above-threshold driver fold must match (Python max/min with
    NaN operands are order-dependent)."""
    from dfx_indicators_etl_spark.operators import scale as S

    nan = float("nan")
    rows = [
        # group "a": NaN arrives in the middle slice — Spark max
        # carries NaN forever after; Spark min ignores it
        ("a", 1, 5.0), ("a", 2, nan), ("a", 3, 1.0), ("a", 4, 7.0),
        # group "b": NaN first
        ("b", 1, nan), ("b", 2, 3.0), ("b", 3, 2.0),
        # group "c": no NaN
        ("c", 1, 4.0), ("c", 2, 6.0), ("c", 3, 5.0),
    ] * 40  # pad so range partitions actually split the hot groups
    rows = [
        (g, i * 10 + k, v)
        for k, (g, i, v) in enumerate(r for r in rows)
    ]
    df = spark.createDataFrame(rows, "g string, o bigint, v double")

    def run(threshold):
        out = S.grouped_running_carry(
            df, ["g"], "v", [F.col("o")], "carry",
            kind=kind, small_rows_threshold=threshold,
        )
        return sorted(
            (
                (r["g"], r["o"], None if r["carry"] is None
                 else ("nan" if math.isnan(r["carry"]) else r["carry"]))
                for r in out.collect()
            ),
        )

    window_path = run(10**9)   # below threshold → plain window
    scale_path = run(0)        # above threshold → partial fold
    assert scale_path == window_path
