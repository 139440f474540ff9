"""Phase-level wall-clock profile of the heavy streaming harnesses.

Replays each harness's phases with timers (same code paths, scratch
cleaned up) so optimization work targets the measured phase, not a
guess. Run on an otherwise idle host:

    python tools/profile_stream_phases.py [key ...]

Keys: ssleft, wpct, psi, bitmap, cms, reach, scd2, drain_overhead
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dfx_indicators_etl_spark import streaming  # noqa: E402
from dfx_indicators_etl_spark.plans.streaming_queries import _scratch  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402
from dfx_indicators_etl_spark.sources.readers import read_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self) -> None:
        self.t0 = time.time()
        self.marks: list[tuple[str, float]] = []

    def mark(self, label: str) -> None:
        now = time.time()
        self.marks.append((label, now - self.t0))
        self.t0 = now

    def report(self, key: str) -> None:
        total = sum(d for _, d in self.marks)
        print(f"== {key}: total {total:.2f}s")
        for label, d in self.marks:
            print(f"   {label:28s} {d:6.2f}s")


def profile_ssleft(spark) -> None:
    t = T()
    events = read_table(spark, SF_DIR, "events")
    root = _scratch("dfx_prof_ssleft_")
    try:
        landing = f"{root}/landing"
        events.write.parquet(landing, mode="overwrite")
        t.mark("stage backlog write")
        horizon = events.select(
            (F.unix_timestamp(F.max("ts")) + 2 * 3600 + 30 * 60 + 3600).alias("s")
        ).collect()[0]["s"]
        t.mark("horizon collect")

        def drain(label: str) -> None:
            stream = streaming.stream_view_click_left_join(
                streaming.read_events_landing(spark, landing)
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", f"{root}/out")
                .option("checkpointLocation", f"{root}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(300):
                    raise TimeoutError("drain timeout")
            finally:
                q.stop()
            t.mark(label)

        drain("drain 1 (backlog)")
        spark.createDataFrame(
            [(-1, -1, "view", 0.0, None), (-2, -2, "click", 0.0, None)],
            "event_id bigint, user_id bigint, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.timestamp_seconds(F.lit(horizon))).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).coalesce(1).write.parquet(landing, mode="append")
        t.mark("heartbeat write")
        drain("drain 2 (heartbeat)")
        drain("drain 3 (flush)")
        spark.read.parquet(f"{root}/out").where(
            F.col("view_id") >= 0
        ).localCheckpoint(eager=True)
        t.mark("read-back")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    t.report("stream_stream_left_join")


def profile_additive(spark, key: str) -> None:
    """The 6-slice additive-log keys share one harness shape."""
    table, id_col, incr, reader = {
        "wpct": (
            "lineitem",
            "l_orderkey",
            streaming.incremental_weighted_histogram,
            lambda s, st: streaming.read_weighted_percentiles(
                s, st, {"wp50": (1, 2), "wp90": (9, 10)}
            ),
        ),
        "psi": (
            "events",
            "event_id",
            streaming.incremental_psi_drift,
            streaming.read_psi_drift,
        ),
        "bitmap": (
            "events",
            "event_id",
            streaming.incremental_bitmap_distinct,
            streaming.read_bitmap_distinct,
        ),
        "cms": (
            "documents",
            "doc_id",
            streaming.incremental_cms_sketch,
            streaming.read_cms_sketch,
        ),
        "reach": (
            "events",
            "event_id",
            streaming.incremental_rolling_reach,
            lambda s, st: streaming.read_rolling_reach(s, st, window_days=14),
        ),
    }[key]
    t = T()
    df = read_table(spark, SF_DIR, table)
    if key == "wpct":
        df = df.select("l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey")
    root = _scratch(f"dfx_prof_{key}_")
    try:
        landing = f"{root}/landing"
        for b in range(6):
            df.filter(F.pmod(F.col(id_col), F.lit(6)) == b).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
        t.mark("stage 6 slices")
        incr(spark, landing, f"{root}/state", f"{root}/ckpt")
        t.mark("drain 6 batches")
        reader(spark, f"{root}/state").localCheckpoint(eager=True)
        t.mark("read fold")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    t.report(f"stream_{key}")


def profile_drain_overhead(spark) -> None:
    """Cost of one no-op availableNow drain: fixed machinery floor."""
    t = T()
    root = _scratch("dfx_prof_noop_")
    try:
        landing = f"{root}/landing"
        spark.range(0, 10).coalesce(1).write.parquet(landing)
        t.mark("stage tiny file")
        schema = spark.read.parquet(landing).schema
        for i in range(2):
            q = (
                spark.readStream.schema(schema)
                .parquet(landing)
                .writeStream.format("noop")
                .option("checkpointLocation", f"{root}/ckpt{i}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            q.stop()
            t.mark(f"noop drain {i + 1}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    t.report("drain_overhead")


def main() -> None:
    keys = sys.argv[1:] or ["drain_overhead", "ssleft", "wpct", "psi", "bitmap", "cms", "reach"]
    spark = get_spark("dfx-profile-stream")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        if key == "ssleft":
            profile_ssleft(spark)
        elif key == "drain_overhead":
            profile_drain_overhead(spark)
        else:
            profile_additive(spark, key)
    spark.stop()


if __name__ == "__main__":
    main()
