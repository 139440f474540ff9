"""A/B the state-machinery knobs for the stream-stream left join drain.

Variants: shuffle partitions 32 (baseline) vs 8 vs 4; RocksDB provider.
Each variant runs the full 3-drain harness twice; report both (first is
codegen-warm from the previous variant, so both are meaningful).
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


def run_harness(spark, root: str) -> tuple[float, int]:
    for d in ("out", "ckpt", "landing"):
        shutil.rmtree(f"{root}/{d}", ignore_errors=True)
    landing = f"{root}/landing"
    events = read_table(spark, SF_DIR, "events")
    events.write.parquet(landing, mode="overwrite")
    horizon = events.select(
        (F.unix_timestamp(F.max("ts")) + 2 * 3600 + 30 * 60 + 3600).alias("s")
    ).collect()[0]["s"]
    t0 = time.time()

    def drain() -> None:
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

    drain()
    spark.createDataFrame(
        [(-1, -1, "view", 0.0, None), (-2, -2, "click", 0.0, None)],
        "event_id bigint, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(horizon))).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).coalesce(1).write.parquet(landing, mode="append")
    drain()
    drain()
    wall = time.time() - t0
    n = (
        spark.read.parquet(f"{root}/out")
        .where(F.col("view_id") >= 0)
        .count()
    )
    return wall, n


def main() -> None:
    spark = get_spark("dfx-profile-knobs")
    spark.sparkContext.setLogLevel("ERROR")
    root = _scratch("dfx_prof_knob_")
    variants = [
        ("baseline sp=32", {}),
        ("sp=8", {"spark.sql.shuffle.partitions": "8"}),
        ("sp=4", {"spark.sql.shuffle.partitions": "4"}),
        (
            "sp=32 rocksdb",
            {
                "spark.sql.shuffle.partitions": "32",
                "spark.sql.streaming.stateStore.providerClass": (
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider"
                ),
            },
        ),
        (
            "sp=8 rocksdb",
            {
                "spark.sql.shuffle.partitions": "8",
                "spark.sql.streaming.stateStore.providerClass": (
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider"
                ),
            },
        ),
    ]
    saved = {
        k: spark.conf.get(k, None)
        for _, conf in variants
        for k in conf
    }
    try:
        for label, conf in variants:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)
            for k, v in conf.items():
                spark.conf.set(k, v)
            for rep in range(2):
                wall, n = run_harness(spark, root)
                print(f"{label:16s} rep{rep}: drains {wall:6.2f}s  rows={n}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
