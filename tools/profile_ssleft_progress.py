"""Per-batch StreamingQueryProgress breakdown of stream_stream_left_join.

Prints durationMs and state-operator metrics for every micro-batch of
each drain so the 16 s goes from a guess to a measured line item.
"""

from __future__ import annotations

import json
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


def main() -> None:
    spark = get_spark("dfx-profile-ssleft")
    spark.sparkContext.setLogLevel("ERROR")
    events = read_table(spark, SF_DIR, "events")
    root = _scratch("dfx_prof_ssl2_")
    reps = int(os.environ.get("REPS", "2"))
    try:
        for rep in range(reps):
            for d in ("out", "ckpt", "landing"):
                shutil.rmtree(f"{root}/{d}", ignore_errors=True)
            landing = f"{root}/landing"
            t0 = time.time()
            events.write.parquet(landing, mode="overwrite")
            n_files = len(
                [f for f in os.listdir(landing) if f.endswith(".parquet")]
            )
            print(f"[rep {rep}] backlog write {time.time() - t0:.2f}s, {n_files} files")
            horizon = events.select(
                (F.unix_timestamp(F.max("ts")) + 2 * 3600 + 30 * 60 + 3600).alias("s")
            ).collect()[0]["s"]

            def drain(label: str) -> None:
                t = time.time()
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
                    progress = [
                        json.loads(p if isinstance(p, str) else p.json)
                        for p in q.recentProgress
                    ]
                    q.stop()
                print(f"[rep {rep}] {label}: {time.time() - t:.2f}s, {len(progress)} batches")
                for p in progress:
                    dur = p.get("durationMs", {})
                    ops = [
                        {
                            "rowsTotal": so.get("numRowsTotal"),
                            "updated": so.get("numRowsUpdated"),
                            "removed": so.get("numRowsRemoved"),
                            "commitMs": so.get("commitTimeMs"),
                            "shufflePartitions": so.get("numShufflePartitions"),
                        }
                        for so in p.get("stateOperators", [])
                    ]
                    print(
                        f"    batch {p['batchId']}: rows={p.get('numInputRows')} "
                        f"dur={dur} state={ops}"
                    )

            drain("drain 1")
            spark.createDataFrame(
                [(-1, -1, "view", 0.0, None), (-2, -2, "click", 0.0, None)],
                "event_id bigint, user_id bigint, event_type string, "
                "value double, props string",
            ).withColumn("ts", F.timestamp_seconds(F.lit(horizon))).select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            ).coalesce(1).write.parquet(landing, mode="append")
            drain("drain 2")
            drain("drain 3")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
