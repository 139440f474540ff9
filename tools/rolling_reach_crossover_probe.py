"""Rolling-reach window-width crossover (VERDICT r12 #7): measure the
two exact sliding-reach plans against each other as the window width
``w`` grows, on the K×-upscaled events fact.

- **exploded** (the ``q_rolling_wau`` shape): each DISTINCT
  (user, day) activity explodes into the w report-days it supports —
  the moved volume is w × #active-user-days.
- **bitmap** (the ``q_rolling_reach_bitmap`` shape): the fact folds
  once into day×bucket 64-bit words (user_id>>6 buckets, bit_or),
  and the WORD table explodes w× — volume w × days × #buckets,
  independent of per-day activity.

The documented rule (plans/analytics_ext.py): the bitmap wins when
distinct active users per day exceed the bucket count (max_user/64).
This probe measures the actual wall crossover on local[32] so the
rule carries a number. Both plans clip report days to full windows
and are verified to agree at every probed w.

Run: ``python tools/rolling_reach_crossover_probe.py [K] [w ...]``
(default 8 / 7 14 28 56 112). Prints one JSON line:
{w: {"exploded_s": x, "bitmap_s": y, "agree": b}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scaling_probe import upscale  # noqa: E402

from dfx_indicators_etl_spark.session import get_spark  # noqa: E402
from dfx_indicators_etl_spark.sources import read_table  # noqa: E402


def exploded_reach(events, w: int):
    d = (
        events.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = d.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), w - 1),
                F.expr("interval 1 day"),
            )
        ).alias("report_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("report_day") <= F.col("hi"))
            & (F.col("report_day") >= F.date_add(F.col("lo"), w - 1))
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("reach"))
    )


def bitmap_reach(events, w: int):
    e = events.select(F.col("ts").cast("date").alias("day"), "user_id")
    words = (
        e.groupBy("day", F.shiftright(F.col("user_id"), 6).alias("bkt"))
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, CAST(user_id % 64 AS INT)))"
            ).alias("word")
        )
        .localCheckpoint(eager=False)
    )
    bounds = words.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    contrib = words.select(
        "bkt",
        "word",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), w - 1),
                F.expr("interval 1 day"),
            )
        ).alias("report_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("report_day") <= F.col("hi"))
            & (F.col("report_day") >= F.date_add(F.col("lo"), w - 1))
        )
        .groupBy("report_day", "bkt")
        .agg(F.expr("bit_or(word)").alias("word"))
        .groupBy("report_day")
        .agg(F.sum(F.bit_count("word")).cast("bigint").alias("reach"))
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    widths = [int(a) for a in sys.argv[2:]] or [7, 14, 28, 56, 112]
    spark = get_spark("reach-crossover-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = Path(tempfile.mkdtemp(prefix="dfx_reach_"))
    out = {}
    try:
        upscale(spark, "events", k, str(scratch))
        events = read_table(spark, str(scratch), "events").localCheckpoint(
            eager=True
        )
        for w in widths:
            exploded_reach(events, w).count()  # warm plan/JIT
            t0 = time.time()
            a = {
                (r["report_day"], r["reach"])
                for r in exploded_reach(events, w).collect()
            }
            ex_s = round(time.time() - t0, 2)
            bitmap_reach(events, w).count()
            t0 = time.time()
            b = {
                (r["report_day"], r["reach"])
                for r in bitmap_reach(events, w).collect()
            }
            bm_s = round(time.time() - t0, 2)
            out[w] = {"exploded_s": ex_s, "bitmap_s": bm_s, "agree": a == b}
        print(json.dumps({"k": k, "widths": out}))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
