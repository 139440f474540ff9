"""Skewed-group probe for ``grouped_running_sum`` (VERDICT r10 #3):
one HOT group holding ~95% of a histogram's distinct values — the
exact shape where a partitioned cumulative window degenerates into a
single task's sort — measured on both paths at and past the 2 M
threshold, with order-insensitive fingerprint agreement.

The reading that matters is NOT local wall-time argmin: the window
path's hot group is ONE task however many executors exist, so its
cost ceiling is one core + one task's memory; the offsets path splits
the hot group across range partitions and scales with the cluster.
Local[32] numbers only show the algebra's constant-factor overhead is
bounded at the boundary.

Run: ``python tools/hot_group_probe.py [scale]`` (default 1.0;
0.01 for a smoke run). Prints one JSON line:
{n_rows: {"window_path_s": x, "offsets_path_s": y, "agree": true}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dfx_indicators_etl_spark.operators.scale import (  # noqa: E402
    grouped_lag,
    grouped_running_carry,
    grouped_running_sum,
)
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402

THRESHOLD = 2_000_000  # grouped_running_sum's small_rows_threshold


def fingerprint(df: DataFrame) -> tuple:
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    h = F.xxhash64(*cols)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(h).alias("s"),
        F.sum(F.abs(h) % F.lit(1_000_003)).alias("m"),
    ).collect()[0]
    return (row["n"], row["s"], row["m"])


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def skewed_hist(spark, n: int, parts: int = 32) -> DataFrame:
    """A (group, value) → weight histogram where group 'hot' carries
    95% of all distinct values and 200 cold groups share the rest —
    distinct values already unique per group (the histogram contract).
    """
    hot_n = int(n * 0.95)
    hot = (
        spark.range(0, hot_n, 1, parts)
        .select(
            F.lit("hot").alias("g"),
            F.col("id").alias("v"),
            (F.xxhash64("id") % F.lit(997) + F.lit(1000)).alias("w"),
        )
    )
    cold = (
        spark.range(0, n - hot_n, 1, parts)
        .select(
            F.concat(F.lit("c"), (F.col("id") % 200).cast("string")).alias(
                "g"
            ),
            (F.col("id") / F.lit(200)).cast("long").alias("v"),
            (F.xxhash64("id", "id") % F.lit(997) + F.lit(1000)).alias("w"),
        )
    )
    return hot.unionByName(cold)


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    import os

    spark = get_spark(
        "hot-group-probe", master=os.environ.get("SPARK_GRAFT_MASTER")
    )
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(THRESHOLD * f * scale) for f in (1, 2, 4)]
    out = {"grouped_running_sum": {}, "grouped_lag": {}}
    for n in sizes:
        df = skewed_hist(spark, n).localCheckpoint(eager=True)
        order = [F.col("v").asc()]
        win, t_win = timed(
            lambda: fingerprint(
                grouped_running_sum(
                    df, ["g"], "w", order, "cum",
                    n_rows=n, small_rows_threshold=n + 1,
                )
            )
        )
        off, t_off = timed(
            lambda: fingerprint(
                grouped_running_sum(
                    df, ["g"], "w", order, "cum",
                    n_rows=n, small_rows_threshold=0,
                )
            )
        )
        out["grouped_running_sum"][n] = {
            "window_path_s": t_win,
            "offsets_path_s": t_off,
            "agree": win == off,
        }
        lw, t_lw = timed(
            lambda: fingerprint(
                grouped_lag(
                    df, ["g"], "w", order, "prev",
                    n_rows=n, small_rows_threshold=n + 1,
                )
            )
        )
        lh, t_lh = timed(
            lambda: fingerprint(
                grouped_lag(
                    df, ["g"], "w", order, "prev",
                    n_rows=n, small_rows_threshold=0,
                )
            )
        )
        out["grouped_lag"][n] = {
            "window_path_s": t_lw,
            "handoff_path_s": t_lh,
            "agree": lw == lh,
        }
        # the carry monoids: conditional value (NULL-heavy — only
        # every 7th row carries one, the as-of shape) with the
        # exclusive frame the as-of family uses
        sparse = df.withColumn(
            "w", F.when(F.col("v") % 7 == 0, F.col("w"))
        ).localCheckpoint(eager=True)
        for kind in ("max", "last"):
            cw, t_cw = timed(
                lambda: fingerprint(
                    grouped_running_carry(
                        sparse, ["g"], "w", order, "carry", kind=kind,
                        frame_end=-1, n_rows=n, small_rows_threshold=n + 1,
                    )
                )
            )
            co, t_co = timed(
                lambda: fingerprint(
                    grouped_running_carry(
                        sparse, ["g"], "w", order, "carry", kind=kind,
                        frame_end=-1, n_rows=n, small_rows_threshold=0,
                    )
                )
            )
            out.setdefault(f"grouped_running_carry[{kind}]", {})[n] = {
                "window_path_s": t_cw,
                "carry_path_s": t_co,
                "agree": cw == co,
            }
        sparse.unpersist()
        df.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
