"""Adaptive-crossover probe (VERDICT r9 #5): measure each
runtime-adaptive primitive AT its threshold boundary — 0.5×, 1×, and
2× the documented row-count threshold — on BOTH paths, and verify the
paths agree at every probed size.

The pickers (global_running_sum / global_running_max / global_ntile /
histogram_percentiles-vs-exact-percentile) are pinned bit-identical in
pytest at test SF; what that leaves unmeasured is the boundary itself:
how much wall time the two-phase shape costs where the swap happens,
and how the single-task path's cost curves as the frame grows past it.
The thresholds are sized by SINGLE-TASK STATE (an unpartitioned window
funnels the whole frame through one task; an exact percentile buffers
a group's value→count map in one agg buffer), so the right reading of
these numbers is "the distributed path costs ≤~2× at the boundary —
flipping early is cheap insurance; flipping late risks one-task OOM at
cluster scale", not a local-wall-time argmin.

Run: ``python tools/adaptive_crossover_probe.py [scale]`` where
``scale`` (default 1.0) multiplies every probed size (use 0.01 for a
smoke run). Prints one JSON line:
{primitive: {n_rows: {"small_path_s": x, "large_path_s": y,
             "agree": true}}}.

Equality is checked with an order-insensitive aggregate fingerprint
(sum + xor of xxhash64 over the result columns), never a collect.
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
    global_ntile,
    global_running_max,
    global_running_sum,
    histogram_percentiles,
)
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402

# Probe anchors track the CURRENT picker thresholds (lowered to 2 M in
# round 10 off this probe's own measurements — SCALE.md
# §adaptive-crossover records the original 8 M/50 M-anchored run).
WINDOW_THRESHOLD = 2_000_000  # global_running_sum/max, global_ntile
PERCENTILE_THRESHOLD = 2_000_000  # exact F.percentile vs histogram


def fingerprint(df: DataFrame) -> tuple:
    """Order-insensitive exact fingerprint of a result frame."""
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


def frame(spark, n: int, parts: int = 32) -> DataFrame:
    # deterministic pseudo-random values; 2 shuffle-free narrow maps
    return (
        spark.range(0, n, 1, parts)
        .withColumn("v", F.xxhash64("id") % F.lit(1_000_000))
        .withColumn("g", (F.col("id") % 4).cast("int"))
    )


def probe_running(spark, maker, out_col, sizes):
    res = {}
    for n in sizes:
        df = frame(spark, n).localCheckpoint(eager=True)
        small, t_small = timed(
            lambda: fingerprint(
                maker(df, small_rows_threshold=n + 1, n_rows=n)
            )
        )
        large, t_large = timed(
            lambda: fingerprint(maker(df, small_rows_threshold=0, n_rows=n))
        )
        res[n] = {
            "small_path_s": t_small,
            "large_path_s": t_large,
            "agree": small == large,
        }
        df.unpersist()
    return res


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    # SPARK_GRAFT_MASTER=local-cluster[4,8,4096] re-probes the
    # boundary on a multi-JVM profile (serialized shuffle fetch between
    # executor processes — the cost component local[n] hides).
    import os

    spark = get_spark(
        "crossover-probe", master=os.environ.get("SPARK_GRAFT_MASTER")
    )
    spark.sparkContext.setLogLevel("ERROR")
    w_sizes = [int(WINDOW_THRESHOLD * f * scale) for f in (0.5, 1, 2)]
    p_sizes = [int(PERCENTILE_THRESHOLD * f * scale) for f in (0.5, 1, 2)]
    out = {}

    out["global_running_sum"] = probe_running(
        spark,
        lambda df, **kw: global_running_sum(
            df, "v", [F.col("id")], "cum", **kw
        ),
        "cum",
        w_sizes,
    )
    out["global_running_max"] = probe_running(
        spark,
        lambda df, **kw: global_running_max(
            df, "v", [F.col("id")], "pm", **kw
        ),
        "pm",
        w_sizes,
    )
    out["global_ntile"] = probe_running(
        spark,
        lambda df, **kw: global_ntile(
            df, 10, [F.col("v"), F.col("id")], "tile", **kw
        ),
        "tile",
        w_sizes,
    )

    res = {}
    for n in p_sizes:
        df = frame(spark, n).localCheckpoint(eager=True)
        exact, t_exact = timed(
            lambda: fingerprint(
                df.groupBy("g").agg(
                    F.percentile("v", F.lit(0.5)).alias("p50"),
                    F.percentile("v", F.lit(0.9)).alias("p90"),
                )
            )
        )
        hist, t_hist = timed(
            lambda: fingerprint(
                histogram_percentiles(df, ["g"], "v", {"p50": 0.5, "p90": 0.9})
            )
        )
        res[n] = {
            "small_path_s": t_exact,
            "large_path_s": t_hist,
            "agree": exact == hist,
        }
        df.unpersist()
    out["histogram_percentiles"] = res

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
