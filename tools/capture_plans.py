"""Capture .explain("formatted") for registered queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [keys...]
  suffix: "before" or "after" — file name becomes plans/$SPARK_GRAFT_PLANS_ROUND/<key>_<suffix>.txt (round dir defaults to r15)

Streaming/sink keys whose registered callable RUNS the pipeline (their
return value is a materialized localCheckpoint/memory table) cannot be
explained without executing; for those this tool records the plan of
the returned DataFrame anyway (trivial) plus a note — the interesting
evidence for them is the phase timing in OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfx_indicators_etl_spark.plans import QUERIES  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dfx-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        fn = QUERIES[key]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR capturing plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{key}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {key}_{suffix}.txt ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
