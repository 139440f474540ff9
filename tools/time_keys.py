"""Bench-methodology timing for a subset of keys.

Same discipline as bench.py (warm at sf0.001, clearCache, min-of-2
timed collect() at the target SF) so numbers are comparable with
BENCH_full_r{N}.json entries. Usage:

    python tools/time_keys.py key1 key2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfx_indicators_etl_spark.plans import QUERIES  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_spark("dfx-time-keys")
    spark.sparkContext.setLogLevel("ERROR")
    for name in keys:
        QUERIES[name](spark, warm_dir).collect()
    spark.catalog.clearCache()
    timings: dict[str, float] = {}
    for _ in range(reps):
        for name in keys:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            elapsed = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            spark.catalog.clearCache()
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
