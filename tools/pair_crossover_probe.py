"""Quadratic-pair crossover probe (round 12, VERDICT r11 #2): time the
EXACT blocked self-join vs the recall-gated LSH-banded generator for
the all-pairs cosine class at sizes around the router threshold
(``similarity.EXACT_PAIRS_MAX_ROWS``), on synthetic deterministic
vectors (xxhash-seeded uniform components, dim 64 — random cosines
concentrate near 0, so output stays tiny and the timing measures the
pair-generation compute, not result materialization).

The exact path's cost is n²·dim/2 FLOPs regardless of data; the
banded path's is ~n·bucket_rows·dim per table. The right reading is
the same as the window pickers': the threshold should sit at-or-below
the local argmin because the exact path's cost curve is QUADRATIC
past it — flipping early costs a bounded constant factor, flipping
late costs n².

Run: ``python tools/pair_crossover_probe.py [sizes_csv]`` (default
``12500,25000,50000,100000``). Prints one JSON line:
{n: {"exact_s": x, "banded_s": y, "exact_pairs": a, "banded_pairs": b}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dfx_indicators_etl_spark.operators import similarity as S  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402

DIM = 64


def synth(spark, n: int):
    """Deterministic pseudo-random unit-ish vectors, JVM-side."""
    cols = [
        (
            F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(10_000)).cast(
                "double"
            )
            / 5_000.0
            - 1.0
        ).cast("float")
        for j in range(DIM)
    ]
    return (
        spark.range(0, n, 1, 32)
        .select(F.col("id").alias("vec_id"), F.array(*cols).alias("embedding"))
        .localCheckpoint(eager=True)
    )


def main() -> None:
    sizes = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "12500,25000,50000,100000").split(",")
    ]
    spark = get_spark("pair-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for n in sizes:
        df = synth(spark, n)
        t0 = time.time()
        a = S.embedding_cosine_pairs_exact(df, threshold=0.4).count()
        exact_s = round(time.time() - t0, 2)
        t0 = time.time()
        b = S.banded_cosine_pairs(df, threshold=0.4, n_rows=n).count()
        banded_s = round(time.time() - t0, 2)
        out[n] = {
            "exact_s": exact_s,
            "banded_s": banded_s,
            "exact_pairs": a,
            "banded_pairs": b,
        }
        df.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
