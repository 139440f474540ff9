"""Chain-fold step-cost probe (VERDICT r12 #5): measure the
recursive-CTE chain against the driver-side decimal fold at growing
chain depths, and verify the two paths agree bit-for-bit at every
depth.

The chained-index keys fold year-over-year links multiplicatively
with per-step 6dp HALF_UP rounding. The recursive CTE schedules one
driver round-trip per step (~0.3-0.4 s, flat in data volume) — fine
at calendar-year depth, a cliff for monthly/hundreds-step chains.
The adaptive swap (plans/indicator_queries.py CHAIN_CTE_MAX_STEPS)
collects the control-plane links frame (one row per period,
1 partition) and folds driver-side with the identical arithmetic.

Run: ``python tools/chain_fold_probe.py [depths...]`` (default
8 40 80 200 500). Prints one JSON line:
{depth: {"cte_s": x, "fold_s": y, "per_step_cte_s": z, "agree": b}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dfx_indicators_etl_spark.plans.indicator_queries import (  # noqa: E402
    _chain_fold_rows,
)
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402


def synthetic_links(spark, depth: int):
    """Deterministic year-grain links around 1.0 (±5%, md5-derived)."""
    return (
        spark.range(depth)
        .select(
            (F.lit(2000) + F.col("id")).cast("int").alias("comp_year"),
            F.round(
                1.0
                + (
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(F.col("id").cast("string")), 1, 8
                            ),
                            16,
                            10,
                        ).cast("bigint"),
                        F.lit(1000),
                    )
                    - 500
                )
                / 10000.0,
                6,
            ).alias("link"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )


def cte_chain(spark, links):
    links.createOrReplaceTempView("__probe_links")
    return spark.sql(
        """
        WITH RECURSIVE chain(yr, idx) AS (
            SELECT (SELECT MIN(comp_year) - 1 FROM __probe_links),
                   CAST(100.0 AS DOUBLE)
            UNION ALL
            SELECT l.comp_year, round(c.idx * l.link, 6)
            FROM chain c JOIN __probe_links l ON l.comp_year = c.yr + 1
        )
        SELECT CAST(yr AS INT) AS year, idx FROM chain
        """
    ).collect()


def main() -> None:
    depths = [int(a) for a in sys.argv[1:]] or [8, 40, 80, 200, 500]
    spark = get_spark("chain-fold-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # Spark caps recursion at 100 levels by default; the probe raises
    # it so the CTE path can be measured past the adaptive threshold.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
    out = {}
    for depth in depths:
        links = synthetic_links(spark, depth)
        rows = links.collect()
        t0 = time.time()
        cte = cte_chain(spark, links)
        cte_s = round(time.time() - t0, 3)
        t0 = time.time()
        fold = _chain_fold_rows(rows, ["link"])
        fold_s = round(time.time() - t0, 3)
        got = sorted((r["year"], r["idx"]) for r in cte)
        want = sorted(fold)
        out[depth] = {
            "cte_s": cte_s,
            "fold_s": fold_s,
            "per_step_cte_s": round(cte_s / depth, 4),
            "agree": got == want,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
