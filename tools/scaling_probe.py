"""Scaling probe: measure wall-time growth from sf0.1 to a synthetic
8× corpus, per representative operator family.

The driver's bench answers "how fast at sf0.1"; this tool answers the
100 TB question the design claims to satisfy: does wall time grow
(sub-)linearly with data on the same plan? It upscales the PROVIDED
sf0.1 tables (never synthesizing new distributions) by unioning K
key-offset replicas:

- fact keys (orderkey, custkey, doc_id, vec_id) offset per replica so
  joins/groups see K× distinct keys at the same per-key cardinality;
- document tokens get a per-replica suffix, so replicas are NOT
  near-duplicates of each other and the dedup workload stays
  representative (K× docs → K× shingles, not K² candidate pairs);
- embeddings keep their vectors (id-offset only) — kmeans cost is
  rows × iterations, independent of duplicate vectors.

Run: ``python tools/scaling_probe.py [K]`` (default 8). Prints one
JSON line: per-query seconds at sf0.1 and at K×, plus the ratio.
A ratio ≤ K means at-worst-linear scaling (fixed overhead usually
pulls it under); a ratio ≫ K is a scale bug.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from dfx_indicators_etl_spark.plans import QUERIES  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402
from dfx_indicators_etl_spark.sources import read_table  # noqa: E402

import os

BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")

# query → tables it reads (only these get upscaled copies)
PROBES = {
    "q1_pricing_summary": ("lineitem",),
    "q6_forecast_revenue": ("lineitem",),
    "q3_shipping_priority": ("customer", "orders", "lineitem"),
    "q_events_daily": ("events",),
    "dedup_exact": ("documents",),
    "dedup_minhash": ("documents",),
    "text_quality": ("documents",),
    "emb_kmeans": ("embeddings",),
    # round 7: LM/collocation counting + computed-rate sampling — the
    # token-suffixed replicas grow the vocab K×, so these measure the
    # vocab-sized shuffle + broadcast-freq-join story, not just scans.
    "text_pmi_bigrams": ("documents",),
    "text_bigram_logprob": ("documents",),
    "text_entropy": ("documents",),
    "sample_temperature": ("documents",),
    # round 7, late additions: robust stats + SCD2 + fuzzy dedup +
    # priority sampling + series nowcast + Pareto. Replica token
    # suffixes change document prefixes, so the levenshtein blocking
    # stays K× blocks (not K×-deep blocks) — this relies on first
    # tokens being shorter than the 16-char blocking prefix, which
    # holds for the whole sf0.1 corpus (verified: 0 of 5000 docs);
    # events replicas multiply per-user history depth
    # (window-partition growth is the point).
    "q_winsorize": ("lineitem",),
    "q_abc_analysis": ("lineitem",),  # supplier dim stays: K× per-supplier volume
    "q_scd2_intervals": ("events",),
    "ind_forecast_trend": ("events",),
    "dedup_fuzzy_levenshtein": ("documents",),
    "sample_priority": ("documents",),
    # closing additions: path analysis, RFM, changepoint, export
    "q_event_transitions": ("events",),
    "q_rfm_segmentation": ("orders",),
    "ind_changepoint_cusum": ("events",),
    "ind_series_export": ("events",),
}

# per-table key columns to offset per replica — join keys offset
# CONSISTENTLY on both sides (custkey in customer and orders) so the
# upscaled relation is a true K× instance, not a fan-out
OFFSET_KEYS = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "customer": ("c_custkey",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id",),
}

OFFSET = 1_000_000_000  # far above any sf0.1 key


def upscale(spark, table: str, k: int, out_dir: str) -> None:
    base = read_table(spark, BASE, table)
    parts = []
    for i in range(k):
        rep = base
        for key in OFFSET_KEYS.get(table, ()):
            rep = rep.withColumn(key, F.col(key) + F.lit(i * OFFSET))
        if table == "documents" and i > 0:
            # suffix every token: replicas are not near-dups of each other
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(f"r{i}")),
                    ),
                    " ",
                ),
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = Path(tempfile.mkdtemp(prefix="dfx_scale_"))
    try:
        needed = sorted({t for ts in PROBES.values() for t in ts})
        # dims the queries read but we don't upscale: copy as-is
        all_tables = (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
        for t in all_tables:
            if t in needed:
                upscale(spark, t, k, str(scratch))
            else:
                read_table(spark, BASE, t).write.mode("overwrite").parquet(
                    f"{scratch}/{t}.parquet"
                )
        results = {}
        for name in PROBES:
            fn = QUERIES[name]
            fn(spark, BASE).count()  # warm plan/JIT
            t0 = time.time()
            fn(spark, BASE).count()
            base_s = time.time() - t0
            t0 = time.time()
            fn(spark, str(scratch)).count()
            big_s = time.time() - t0
            results[name] = {
                "sf0.1_sec": round(base_s, 3),
                f"x{k}_sec": round(big_s, 3),
                "ratio": round(big_s / max(base_s, 1e-9), 2),
            }
            print(name, results[name], file=sys.stderr)
        print(json.dumps({"k": k, "probes": results}))
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
