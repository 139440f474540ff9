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
    # r15 (VERDICT r14 #6): the banded self-join dedup family — verify
    # band-bucket sizes stay bounded as the corpus grows (guide §3 join
    # explosion). Replica token-suffixing keeps replicas non-duplicate,
    # so K× docs must cost ~K× (bounded buckets), not K².
    "dedup_simhash": ("documents",),
    "dedup_containment": ("documents",),
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
    # round 8: perceptual-hash banding + positioned-shingle span ops.
    # Token suffixes keep replicas from being near-dups of each other,
    # so candidate volume grows with docs (K× buckets), not pairs (K²).
    "mm_phash_dedup": ("documents",),
    "dedup_shared_spans": ("documents",),
    "dedup_span_excise": ("documents",),
    # round 8, late: AV fake-codec analytics. Scene cuts is a narrow
    # explode + per-video window (linear is the bound to beat); audio
    # match's candidate volume is Σc² over capped fingerprint counts —
    # suffixed replicas share few windows, so candidates grow ~K×
    # (each replica matching its own clipped variant), not K².
    "mm_scene_cuts": ("documents",),
    "mm_audio_match": ("documents",),
    # events replicas multiply temporal density K× at fixed span, so
    # candidate pairs (and output) grow ~K²/K… measured to verify the
    # bin join tracks density, not n·m
    "q_interval_overlap": ("events",),
    # CDC chunking is a narrow per-doc pass (linear bound); the pair
    # key adds the freq-capped chunk_sha inverted index
    "text_cdc_chunks": ("documents",),
    "dedup_cdc_chunks": ("documents",),
    "mm_video_dedup": ("documents",),
    # basket self-join volume is per-basket-width-bounded; replicas
    # add K× baskets of the same width
    "q_market_basket": ("lineitem",),
    "dedup_cdc_excise": ("documents",),
    # round 9: wider phash grid (same banding machinery, 8×32-bit
    # keys), landmark-pair audio (peak windows + composite-key index),
    # scene-signature partial-copy (per-doc distinct triples, capped
    # index), and the adaptive Pareto swap already probed via
    # q_abc_analysis above
    "mm_phash_dedup_256": ("documents",),
    "mm_audio_landmarks": ("documents",),
    "mm_scene_signatures": ("documents",),
    # round 9, late: bitmap rollup + KS drift are pure combinable-agg
    # shapes (linear bound); the bloom prefilter measures build+probe
    # at K× fact and K× key-set; DPP measures the partitioned write +
    # pruned scan; z-order measures the range-partition sorted write;
    # CC-star measures the edge-rewrite loop on K× docs (suffixed
    # replicas keep the pair graph K× edges, not K²)
    "q_bitmap_distinct": ("events",),
    "q_ks_drift": ("events",),
    "q_bloom_prefilter_join": ("orders", "lineitem"),
    "q_dpp_prune": ("events",),
    "sink_zorder_layout": ("lineitem",),
    "dedup_cc_largestar": ("documents",),
    # round 9, closing: per-user window pass (attribution), distinct
    # (user,week) reduction (growth), rank-free running-sum Gini, and
    # the BLAS MIPS top-k (replicas multiply corpus rows; query set
    # fixed at 10)
    "q_attribution": ("events",),
    "q_growth_accounting": ("events",),
    "q_gini": ("lineitem",),
    "sim_mips_topk": ("embeddings",),
    # robust stats twin: panel-cardinality percentile aggregates
    "ind_outlier_mad": ("events",),
    # skyline: fact reduces to entities; window over distinct revenue
    "q_skyline": ("lineitem",),
    # gains table: per-user reduction + global_ntile rank
    "q_gains_lift": ("events",),
    # round 10: weighted histogram percentiles (distinct-value-sized
    # shuffle), fixed-spine PSI (pure map-side counts — the linear
    # floor is the bound to beat), bitmap AND-merge retention (word
    # log is (week,bucket)-sized; replicas multiply buckets, and the
    # offset user ids keep per-week user sets K×, not denser)
    "q_weighted_percentile": ("lineitem",),
    "q_psi_drift": ("events",),
    "q_bitmap_retention": ("events",),
    # power-of-two decay: narrow map + per-user combinable agg
    "q_decayed_engagement": ("events",),
    # phash pair graph + star contraction; suffixed replicas keep the
    # pair graph K× edges, not K²
    "mm_phash_clusters": ("documents",),
    # cosine clusters: exact pair stage is O(n²) BY DESIGN at demo
    # scale (the ANN stack is the scale path) — probe documents the
    # quadratic pair stage honestly rather than hiding it
    "emb_cosine_clusters": ("embeddings",),
    # round 11: the CAPPED phash face (same banded machinery, bucket
    # cap active — the production mode), MRL truncation (narrow map,
    # linear floor), Zipf fit (vocab-sized combinable shuffle + a
    # 200-row bounded tail), and streaming SCD2's batch face is
    # covered via q_scd2_intervals above (same change-capture window)
    "mm_phash_dedup_capped": ("documents",),
    "emb_matryoshka": ("embeddings",),
    "text_zipf_fit": ("documents",),
    # round 11, late: LOCF panel fill (per-series lead + explode — the
    # interpolate shape), windowless mode (two combinable agg levels),
    # stickiness (two distinct-count reductions)
    "ind_locf_fill": ("events",),
    "q_mode_category": ("customer", "orders"),
    "q_user_stickiness": ("events",),
    # round 11, second/third batch: HHI (two combinable agg levels,
    # zero windows — linear bound), streaks (distinct-day collapse
    # dominates; replicas share ts so the post-distinct frame is
    # flat), Lorenz (per-customer reduce + global_ntile at K×
    # customers), calendar spine (fact agg then broadcast-sized
    # frames), vocab stats (vocab-sized combinable shuffle), dim
    # stats (posexplode + d-key agg), first-touch (the 'first' carry,
    # same per-user window shape as q_attribution above), JSON
    # extraction (narrow codegen map + 5-group agg), entity split
    # (pure map + distinct-count agg)
    "q_hhi": ("lineitem",),
    "q_streaks": ("events",),
    "q_lorenz": ("orders",),
    "q_calendar_spine": ("orders",),
    "text_vocab_stats": ("documents",),
    "emb_dim_stats": ("embeddings",),
    "q_first_touch": ("events",),
    "q_json_props": ("events",),
    "sample_entity_split": ("events",),
    # path analysis (per-user rank window then 5-row-bounded frames;
    # path space is bounded by type-alphabet^5, never corpus-sized)
    # and centroid-distance outliers (d×labels broadcast + TakeOrdered)
    "q_funnel_paths": ("events",),
    "emb_outlier_dist": ("embeddings",),
    # vintage splice: two year-grain combinable panels + a
    # series-cardinality ratio broadcast; zero windows
    "ind_splice": ("events",),
    # purchase cadence: adaptive grouped_lag + one combinable agg
    "q_order_gaps": ("orders",),
    # skeleton dedup: one narrow normalize + sha groupBy (the
    # dedup_exact shape); new-vs-returning: two first-occurrence
    # aggregates + a user-grain co-partitioned self-join
    "dedup_templates": ("documents",),
    "q_new_vs_returning": ("events",),
    # sweep line at 2x events through global_running_sum's adaptive
    # route; cohort LTV is two combinable reductions + a
    # calendar-bounded per-cohort window
    "q_peak_concurrency": ("events",),
    "q_cohort_ltv": ("orders",),
    # vocab coverage: vocab-sized count shuffle + three TakeOrdered
    # folds; YTD: combinable monthly sums + <=12-row frames
    "text_vocab_coverage": ("documents",),
    "ind_ytd": ("events",),
    # rolling WAU: bounded 7x explode of the user-day frame + one
    # two-phase distinct count
    "q_rolling_wau": ("events",),
    # price indices: part-year unit-value reduce + a partkey
    # co-partitioned self-join; elasticity: five combinable moments
    "ind_price_index": ("lineitem",),
    "q_discount_elasticity": ("lineitem",),
    # round 12: bitmap rolling reach (day×bucket word explosion —
    # K× users grows buckets K×, days fixed); percent_rank
    # (bucket-grain histogram + adaptive cumulative); hashed-bigram
    # featurizer (suffixed replicas grow the gram space K×);
    # chained index (links stay year-grain — wall should be FLAT);
    # TTL attribution drain; the banded pair generator (bucketize +
    # within-bucket matmuls — the scale path itself)
    "q_rolling_reach_bitmap": ("events",),
    "q_percent_rank": ("orders",),
    "text_hashed_ngrams": ("documents",),
    "ind_chained_index": ("lineitem",),
    "stream_first_touch_ttl": ("events",),
    "dedup_embedding_cosine_banded": ("embeddings",),
    # round 13: streaming rolling reach (stateful word CRDT — state is
    # day×bucket words, K× users grows buckets K×); Fisher chain
    # (year-grain links — flat like ind_chained_index); exact PCA
    # covariance partials (one Arrow pass, d²-bounded output)
    "stream_rolling_reach": ("events",),
    "ind_fisher_chained": ("lineitem",),
    "emb_pca_cov": ("embeddings",),
    # the long-chain face: K× lineitem grows the monthly baskets,
    # the ~82-link fold stays milliseconds — wall should be ~flat
    "ind_chained_index_monthly": ("lineitem",),
    # round 14: the CMS heavy hitters — suffixed replicas grow the
    # vocab K× while the sketch stays d×w cells and the candidate set
    # stays sample-sized: the probe measures that the shuffle stays
    # BOUNDED while the scan grows linearly (the sketch's whole claim)
    "q_cms_heavy_hitters": ("documents",),
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


def skew_probe(spark, k: int) -> dict:
    """Hot-key stress probe (VERDICT r7 #10): a deliberately 80%-skewed
    join key at K×, salted vs unsalted, with AQE's skew-join splitter
    on and off — the measured number behind SCALE.md §4's skew claim.

    The fact is the K×-upscaled events table with ``user_mod = 0`` for
    80% of rows (the hot key) and a 1..999 spread otherwise; the dim
    has one row per key. Broadcast is disabled for the probe (a
    broadcastable dim is skew-immune anyway — the explicit tools exist
    for the shuffle-join regime). groupBy skew is probed too, mostly to
    document that map-side partial aggregation already absorbs it.
    """
    from dfx_indicators_etl_spark.operators.scale import salted_agg, salted_join

    # events sf0.1 is 100k rows — far too small for skew to bite, even
    # ×8. Amplify to k×100k×16 rows (12.8M at k=8) via an explode
    # multiplier so the hot key's partition is genuinely task-crushing
    # (~10M rows through ONE reducer unsalted).
    amplify = 16
    fact = read_table(spark, BASE, "events").select("event_id", "user_id")
    parts = []
    for i in range(k):
        parts.append(
            fact.withColumn("event_id", F.col("event_id") + F.lit(i * OFFSET))
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(amplify - 1).cast("long"))
        ).alias("rep"),
    ).withColumn("event_id", F.col("event_id") * amplify + F.col("rep"))
    skewed = big.withColumn(
        "user_mod",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(5)) < 4, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("event_id", F.lit(1)), F.lit(999)) + 1),
    ).localCheckpoint()  # materialize once; probe joins, not the build
    dim = spark.range(0, 1000).select(
        F.col("id").cast("long").alias("user_mod"),
        F.concat(F.lit("seg_"), F.col("id")).alias("segment"),
    ).localCheckpoint()

    def timed(fn):
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    out = {}
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # warm both plan shapes once: codegen/JIT compile would
        # otherwise land entirely on the first timed variant
        skewed.join(dim, "user_mod").select("segment").count()
        salted_join(
            skewed, dim, "user_mod", salt_buckets=16, salt_on="event_id"
        ).select("segment").count()
        for skew_join in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_join)
            plain = timed(
                lambda: skewed.join(dim, "user_mod").select("segment").count()
            )
            salted = timed(
                lambda: salted_join(
                    skewed, dim, "user_mod", salt_buckets=16,
                    salt_on="event_id",
                ).select("segment").count()
            )
            out[f"join_aqe_skew_{skew_join}"] = {
                "plain_sec": plain,
                "salted_sec": salted,
                "speedup": round(plain / max(salted, 1e-9), 2),
            }
        plain_agg = timed(
            lambda: skewed.groupBy("user_mod")
            .agg(F.sum("user_id").alias("s"))
            .count()
        )
        salted_agg_s = timed(
            lambda: salted_agg(
                skewed, ["user_mod"], {"s": ("sum", "user_id")},
                salt_buckets=16, salt_on="event_id",
            ).count()
        )
        out["agg"] = {
            "plain_sec": plain_agg,
            "salted_sec": salted_agg_s,
            "speedup": round(plain_agg / max(salted_agg_s, 1e-9), 2),
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    return out


def main() -> int:
    """``python tools/scaling_probe.py [K] [key ...]`` — with keys
    given, probe only those PROBES entries and skip the skew probe
    (targeted re-measurement of a new operator family)."""
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2:]
    probes = {n: PROBES[n] for n in only} if only else PROBES
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = Path(tempfile.mkdtemp(prefix="dfx_scale_"))
    try:
        needed = sorted({t for ts in probes.values() for t in ts})
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
        for name in probes:
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
        skew = None if only else skew_probe(spark, k)
        if skew is not None:
            print("skew", skew, file=sys.stderr)
        print(json.dumps({"k": k, "probes": results, "skew": skew}))
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
