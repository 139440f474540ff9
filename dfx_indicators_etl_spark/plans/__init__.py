"""Query plans: each module registers named queries + DuckDB oracles."""

from .registry import ORACLES, QUERIES, query

# Importing the modules populates the registry.
from . import analytics  # noqa: E402,F401
from . import analytics_ext  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import indicator_queries  # noqa: E402,F401
from . import llmdata  # noqa: E402,F401
from . import scale_queries  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401

# The driver's CORRECTNESS gate samples the first 50 registered queries
# in insertion order. Round-12 rotation (VERDICT r11 #1): (a) the full
# 34-key r7-evidence cohort — the committed r12 queue's 23 overflow
# keys verbatim, then the 11 remaining r7 keys (ANN trio, streaming
# state, text-LM, kmeans/pq); (b) keys NEW in round 12, appended as
# they land so they never join the unstamped backlog; (c) the 49-key
# r8-evidence cohort ordered highest-signal-first (streaming joins,
# CDC/span dedup, multimodal, then the stable relational shapes) —
# everything past the 50-key boundary overflows to the r13 queue.
_DRIVER_WINDOW_PRIORITY = [
    # (a) the committed r12 queue's 23-key overflow cohort, verbatim
    "q_event_transitions",
    "q_histogram",
    "q_incremental_agg",
    "q_scd2_intervals",
    "q_snapshot_diff",
    "q_yoy_growth",
    "ind_changepoint_cusum",
    "ind_forecast_trend",
    "ind_outlier_flags",
    "ind_panel_balance",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "sample_priority",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "ind_rebase_index",
    "ind_series_export",
    "sink_compact_roundtrip",
    # (a cont.) the 11 remaining r7-evidence keys
    "sim_lsh_ann",
    "sim_ivf_ann",
    "sim_ivfpq_ann",
    "emb_kmeans",
    "emb_pq_codes",
    "stream_events_windowed",
    "stream_anomaly",
    "stream_minhash_dedup",
    "text_bigram_logprob",
    "text_entropy",
    "text_pmi_bigrams",
    # (b) new in round 12 — appended as they land
    "stream_first_touch_ttl",
    "q_rolling_reach_bitmap",
    "q_percent_rank",
    "text_hashed_ngrams",
    "ind_chained_index",
    "dedup_embedding_cosine_banded",
    "stream_rolling_reach",
    "sim_lsh_ann_multiprobe",
    "ind_fisher_chained",
    # (c) the r8-evidence cohort, highest-signal first (7 fit
    # after the nine (b) additions)
    "stream_static_enrich",
    "stream_stream_join",
    "stream_minhash_dedup_banded",
    "dedup_incremental",
    "dedup_cdc_excise",
    "dedup_cdc_chunks",
    "dedup_shared_spans",
    # --- 50-key boundary (34 + 9 new + 7): everything below
    # overflows to r13 ---
    "dedup_span_excise",
    "mm_phash_dedup",
    "mm_scene_cuts",
    "mm_audio_match",
    "text_cdc_chunks",
    "emb_knn_graph",
    "sample_temperature",
    "sink_bucketed_join",
    "ind_interpolate_years",
    "ind_seasonal_index",
    "ind_m49_dim",
    "q10_returned_item",
    "q_top_suppliers",
    "q_window_topk",
    "q_rollup",
    "q_cube",
    "q_pivot",
    "q_unpivot",
    "q_semi_join",
    "q_anti_join",
    "q_distinct_agg",
    "q_union_dedup",
    "q_orders_enriched",
    "q_correlated_scalar",
    "q_events_sessionize",
    "q_percentile",
    "q_skew_salted_agg",
    "q_grouping_sets",
    "q_window_frame",
    "q7_bilateral_volume",
    "q22_idle_customers",
    "q_sql_interface",
    "q4_priority_count",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_nation_profit",
    "q_asof_nearest",
    "q_window_range",
    "q_rfm_segmentation",
    "q_winsorize",
    "q_market_basket",
    "q_interval_overlap",
]


def _apply_driver_window_priority() -> None:
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW_PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


_apply_driver_window_priority()

__all__ = ["QUERIES", "ORACLES", "query"]
