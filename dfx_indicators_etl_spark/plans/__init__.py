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
# in insertion order. Round-13 rotation (VERDICT r12 #1): (a) the
# 42-key r8-evidence overflow cohort — the committed r13 queue's
# ordering verbatim (highest-signal multimodal/CDC/graph keys first,
# then the stable relational block); (b) keys NEW in round 13,
# appended as they land so they never join the unstamped backlog;
# (c) the r9-evidence cohort fills whatever window room remains —
# everything past the 50-key boundary overflows to the r14 queue.
_DRIVER_WINDOW_PRIORITY = [
    # (a) the committed r13 queue's 42-key r8-evidence cohort, verbatim
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
    # (b) new in round 13 — appended as they land
    "emb_pca_cov",
    "ind_chained_index_monthly",
    # --- 50-key boundary (42 + 2 new + 6): keys below overflow ---
    # (c) the r9-evidence cohort fills the remaining window room,
    # highest-signal first (streaming state, graph, sketch trio,
    # then the indicator-model block). Each new (b) key pushes the
    # tail of this block past the boundary into the r14 queue.
    "stream_dedup",
    "stream_sessionize",
    "stream_late_data",
    "q_asof_join",
    "q_skew_salted_join",
    "q_time_rollup",
    "q_range_join",
    "q_triangle_count",
    "q_bfs_hops",
    "q_cheapest_path",
    "q_dpp_prune",
    "q_bloom_prefilter_join",
    "mm_video_dedup",
    "mm_phash_dedup_256",
    "mm_audio_landmarks",
    "mm_scene_signatures",
    "sink_schema_evolution",
    "sink_orc_roundtrip",
    "text_tfidf",
    "text_chunk",
    "text_pack_bins",
    "emb_int8_quantize",
    "q_events_daily",
    "q_approx_distinct",
    "q_approx_percentile",
    "q_hll_sketch",
    "q11_important_stock",
    "q_funnel_conversion",
    "q_retention_cohort",
    "q_session_window_native",
    "q_custom_agg_geomean",
    "q_table_profile",
    "q_abc_analysis",
    "q_bitmap_distinct",
    "q_cumulative_distinct",
    "q_ks_drift",
    "ind_standardize",
    "ind_observation_view",
    "ind_combine_dimensions",
    "ind_melt",
    "ind_country_map",
    "ind_country_filter",
    "ind_year_filter",
    "ind_dedup_first",
    "ind_insert_ignore",
    "ind_metadata_dedup",
    "ind_validate",
    "ind_indicator_format",
    "ind_value_stats",
    "ind_pipeline_e2e",
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
