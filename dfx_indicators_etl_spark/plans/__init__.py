"""Query plans: each module registers named queries + DuckDB oracles."""

from .registry import ORACLES, QUERIES, query

# Importing the modules populates the registry.
from . import analytics  # noqa: E402,F401
from . import analytics_ext  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import indicator_queries  # noqa: E402,F401
from . import llmdata  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401

# The driver's CORRECTNESS gate samples the first 50 registered queries
# in insertion order. Round-8 rotation (VERDICT r7 #1): (a) the 4 NEW
# round-8 keys (first driver evidence); (b) stream_minhash_dedup_banded,
# whose round-7 oracle graduation was never driver-stamped (it was left
# out of the r7 window); (c) ALL 29 keys whose latest driver evidence
# is r4 — the entire oldest cohort, retiring r4 evidence completely;
# (d) the 6 keys round 8 touched (knn vectorization + self-edge fix,
# temperature null-safe join, interpolate oracle NULL filter, the
# winsorize/rfm adaptive swaps, and dedup_incremental behind the
# compaction-lease hardening). The r5-evidence cohort retirement
# defers entirely to round 9 — every slot went to first-stamp keys
# (the 37 r5 keys lead the round-9 rotation: ind_standardize,
# ind_observation_view,
# ind_combine_dimensions, ind_melt,
# ind_country_map,
# ind_country_filter,
# ind_year_filter, ind_dedup_first,
# ind_insert_ignore,
# ind_metadata_dedup, ind_value_stats,
# ind_validate, q_events_daily,
# q_asof_join, q_skew_salted_join, q_time_rollup, q_funnel_conversion,
# q_retention_cohort, q_session_window_native, q_custom_agg_geomean,
# q_table_profile, q11_important_stock, text_tfidf, text_chunk,
# text_pack_bins, emb_int8_quantize, stream_dedup, stream_sessionize,
# sink_schema_evolution, sink_orc_roundtrip, q_approx_distinct,
# q_approx_percentile, q_hll_sketch, q_triangle_count,
# ind_indicator_format, ind_pipeline_e2e, q_range_join).
# Exactly 50 keys precede the boundary comment.
_DRIVER_WINDOW_PRIORITY = [
    # (a) new in round 8 — 14 keys
    "mm_phash_dedup",
    "sink_bucketed_join",
    "q_market_basket",
    "ind_seasonal_index",
    "dedup_cdc_excise",
    "mm_scene_cuts",
    "mm_audio_match",
    "mm_video_dedup",
    "q_interval_overlap",
    "text_cdc_chunks",
    "dedup_cdc_chunks",
    "dedup_shared_spans",
    "dedup_span_excise",
    "ind_m49_dim",
    # (b) r7-graduated oracle, never driver-stamped
    "stream_minhash_dedup_banded",
    # (c) the full r4-evidence cohort — 29 keys
    "q10_returned_item",
    "q_top_suppliers",
    "q_unpivot",
    "q_window_range",
    "q_window_topk",
    "q_pivot",
    "q_rollup",
    "q_semi_join",
    "q_cube",
    "q_distinct_agg",
    "q_anti_join",
    "q_union_dedup",
    "q_orders_enriched",
    "q_percentile",
    "q_skew_salted_agg",
    "q_sql_interface",
    "q_window_frame",
    "stream_static_enrich",
    "stream_stream_join",
    "q_events_sessionize",
    "q_grouping_sets",
    "q_correlated_scalar",
    "q_asof_nearest",
    "q7_bilateral_volume",
    "q9_nation_profit",
    "q8_market_share",
    "q6_forecast_revenue",
    "q4_priority_count",
    "q22_idle_customers",
    # (d) implementation touched in round 8 — 6 keys
    "emb_knn_graph",
    "sample_temperature",
    "ind_interpolate_years",
    "q_winsorize",
    "q_rfm_segmentation",
    "dedup_incremental",
    # --- window boundary: exactly 50 keys above this line ---
    # fresher keys follow in registration order
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
