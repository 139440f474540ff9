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
# in insertion order. Round-6 rotation (VERDICT r5 directive 3): (a)
# the full 32-key cohort whose latest driver evidence is r3 — after
# this round no key's evidence is older than r4; (b) every key whose
# implementation is touched in round 6 (streaming ops advice fixes,
# k-means seeding/partial-combine rework and the ANN/PQ stack built on
# its codebooks, the q2 join strategy) — fresh evidence over fresh
# code; (c) the oldest r4-evidenced keys fill the remaining slots.
# Exactly 50 keys precede the boundary comment.
_DRIVER_WINDOW_PRIORITY = [
    # (a) latest green row is r3 — 32 keys
    "ind_star_series",
    "ind_star_observation",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_scrub_pii",
    "text_repetition",
    "text_decontaminate",
    "text_unigram_logprob",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_word_vocab",
    "text_quality_filter",
    "sim_bruteforce_topk",
    "sample_stratified",
    "sample_train_test",
    "emb_l2_norm",
    "emb_label_centroids",
    "q_pagerank_nations",
    "q12_priority_class",
    "mm_decode_stub",
    "mm_resize_stub",
    "mm_frame_sample",
    "sink_versioned_roundtrip",
    "sink_partitioned_roundtrip",
    "sink_csv_roundtrip",
    "sink_jsonl_roundtrip",
    "stream_incremental_sink",
    # (b) implementation touched in round 6 — 11 keys
    "stream_anomaly",
    "stream_upsert_sink",
    "stream_minhash_dedup_banded",
    "emb_kmeans",
    "emb_pca",
    "emb_pq_codes",
    "sim_ivf_ann",
    "sim_ivfpq_ann",
    "sim_lsh_ann",
    "q2_min_cost_supplier",
    "ind_upsert",
    # (c) NEW surface added in round 6 (no driver row exists yet) — 4
    "dedup_containment",
    "sample_weighted",
    "text_heavy_hitters",
    "stream_topk",
    # (c2) re-implemented in round 6 (sign-projection oracle) — 1
    "emb_random_projection",
    # (d) oldest r4 evidence — 2 keys fill the window
    "q1_pricing_summary",
    "q3_shipping_priority",
    # --- window boundary: exactly 50 keys above this line ---
    # r4/r5-green keys follow in registration order (fresh evidence)
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
