"""Central registry: every queries()/oracle_sql() pair exposed to the
driver harness.  Modules register (QUERIES, ORACLES) dicts; names must be
unique across modules."""

from __future__ import annotations

from mini_hadoop_spark.operators import (
    clustering,
    compression,
    dedup,
    dq,
    events,
    multimodal,
    relational,
    relational_ext,
    relational_tpch,
    retrieval,
    sampling,
    similarity,
    skew,
    temporal,
    text_analysis,
    text_scoring,
)
from mini_hadoop_spark.streaming import windowed as streaming_windowed
from mini_hadoop_spark.workloads import parity

_MODULES = [
    dedup, similarity, parity, streaming_windowed, events, temporal, skew,
    sampling, multimodal, text_analysis, text_scoring, clustering,
    retrieval, compression, dq,
    relational, relational_ext, relational_tpch,
]

# The driver's correctness artifact records only the FIRST 50 entries of
# queries() in registration order.  DRIVER_WINDOW pins those 50 explicitly:
# one block from every north-star family (dedup, similarity, the
# reference-parity workloads, the streaming drains, events, temporal, skew,
# sampling, multimodal, text, retrieval, relational), and — as of r6 —
# EVERY window entry is DuckDB-oracled, so all 50 driver slots produce
# rows+schema+hash evidence.  The xxhash64-based entries with no DuckDB
# twin (dedup_minhash_lsh, dedup_simhash, dedup_clusters_lsh,
# similarity_ann_lsh, similarity_ann_ivf) sit PAST the window — the
# MinHash family is driver-evidenced through its bit-identical md5 twin
# (dedup_minhash_lsh_md5), and the xxhash64 forms stay recall/determinism
# pytest-gated.  tfidf_top_terms / bm25_search / window_cume_dist /
# customer_segment_value are promoted in their place (the latter two are
# the r5 relational_ext additions that had never appeared in a driver
# artifact — ADVICE r5).  Everything outside the window runs in the local
# oracle battery (tests/test_oracle_battery.py) every round.
DRIVER_WINDOW = [
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_incremental",
    "dedup_histogram",
    "dedup_funnel_report",
    "contamination_ngram",
    "dedup_near_jaccard",
    "dedup_minhash_lsh_md5",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "graph_triangle_count",
    "similarity_topk_brute",
    "similarity_ann_lsh",
    "embedding_norm_stats",
    "embedding_label_centroids",
    "centroid_classify_eval",
    "wordcount",
    "wordcount_strict",
    "pagerank_2iter",
    "streaming_hourly_drain",
    "streaming_session_drain",
    "events_gap_quantiles",
    "events_type_transitions",
    "events_first_touch_attribution",
    "events_hourly_window",
    "events_funnel",
    "events_dau_wau",
    "events_sessionization",
    "events_session_window",
    "events_type_value_stats",
    "events_weekly_retention",
    "join_asof_latest_order",
    "join_asof_next_order",
    "join_asof_recent_order",
    "join_range_event_followups",
    "agg_salted_skew",
    "join_salted_skew",
    "skew_heavy_hitters",
    "split_train_val_test",
    "sample_stratified_per_lang",
    "sample_weighted_mix",
    "multimodal_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_payload_dedup",
    "text_token_stats",
    "tfidf_top_terms",
    "bm25_search",
    "window_cume_dist",
    "customer_segment_value",
]


def _merge() -> tuple[dict, dict]:
    queries: dict = {}
    oracles: dict = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {mod.__name__}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in mod.QUERIES:
                raise ValueError(f"oracle {name!r} in {mod.__name__} has no query")
            oracles[name] = sql

    assert len(DRIVER_WINDOW) == 50, f"window must be 50, got {len(DRIVER_WINDOW)}"
    assert len(set(DRIVER_WINDOW)) == 50, "duplicate names in DRIVER_WINDOW"
    missing = [n for n in DRIVER_WINDOW if n not in queries]
    assert not missing, f"window names not registered: {missing}"
    unoracled = [n for n in DRIVER_WINDOW if n not in oracles]
    assert not unoracled, f"window entries without a DuckDB oracle: {unoracled}"

    ordered: dict = {n: queries[n] for n in DRIVER_WINDOW}
    for n, fn in queries.items():
        if n not in ordered:
            ordered[n] = fn
    return ordered, oracles


ALL_QUERIES, ALL_ORACLES = _merge()
