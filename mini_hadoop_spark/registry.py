"""Central registry: every queries()/oracle_sql() pair exposed to the
driver harness.  Modules register (QUERIES, ORACLES) dicts; names must be
unique across modules."""

from __future__ import annotations

from mini_hadoop_spark.operators import (
    classifier,
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
    retrieval, compression, dq, classifier,
    relational, relational_ext, relational_tpch,
]

# The driver's correctness artifact records only the FIRST 50 entries of
# queries() in registration order.  DRIVER_WINDOW pins those 50 explicitly:
# one block from every north-star family (dedup, similarity, the
# reference-parity workloads, the streaming drains, events, temporal, skew,
# sampling, multimodal, text, retrieval, relational), and EVERY window
# entry is DuckDB-oracled, so all 50 driver slots produce
# rows+schema+hash evidence.  The 4 rows-only queries (xxhash64 dedup
# forms + agg_approx_sketches) sit PAST the window — driver-evidenced
# through their bit-identical oracled md5 twins (see COVERAGE.md).
#
# r14 ROTATION (VERDICT r13 #4): the 3 r14-new queries take first-ever
# slots on day one (classifier_holdout_confusion and
# pipeline_distilled_manifest oracled; classifier_train_prod is the
# deliberate rows-only production-geometry twin — see WINDOW_ROWS_ONLY
# below); the other 47 slots are the mechanically stalest oracled
# evidence — the ENTIRE remaining r09 cohort (44) and the 3
# alphabetically-first r10s.  After the r14 artifact no query is
# never-driver-seen and no oracled query's evidence is older than r10
# (age 4).  Computed by the exact recipe in tools/rotation_report.py;
# rotated-out queries keep running in the local oracle battery
# (tests/test_oracle_battery.py) every round.

# Never-driver-seen queries allowed to sit OUT of DRIVER_WINDOW for one
# round, each with a written rationale (tests/test_rotation_report.py
# enforces exact membership here — raw source mentions no longer count).
# r14: empty — every never-driver-seen query is in the window.
ROTATION_WAITING: tuple[str, ...] = ()

# Window entries deliberately WITHOUT a DuckDB oracle: the driver
# records a rows-only ledger row (err: no_oracle, spark_rows) — the
# same evidence class the xxhash64 dedup forms and agg_approx_sketches
# earned in r04/r05.  classifier_train_prod's corpus-dependent step
# count cannot unroll into a fixed cross-engine CTE chain; its
# correctness twin is the fully-oracled classifier_train_curve (same
# per-step plan, fixed geometry) plus the determinism/accuracy gates in
# tests/test_classifier.py.
WINDOW_ROWS_ONLY: frozenset[str] = frozenset({"classifier_train_prod"})

DRIVER_WINDOW = [
    # --- never driver-seen: r14-new ---
    "classifier_holdout_confusion",
    "classifier_train_prod",
    "pipeline_distilled_manifest",
    # --- full remaining r09 cohort ---
    "corpus_profile",
    "corr_quantity_price",
    "dedup_lsh_quality_audit",
    "dq_expectations",
    "events_decayed_engagement",
    "events_hourly_anomalies",
    "events_type_pivot",
    "join_asof_latest_order",
    "lang_id_confusion",
    "mix_domain_weights",
    "multimodal_meta",
    "nation_trade_balance",
    "ngram_pmi_top",
    "orders_cohort_retention",
    "orders_priority_sla",
    "orders_rfm_segmentation",
    "part_price_realization",
    "pipeline_pretrain_manifest",
    "q10_returned_items",
    "q13_custdist",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "q6_revenue_forecast",
    "quality_gopher_rules",
    "quantize_embeddings_int8",
    "revenue_monthly_growth",
    "set_except_all",
    "similarity_ann_recall",
    "split_train_val_test",
    "streaming_outer_join_drain",
    "supplier_concentration_hhi",
    "text_char_bigram_novelty",
    "text_length_histogram",
    "text_pack_sequences",
    "text_redact_pii",
    "text_repetition_ratio",
    "vocab_drift_top_movers",
    "vocab_oov_rate",
    "window_first_last_orders",
    "window_range_frame",
    "window_topk_with_ties",
    "wordcount",
    # --- r10 cohort head (alphabetical) ---
    "agg_filtered_counts",
    "agg_global_no_group",
    "agg_grouping_sets",
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
    unoracled = [
        n for n in DRIVER_WINDOW if n not in oracles and n not in WINDOW_ROWS_ONLY
    ]
    assert not unoracled, f"window entries without a DuckDB oracle: {unoracled}"
    phantom = [n for n in WINDOW_ROWS_ONLY if n in oracles or n not in queries]
    assert not phantom, f"WINDOW_ROWS_ONLY entries oracled or unregistered: {phantom}"

    ordered: dict = {n: queries[n] for n in DRIVER_WINDOW}
    for n, fn in queries.items():
        if n not in ordered:
            ordered[n] = fn
    return ordered, oracles


ALL_QUERIES, ALL_ORACLES = _merge()
