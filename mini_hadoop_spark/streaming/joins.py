"""Stream-stream joins: the watermarked interval join that completes
the streaming surface (windowed agg + session windows + stateful dedup
live in the sibling modules; the reference has NO streaming at all —
SURVEY.md §2.3, extension surface).

``stream_interval_join`` joins two event-time streams on an equi-key
plus a bounded time range — "every error within N minutes after a
click by the same user".  The range bound is NOT optional decoration:
Spark uses (watermark + range) to compute how long each side's rows
must be buffered, so state is O(rows inside the watermark+gap horizon)
per key, evicted continuously.  An unbounded-condition stream-stream
join would require infinite state and is rejected by the engine.

This is the INCREMENTAL twin of the batch binned range join
(operators/temporal.py::range_join_binned): same pair semantics
(right_ts in [left_ts, left_ts + gap]), maintained continuously
instead of recomputed — the stream/batch pair mirrors how the
windowed-agg and sessionization operators each shadow an
oracle-checked batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap_sec: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Equi-key + interval join of two streams: pairs where
    ``right_ts ∈ [left_ts, left_ts + max_gap_sec]`` for the same key.

    Both sides get event-time watermarks (required for state cleanup);
    the time-range predicate bounds the join buffer.  Column contract
    (validated up front): both sides carry ``key``; apart from it the
    two schemas must be DISJOINT — in particular ``left_ts`` and
    ``right_ts`` must be different names (pre-rename with
    ``withColumnRenamed``), otherwise the join condition and the output
    columns would be ambiguous.

    Works identically on batch frames (plain range join) — the tests
    exploit that for stream-vs-batch parity."""
    if left.isStreaming != right.isStreaming:
        raise ValueError("stream_interval_join requires both sides streaming (or both batch)")
    for side, df, ts in (("left", left, left_ts), ("right", right, right_ts)):
        if key not in df.columns:
            raise ValueError(f"{side} side is missing key column {key!r}")
        if ts not in df.columns:
            raise ValueError(f"{side} side is missing timestamp column {ts!r}")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"left/right schemas must be disjoint apart from {key!r}; "
            f"shared columns {sorted(overlap)} would be ambiguous — rename them first"
        )
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    rk = f"_r_{key}"
    r = r.withColumnRenamed(key, rk)
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
    )
    return l.join(r, cond, how).drop(rk)


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str, how: str = "left"
) -> DataFrame:
    """Stream-STATIC join: enrich a stream with a batch dimension table.

    Unlike the stream-stream case, the static side needs no watermark
    and holds no join state — each micro-batch plans a fresh join
    against the dimension (picking up storage-level updates between
    batches), and a small dimension broadcasts, so the stream is never
    shuffled at all.  This is the dimension-enrichment pattern ("attach
    the user's segment to every event"): the streaming counterpart of
    the batch broadcast-dim joins in the relational battery."""
    if not stream.isStreaming:
        raise ValueError("stream_static_enrich expects a streaming left side")
    if dim.isStreaming:
        raise ValueError("the dimension side must be a static (batch) frame")
    return stream.join(
        F.broadcast(dim), stream[stream_key] == dim[dim_key], how
    ).drop(dim[dim_key])


CLICK_ERROR_GAP_SEC = 1800  # errors within 30 minutes of a click


def clicks_with_errors(events: DataFrame, gap_sec: int = CLICK_ERROR_GAP_SEC) -> DataFrame:
    """Concrete pipeline: for every click, the same user's error events
    within the next ``gap_sec`` seconds — the funnel/debug primitive
    ("which clicks preceded an error?").  Two filtered branches of ONE
    events stream self-join; output one row per (click, error) pair."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    return stream_interval_join(
        clicks,
        errors,
        key="user_id",
        left_ts="click_ts",
        right_ts="error_ts",
        max_gap_sec=gap_sec,
    ).select("user_id", "click_id", "click_ts", "error_id", "error_ts")


JOIN_WATERMARK_SEC = 3600  # event-time watermark both join drains use


def clicks_with_errors_outer(
    events: DataFrame, gap_sec: int = CLICK_ERROR_GAP_SEC
) -> DataFrame:
    """LEFT OUTER variant of :func:`clicks_with_errors`: every (click,
    error-within-gap) pair PLUS one null-error row per click whose match
    window expired with no error — the "clicks that never led to an
    error" funnel complement, produced incrementally.

    This exercises the one interval-join behavior the inner form can't:
    WATERMARK-DRIVEN NULL EMISSION.  A buffered click emits its null row
    only when the event-time watermark proves no future error can match:
    watermark > click_ts + gap, where the GLOBAL watermark is the min
    over the two branch operators (each tracks its own branch's max
    event time), i.e. click_ts < min(max click_ts, max error_ts) −
    watermark_delay − gap on a drained input.  Clicks newer than that horizon
    stay buffered (no row), which is exactly what the batch oracle
    encodes: matched pairs unconditionally, null rows only for unmatched
    clicks older than the expiry horizon.  Boundary equality
    (click_ts == horizon) is measure-zero with microsecond timestamps;
    cross-SF parity is pinned in tests/test_streaming.py."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    return stream_interval_join(
        clicks,
        errors,
        key="user_id",
        left_ts="click_ts",
        right_ts="error_ts",
        max_gap_sec=gap_sec,
        watermark=f"{JOIN_WATERMARK_SEC} seconds",
        how="left_outer",
    ).select("user_id", "click_id", "click_ts", "error_id", "error_ts")
