"""Stateful streaming operators: session windows and first-seen dedup.

The reference has NO streaming (SURVEY.md §2.3); this is extension
surface for the 100 TB/day pipeline story:

* ``streaming_sessionization`` — the INCREMENTAL twin of the batch
  gaps-and-islands query (operators/events.py::events_sessionization),
  expressed with Spark's native ``session_window`` so Catalyst maintains
  per-user session state with watermark eviction — no custom state code
  for a problem the engine already owns.
* ``streaming_dedup_first_seen`` — a genuinely CUSTOM stateful operator
  (``applyInPandasWithState``): emit only the first occurrence of each
  key, suppress repeats, evict key state via event-time timeout once the
  watermark passes last-seen + TTL.  This is streaming exact-dedup — the
  streaming member of the dedup operator family (operators/dedup.py) —
  and the pattern to copy for any operator session_window can't express.

Scale posture: both operators shuffle once on their grouping key and
hold O(active keys) state bounded by the watermark/TTL eviction; no
driver-side state, no unbounded buffers.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP = "30 minutes"  # matches operators/events.py SESSION_GAP_SEC
DEDUP_TTL_MS = 24 * 3600 * 1000  # key state lives 24h past last sighting


def streaming_sessionization(
    events: DataFrame, gap: str = SESSION_GAP, watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session aggregation over a stream (or batch) frame.

    ``session_window(ts, gap)`` merges events separated by < gap into one
    window whose close is finalized once the watermark passes; state is
    evicted at finalization.  Output matches the batch twin's per-session
    stats: (user_id, session_start, session_end, n_events, duration_sec).
    """
    sw = F.session_window("ts", gap)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(sw.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1_000_000)).alias(
                "duration_raw"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.round("duration_raw", 6).alias("duration_sec"),
        )
    )


DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("first_ts", TimestampType()),
        StructField("n_suppressed", LongType()),
    ]
)

# state: first-seen micros, last-seen micros, suppressed count
DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_suppressed", LongType()),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key state transition (runs as an Arrow-batched Pandas UDF).

    First sighting emits one row immediately (so downstream sees the key
    with no latency); repeats only bump a suppressed-counter in state;
    the event-time timeout fires once the watermark passes last-seen +
    TTL, evicting the key (a later re-arrival counts as first-seen
    again — the standard TTL-dedup contract).
    """
    if state.hasTimedOut:
        state.remove()
    else:
        first_us, last_us, n_sup = state.get if state.exists else (None, None, 0)
        # Fold ALL Arrow chunks of this micro-batch into (min, max, n)
        # BEFORE deciding what to emit: a hot key's batch arrives as
        # several pdfs with no time ordering across them, so emitting
        # from the first chunk alone would report the wrong first_ts and
        # undercount same-batch repeats.
        batch_min = batch_max = None
        batch_n = 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> us
            lo, hi = int(ts_us.min()), int(ts_us.max())
            batch_min = lo if batch_min is None else min(batch_min, lo)
            batch_max = hi if batch_max is None else max(batch_max, hi)
            batch_n += len(ts_us)

        emit = []
        if batch_n:
            if first_us is None:
                # first sighting: emit immediately; repeats inside the same
                # micro-batch are already suppressed (counted, not emitted)
                first_us, last_us = batch_min, batch_max
                n_sup = batch_n - 1
                emit.append((key[0], pd.Timestamp(batch_min, unit="us"), n_sup))
            else:
                n_sup += batch_n
                last_us = max(last_us, batch_max)
        state.update((first_us, last_us, n_sup))
        state.setTimeoutTimestamp(last_us // 1000 + DEDUP_TTL_MS)  # ms epoch
        if emit:
            yield pd.DataFrame(emit, columns=["key", "first_ts", "n_suppressed"])


def streaming_dedup_first_seen(df: DataFrame, key_col: str, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: one output row per distinct ``key_col``
    value (its first sighting), with per-key state evicted by event-time
    TTL — ``applyInPandasWithState`` because no built-in aggregation can
    both emit-on-first and keep/evict per-key state.

    Requires a ``ts`` timestamp column; set the watermark that bounds
    late data AND drives state eviction.
    """
    keyed = df.withWatermark("ts", watermark).select(F.col(key_col).alias("key"), "ts")
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_dedup_native(df: DataFrame, key_col: str, watermark: str = "1 hour") -> DataFrame:
    """Built-in-first streaming dedup: ``dropDuplicatesWithinWatermark``
    keeps the first row per key and lets the engine own the state store
    and watermark-driven eviction — ZERO custom state code.

    Use this when "first row per key, state retained for the watermark
    horizon" is the whole requirement; reach for
    ``streaming_dedup_first_seen`` only when you need its extras (the
    suppressed-repeat count, an eviction TTL decoupled from the
    watermark).  Both shuffle once on the key and hold O(active keys)
    state; the built-in's state rows are smaller (no user struct)."""
    return (
        df.withWatermark("ts", watermark)
        .select(F.col(key_col).alias("key"), "ts")
        .dropDuplicatesWithinWatermark(["key"])
        .withColumnRenamed("ts", "first_ts")
    )
