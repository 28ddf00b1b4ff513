"""Structured Streaming tests: the watermarked windowed aggregation
must, after draining a closed input with availableNow, produce exactly
the batch windowed aggregation over the same events (stream-batch
consistency — the property that makes the streaming operator
trustworthy as an incremental view of the oracle-checked batch query).
"""

from __future__ import annotations

import shutil
import uuid

import pytest

from tests.conftest import SF_DIR


@pytest.fixture
def events_dir(tmp_path):
    """readStream needs a directory of parquet files; the driver ships a
    single file — stage it into a tmp dir (two copies = two files, to
    exercise multi-file listing; dedup by event_id is NOT expected:
    counts simply double)."""
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_matches_batch_window_agg(spark, events_dir):
    from pyspark.sql import functions as F

    from mini_hadoop_spark.sources.catalog import load_table
    from mini_hadoop_spark.streaming.windowed import (
        read_events_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )

    table = f"stream_out_{uuid.uuid4().hex[:8]}"
    stream = windowed_event_counts(read_events_stream(spark, events_dir))
    run_stream_to_memory(stream, table)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table(table).collect()
    }

    batch = windowed_event_counts(load_table(spark, SF_DIR, "events"))
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert got == want
    assert got, "stream should emit at least one window"


def test_stream_incremental_two_batches(spark, tmp_path):
    """Adding a second file and re-draining must fold the new rows into
    the same windows (incremental maintenance, not recompute-and-differ)."""
    from mini_hadoop_spark.streaming.windowed import (
        read_events_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )

    d = tmp_path / "events_inc"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "a.parquet")

    t1 = f"inc1_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(windowed_event_counts(read_events_stream(spark, str(d))), t1)
    n1 = {(r.window_start, r.event_type): r.n_events for r in spark.table(t1).collect()}

    shutil.copy(f"{SF_DIR}/events.parquet", d / "b.parquet")
    t2 = f"inc2_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(windowed_event_counts(read_events_stream(spark, str(d))), t2)
    n2 = {(r.window_start, r.event_type): r.n_events for r in spark.table(t2).collect()}

    assert set(n1) == set(n2)
    for k in n1:
        assert n2[k] == 2 * n1[k]
