"""As-of join unit tests: planted interleaved timestamps exercise the
semantics the degenerate driver data (all orders precede all events)
cannot — strictly-before matching, equal-ts inclusion, tie-breaking,
and left/inner behavior."""

from __future__ import annotations

import datetime as dt

import pytest


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture
def frames(spark):
    probe = spark.createDataFrame(
        [
            (1, 100, _ts("2026-01-01 10:00:00")),
            (2, 100, _ts("2026-01-01 12:00:00")),
            (3, 100, _ts("2026-01-01 08:00:00")),  # before any build row
            (4, 200, _ts("2026-01-01 10:30:00")),
        ],
        "pid long, k long, pts timestamp",
    )
    build = spark.createDataFrame(
        [
            (10, 100, _ts("2026-01-01 09:00:00")),
            (11, 100, _ts("2026-01-01 11:00:00")),
            (12, 200, _ts("2026-01-01 10:30:00")),  # equal ts -> matches
            (13, 300, _ts("2026-01-01 00:00:00")),  # key with no probes
        ],
        "bid long, k long, bts timestamp",
    )
    return probe, build


def test_asof_inner_matches_latest_prior(spark, frames):
    from mini_hadoop_spark.operators.temporal import asof_join

    probe, build = frames
    out = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                    build_payload=["bid"], how="inner")
    got = {r.pid: r.asof_bid for r in out.collect()}
    assert got == {1: 10, 2: 11, 4: 12}  # pid 3 dropped (no prior build)


def test_asof_left_keeps_unmatched(spark, frames):
    from mini_hadoop_spark.operators.temporal import asof_join

    probe, build = frames
    out = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                    build_payload=["bid"], how="left")
    got = {r.pid: r.asof_bid for r in out.collect()}
    assert got == {1: 10, 2: 11, 3: None, 4: 12}


def test_asof_tiebreak_deterministic(spark):
    """Two build rows at the SAME ts: the larger tiebreak wins, always."""
    from mini_hadoop_spark.operators.temporal import asof_join

    probe = spark.createDataFrame(
        [(1, 5, _ts("2026-01-01 10:00:00"))], "pid long, k long, pts timestamp"
    )
    build = spark.createDataFrame(
        [(21, 5, _ts("2026-01-01 09:00:00")), (22, 5, _ts("2026-01-01 09:00:00"))],
        "bid long, k long, bts timestamp",
    )
    for _ in range(3):
        out = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                        build_payload=["bid"], tiebreak="bid").collect()
        assert [r.asof_bid for r in out] == [22]


def test_asof_rejects_bad_how(spark, frames):
    from mini_hadoop_spark.operators.temporal import asof_join

    probe, build = frames
    with pytest.raises(ValueError, match="inner.*left"):
        asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                  build_payload=["bid"], how="full")
