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


def test_asof_forward_matches_next(spark, frames):
    """direction='forward': each probe matches the SMALLEST build_ts >=
    probe_ts; equal-ts builds match; probes after every build drop
    (inner) or null (left)."""
    from mini_hadoop_spark.operators.temporal import asof_join

    probe, build = frames
    out = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                    build_payload=["bid"], how="inner", direction="forward")
    got = {r.pid: r.asof_bid for r in out.collect()}
    # pid1@10:00 -> bid11@11:00; pid2@12:00 has no later build (dropped);
    # pid3@08:00 -> bid10@09:00; pid4@10:30 -> bid12 (equal ts matches)
    assert got == {1: 11, 3: 10, 4: 12}

    left = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                     build_payload=["bid"], how="left", direction="forward")
    got_left = {r.pid: r.asof_bid for r in left.collect()}
    assert got_left == {1: 11, 2: None, 3: 10, 4: 12}


def test_asof_rejects_bad_direction(spark, frames):
    from mini_hadoop_spark.operators.temporal import asof_join

    probe, build = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                  build_payload=["bid"], direction="sideways")


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


def test_range_join_binned_boundaries(spark):
    """Planted pairs at/around the bin and gap boundaries: in-range pairs
    spanning a bin edge must be found (left probes bin+1), pairs beyond
    the gap must not, exact-gap pairs are inclusive."""
    from mini_hadoop_spark.operators.temporal import range_join_binned

    gap = 60  # 1-minute window, 1-minute bins
    left = spark.createDataFrame(
        [(1, 7, _ts("2026-01-01 10:00:30"))], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 7, _ts("2026-01-01 10:00:30")),  # equal ts -> in
            (11, 7, _ts("2026-01-01 10:01:30")),  # exactly gap -> in (next bin)
            (12, 7, _ts("2026-01-01 10:01:31")),  # gap+1s -> out
            (13, 7, _ts("2026-01-01 10:00:29")),  # before left -> out
            (14, 8, _ts("2026-01-01 10:00:40")),  # other key -> out
        ],
        "rid long, k long, rts timestamp",
    )
    out = range_join_binned(left, right, key="k", left_ts="lts", right_ts="rts", max_gap_sec=gap)
    assert sorted(r.rid for r in out.collect()) == [10, 11]


def test_range_join_binned_pre_1970_epochs(spark):
    """Negative-epoch regression: truncating division bins pre-1970
    timestamps one cell too high (trunc ≠ floor below zero), silently
    dropping in-range pairs that span a bin edge.  The floor-consistent
    binning must find them."""
    from mini_hadoop_spark.operators.temporal import range_join_binned

    gap = 60
    # 1969-12-31 23:59:50 is epoch -10s (bin -1); a follow-up 15s later
    # at epoch +5s (bin 0) is in range and must be probed via bin+1
    left = spark.createDataFrame(
        [(1, 7, _ts("1969-12-31 23:59:50"))], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 7, _ts("1970-01-01 00:00:05")),   # +15s, crosses bin edge -> in
            (11, 7, _ts("1969-12-31 23:59:55")),   # +5s, same bin -> in
            (12, 7, _ts("1970-01-01 00:01:10")),   # +80s -> out
            (13, 7, _ts("1969-12-31 23:59:40")),   # before left -> out
        ],
        "rid long, k long, rts timestamp",
    )
    out = range_join_binned(left, right, key="k", left_ts="lts", right_ts="rts", max_gap_sec=gap)
    assert sorted(r.rid for r in out.collect()) == [10, 11]


def test_asof_null_keys_never_match(spark):
    """SQL equi-join semantics: NULL keys match nothing (NULL != NULL).
    Regression: Window.partitionBy groups nulls into ONE partition, so
    without the explicit build-side filter a NULL-key probe row would
    'match' a NULL-key build row."""
    from mini_hadoop_spark.operators.temporal import asof_join

    probe = spark.createDataFrame(
        [(1, None, _ts("2026-01-01 12:00:00"))], "pid long, k long, pts timestamp"
    )
    build = spark.createDataFrame(
        [(10, None, _ts("2026-01-01 09:00:00"))], "bid long, k long, bts timestamp"
    )
    inner = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                      build_payload=["bid"], how="inner").collect()
    assert inner == []
    left = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                     build_payload=["bid"], how="left").collect()
    assert [(r.pid, r.asof_bts, r.asof_bid) for r in left] == [(1, None, None)]


def test_asof_null_build_ts_never_matches(spark):
    """A build row with NULL build_ts can't satisfy build_ts <= probe_ts.
    Regression: nulls sort first ascending with a NON-null _bp struct,
    so without the filter it becomes a bogus 'match' whose payload is
    non-null while asof_<build_ts> is null."""
    from mini_hadoop_spark.operators.temporal import asof_join

    probe = spark.createDataFrame(
        [(1, 5, _ts("2026-01-01 10:00:00"))], "pid long, k long, pts timestamp"
    )
    build = spark.createDataFrame([(21, 5, None)], "bid long, k long, bts timestamp")
    left = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                     build_payload=["bid"], how="left").collect()
    assert [(r.pid, r.asof_bts, r.asof_bid) for r in left] == [(1, None, None)]
    inner = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                      build_payload=["bid"], how="inner").collect()
    assert inner == []


def test_asof_rejects_bad_how(spark, frames):
    from mini_hadoop_spark.operators.temporal import asof_join

    probe, build = frames
    with pytest.raises(ValueError, match="inner.*left"):
        asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                  build_payload=["bid"], how="full")


def test_asof_tolerance_boundary_inclusive(spark):
    """The registered tolerance filter keeps a match whose age is
    EXACTLY the bound (<=, not <) and drops one a day older — planted
    here because the driver data's ages never straddle a small bound."""
    from pyspark.sql import functions as F

    from mini_hadoop_spark.operators.temporal import asof_join

    probe = spark.createDataFrame(
        [(1, 7, _ts("2026-01-11 00:00:00")), (2, 8, _ts("2026-01-11 00:00:00"))],
        "pid long, k long, pts timestamp",
    )
    build = spark.createDataFrame(
        # key 7's latest prior is exactly 10 days old; key 8's is 11 days
        [(70, 7, _ts("2026-01-01 00:00:00")), (80, 8, _ts("2025-12-31 00:00:00"))],
        "bid long, k long, bts timestamp",
    )
    j = asof_join(probe, build, key="k", probe_ts="pts", build_ts="bts",
                  build_payload=["bid"], how="inner")
    age = F.datediff(F.to_date("pts"), F.to_date("asof_bts"))
    kept = j.filter(age <= 10).select("pid", "asof_bid").collect()
    assert [(r.pid, r.asof_bid) for r in kept] == [(1, 70)]


def test_pit_scd2_interval_semantics(spark):
    """pit_scd2_shipments expresses the SCD2 interval predicate
    (valid_from <= ts < valid_to) as a backward as-of join; pin the
    equivalence on the cases the identity rests on: (a) a mid-chain
    fact matches the covering version, not a future one (no feature
    leakage); (b) same-instant versions (empty intervals) resolve to
    the HIGHEST version of the tie group — the only one whose half-open
    interval is non-empty; (c) a fact before the first version matches
    nothing under how='left'."""
    from pyspark.sql import Window as W, functions as F

    from mini_hadoop_spark.operators.temporal import asof_join

    orders = spark.createDataFrame(
        [
            (1, 100, _ts("2026-01-01 00:00:00")),
            (2, 100, _ts("2026-01-05 00:00:00")),  # same-instant tie...
            (3, 100, _ts("2026-01-05 00:00:00")),  # ...version 3 wins
            (4, 100, _ts("2026-01-09 00:00:00")),
        ],
        "orderkey long, custkey long, odate timestamp",
    )
    w = W.partitionBy("custkey").orderBy("odate", "orderkey")
    v = orders.select(
        "custkey",
        F.row_number().over(w).alias("version"),
        F.col("odate").alias("valid_from"),
        F.lead("odate").over(w).isNull().alias("is_current"),
    )
    facts = spark.createDataFrame(
        [
            (1, 100, _ts("2025-12-31 00:00:00")),  # before v1 -> none
            (2, 100, _ts("2026-01-03 00:00:00")),  # inside [v1, v2)
            (3, 100, _ts("2026-01-05 00:00:00")),  # tie instant -> v3
            (4, 100, _ts("2026-01-20 00:00:00")),  # current version
        ],
        "fid long, custkey long, fts timestamp",
    )
    j = asof_join(
        facts, v, key="custkey", probe_ts="fts", build_ts="valid_from",
        build_payload=["version", "is_current"], tiebreak="version", how="left",
    )
    got = {r.fid: (r.asof_version, r.asof_is_current) for r in j.collect()}
    assert got == {1: (None, None), 2: (1, False), 3: (3, False), 4: (4, True)}


def test_pit_counting_merge_matches_interval_join(spark):
    """r17: pit_scd2_shipments folds the SCD2 versioning INTO the merge
    window — version = running build count in the asof sort, is_current
    = version == per-customer total.  Pin the counting formulation
    against the EXPLICIT interval join on the same planted edge cases
    (pre-first-version fact, mid-chain fact, same-instant version tie,
    current-version fact) plus a second customer with one version."""
    from pyspark.sql import Window as W, functions as F

    from mini_hadoop_spark.operators.relational_ext import _pit_version_merge

    orders = spark.createDataFrame(
        [
            (1, 100, _ts("2026-01-01 00:00:00")),
            (2, 100, _ts("2026-01-05 00:00:00")),  # same-instant tie...
            (3, 100, _ts("2026-01-05 00:00:00")),  # ...version 3 wins
            (4, 100, _ts("2026-01-09 00:00:00")),
            (5, 200, _ts("2026-02-01 00:00:00")),  # single-version cust
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    facts = spark.createDataFrame(
        [
            (100, _ts("2025-12-31 00:00:00"), 1.0),  # before v1 -> none
            (100, _ts("2026-01-03 00:00:00"), 2.0),  # inside [v1, v2)
            (100, _ts("2026-01-05 00:00:00"), 3.0),  # tie instant -> v3
            (100, _ts("2026-01-20 00:00:00"), 4.0),  # current version
            (200, _ts("2026-03-01 00:00:00"), 5.0),  # current (v1 of 1)
        ],
        "custkey long, ship_ts timestamp, rev double",
    )
    m = _pit_version_merge(facts, orders)
    got = {
        r.rev: (r._ver, r._vmax)
        for r in m.select("rev", "_ver", "_vmax").collect()
    }
    assert got == {1.0: (0, 4), 2.0: (1, 4), 3.0: (3, 4), 4.0: (4, 4), 5.0: (1, 1)}

    # cross-check against the explicit half-open interval join
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    ij = facts.join(
        v,
        (facts.custkey == v.custkey)
        & (v.valid_from <= facts.ship_ts)
        & ((facts.ship_ts < v.valid_to) | v.valid_to.isNull()),
        "left",
    ).select(facts.custkey, "ship_ts", "rev", "version", v.valid_to)
    ref = {
        r.rev: (r.version if r.version is not None else 0)
        for r in ij.collect()
    }
    assert {k: v[0] for k, v in got.items()} == ref
    # is_current (valid_to IS NULL) == (_ver == _vmax) wherever matched
    ref_cur = {r.rev: r.valid_to is None for r in ij.collect() if r.version is not None}
    got_cur = {k: v[0] == v[1] for k, v in got.items() if v[0] >= 1}
    assert got_cur == ref_cur
