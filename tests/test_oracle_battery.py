"""Every queries()/oracle_sql() pair must hash-match — mirror of the
driver's t2 correctness gate, run at sf0.001 for speed (driver uses
sf0.01; run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the
full-fidelity check)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_matches_oracle


def _oracle_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_match(spark, name):
    assert_matches_oracle(spark, name, SF_DIR)


def test_corpus_fk_integrity(spark):
    """nation_trade_balance's one-pass plan (ADVICE r12) and every
    broadcast-dim join assume TPC-H referential integrity: no lineitem
    orphaned from orders/supplier, no order orphaned from customer.
    Pin that the generated corpus actually guarantees it — if a future
    generator breaks FKs, this fails before a subtle oracle mismatch
    does."""
    from mini_hadoop_spark.sources.catalog import load_table

    from pyspark.sql import functions as F

    l = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    s = load_table(spark, SF_DIR, "supplier")
    assert l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    assert l.join(s, l.l_suppkey == s.s_suppkey, "left_anti").count() == 0
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    # NOT NULL on the sufficient-statistics join-back keys (TPC-H
    # declares them NOT NULL; window_cume_dist's inner equi-join would
    # silently drop NULL-key rows the old whole-cohort window emitted)
    assert (
        l.filter(
            F.col("l_returnflag").isNull()
            | F.col("l_quantity").isNull()
            | F.col("l_extendedprice").isNull()
        ).count()
        == 0
    )


def test_all_queries_have_unique_names():
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    assert len(q) == len(set(q))
    for name, sql in entry_mod.oracle_sql().items():
        assert name in q, f"oracle {name} has no query"
        assert sql.strip()


@pytest.mark.parametrize(
    "sf_dir",
    [SF_DIR, "/root/testdata/sf0.1"],
    ids=["test-sf", "sf0.1"],
)
def test_sketch_accuracy_bounds(spark, sf_dir):
    """agg_approx_sketches has no cross-engine oracle (sketch impls
    differ); pin its accuracy against the exact answers instead:
    HLL++ within 3x its 2% rsd, percentiles within 2% of exact.
    Runs at BOTH the battery SF and sf0.1 (VERDICT r7 #5): sketch error
    bounds are the query's whole contract, so they must hold at the
    bench scale, not just the unit-test scale."""
    import os

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from mini_hadoop_spark.sources.catalog import load_table

    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    approx = {
        r.l_returnflag: r
        for r in entry_mod.queries()["agg_approx_sketches"](spark, sf_dir).collect()
    }
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert a.n_rows == e.n
        assert abs(a.approx_orders - e.orders) / e.orders <= 0.06  # 3x rsd
        assert abs(a.price_p50 - e.p50) / e.p50 <= 0.02
        assert abs(a.price_p95 - e.p95) / e.p95 <= 0.02


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["word", "cnt"]


def test_dtype_symmetry_guard_trips():
    """The conftest dtype guard must fail a deliberately un-cast fixture:
    DuckDB sum(<int>) -> HUGEINT -> pandas float64 vs Spark int64 is the
    driver hash-fail class (%.9g canon hides it; the driver's does not)."""
    import pandas as pd

    from tests.conftest import _assert_dtype_symmetry

    s = pd.DataFrame({"k": ["a"], "n": pd.array([3], dtype="int64")})
    o = pd.DataFrame({"k": ["a"], "n": pd.array([3.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype asymmetry"):
        _assert_dtype_symmetry("fixture", s, o)
    # symmetric dtypes pass
    _assert_dtype_symmetry("fixture", s, s.copy())


def test_rfm_approx_within_one_quartile_of_exact(spark):
    """The sketch-cut RFM variant must land every customer within +-1
    quartile of the exact ntile form on all three metrics (cuts differ
    only by sketch rank error and by tie groups, which ntile splits via
    the custkey tiebreak but threshold-bucketing keeps together)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    exact = qs["orders_rfm_segmentation"](spark, SF_DIR).toPandas().set_index("o_custkey")
    approx = (
        qs["orders_rfm_segmentation_approx"](spark, SF_DIR).toPandas().set_index("o_custkey")
    )
    assert set(exact.index) == set(approx.index)
    joined = exact.join(approx, lsuffix="_e", rsuffix="_a")
    for m in ("r_q", "f_q", "m_q"):
        diff = (joined[f"{m}_e"] - joined[f"{m}_a"]).abs()
        assert diff.max() <= 1, (
            f"{m}: {int((diff > 1).sum())} customers moved >1 quartile"
        )
    # and both are genuine quartile labelings: all buckets 1..4 present
    for m in ("r_q", "f_q", "m_q"):
        assert set(approx[m].unique()) <= {1, 2, 3, 4}
